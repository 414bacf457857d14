package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.joins.CartesianProductExec
object CartProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args) {
      val plan = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        .queryExecution.sparkPlan
      plan.collect { case j: CartesianProductExec => j }.zipWithIndex.foreach { case (j, i) =>
        println(s"=== $name cartesian #$i ===")
        println(j.treeString.linesIterator.map(_.take(160)).take(14).mkString("\n"))
      }
    }
    spark.stop()
  }
}
