package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.{GlobalLimitExec, LocalLimitExec, LocalTableScanExec, RangeExec, SparkPlan}

/** Diagnostic companion to PlanLintSpec: dumps the build side of every
  * broadcast NLJ in a query's pre-AQE plan with the lint's boundedness
  * verdict, for triaging new lint failures. */
object PlanProbe {
  def bounded(p: SparkPlan): Boolean = p.exists {
    case agg: BaseAggregateExec =>
      // Alias never overrides foldable (defaults false) — strip it, or the
      // constant-key rewrite `0 AS 0#n` reads as unbounded
      agg.groupingExpressions.isEmpty || agg.groupingExpressions.forall {
        case a: org.apache.spark.sql.catalyst.expressions.Alias => a.child.foldable
        case e => e.foldable
      }
    case _: GlobalLimitExec | _: LocalLimitExec => true
    case _: LocalTableScanExec => true
    case r: RangeExec => r.numElements <= BigInt(1000000)
    case _ => false
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    for (name <- args) {
      val plan = graft.SparkEntry.queries(name)(spark, d).queryExecution.sparkPlan
      plan.collect { case j: BroadcastNestedLoopJoinExec => j }.zipWithIndex.foreach { case (j, i) =>
        val build = j.buildSide match {
          case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
          case _ => j.right
        }
        println(s"=== $name #$i buildSide=${j.buildSide} joinType=${j.joinType} bounded=${bounded(build)} ===")
        if (!bounded(build))
          println(build.treeString.linesIterator.map(_.take(200)).take(25).mkString("\n"))
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
