package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Writes `.explain("formatted")` for named SparkEntry queries to files —
  * the per-change plan evidence of the optimization rounds (guide §1:
  * capture the plan shape before and after every substantive change).
  *
  * Usage: runMain graft.tools.ExplainDump <outDir> <suffix> <name>[,name...]
  *
  * Emits `<outDir>/<name>_<suffix>.txt` per query. The plan is the
  * PREPARED plan with AQE wrapping (explain on the unexecuted frame) —
  * Exchange counts, join strategies, PushedFilters and ReadSchema are all
  * visible at this stage; sfDir defaults to sf0.01 (plan SHAPE is
  * scale-invariant for this catalogue; PlanLintSpec pins the same).
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").toSeq
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val catalogue = graft.SparkEntry.queries ++ graft.SparkEntry.benchOnly
    names.foreach { name =>
      val df = catalogue(name)(spark, d)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
      System.err.println(s"[explain] wrote $outDir/${name}_$suffix.txt")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
