package graft.tools

import org.apache.spark.sql.SparkSession

/** Same-JVM A/B timing probe over an existing data directory (typically
  * the ScaleProbe replicas under target/scaleprobe/sfx{1,10} — run
  * ScaleProbe first to generate them). Usage:
  *
  *   runMain graft.tools.ABProbe <dataDir> <queryName> [queryName...]
  *
  * Times each named SparkEntry query once on a warmed session (min-of-2),
  * caches cleared between queries. The bench box swings ±40% under
  * co-tenant load, so only same-JVM back-to-back comparisons are
  * trustworthy — which is exactly what this produces.
  */
object ABProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same fixed-work kernel Bench records as calibration_s: prints the
    // window's load context so probe numbers are comparable across runs
    val cal = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      spark.range(20000000L)
        .selectExpr("id % 997 AS k", "id AS v")
        .groupBy("k").agg(org.apache.spark.sql.functions.sum("v"))
        .queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }.min
    System.err.println(f"[ab] calibration$cal%29.2fs (fixed 20M-row groupBy kernel)")
    for (name <- args.drop(1)) {
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to 2).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, dir).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      System.err.println(f"[ab] $name%-28s min=${times.min}%7.2fs runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
