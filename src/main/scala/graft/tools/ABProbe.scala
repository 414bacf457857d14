package graft.tools

import org.apache.spark.sql.SparkSession

/** Same-JVM A/B timing probe over an existing data directory (typically
  * the ScaleProbe replicas under target/scaleprobe/sfx{1,10} — run
  * ScaleProbe first to generate them). Usage:
  *
  *   runMain graft.tools.ABProbe <dataDir>[,<dataDirB>] <queryName> [queryName...]
  *
  * Times each named SparkEntry query once on a warmed session (min-of-2),
  * caches cleared between queries. The bench box swings ±40% under
  * co-tenant load, so only same-JVM back-to-back comparisons are
  * trustworthy — which is exactly what this produces. With TWO
  * comma-separated dirs (r13, the sf1-adjudication form of VERDICT r12
  * task 1) each query is timed on both dirs back-to-back in this one JVM
  * and the B/A ratio printed — the co-tenant window cancels out of the
  * ratio, which is what adjudicates a suspicious scaling reading.
  */
object ABProbe {
  def main(args: Array[String]): Unit = {
    val dirs = args(0).split(",").toSeq
    val dir = dirs.head
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
      def probe(d: String): Double = (1 to 2).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, d).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.min
      if (dirs.size == 1) {
        val m = probe(dir)
        System.err.println(f"[ab] $name%-28s min=$m%7.2fs")
      } else {
        val a = probe(dirs(0))
        val b = probe(dirs(1))
        System.err.println(
          f"[ab] $name%-28s A=$a%7.2fs B=$b%7.2fs B/A=${b / a}%6.2fx")
      }
    }
    spark.stop()
  }
}
