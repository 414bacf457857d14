package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{CurationState, Pipeline}

/** CurationState lifecycle scale probe (r10 VERDICT task 4): the three
  * lifecycle legs — BUILD (compute + persist the state bundle), FINALIZE
  * (merge N appended partials, including the `bg` rescan that freezes
  * `bounds` — the one state-sized finalize leg), and SERVE (gate a fresh
  * batch against the frozen artifact) — measured separately at 1× and K×
  * state size on [[ScaleProbe.generate]]'s perturbed replicas.
  *
  * The SERVE leg holds the fresh batch at 1× for BOTH runs: its claim is
  * precisely that serve cost is fresh-batch-sized — the state side
  * contributes only materialized count tables (vocabulary grain), the
  * fingerprint / benchmark-gram join sides, and two 1-row frames, never a
  * state-document rescan — so serve(K× state, 1× fresh) should stay near
  * serve(1× state, 1× fresh) while build/finalize scale with state.
  *
  * Usage: runMain graft.tools.CurationStateProbe [sfDir] [workDir] [K]
  * Prints one JSON line {"metric":"curation_state_probe",...} plus a
  * stderr table; results land in docs/SCALEPROBE.md per round.
  */
object CurationStateProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val workDir = args.lift(1).getOrElse("target/scaleprobe")
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val x1Dir = s"$workDir/sfx1"
    val kxDir = s"$workDir/sfx$k"
    ScaleProbe.generate(spark, sfDir, x1Dir, 1)
    ScaleProbe.generate(spark, sfDir, kxDir, k)

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    // fresh batch HELD at 1× for both serve runs (see scaladoc)
    val fresh = Tables.documents(spark, x1Dir).filter(col("doc_id") % 2 === 1)

    def probe(dir: String, tag: String): (Double, Double, Double) = {
      val state = Tables.documents(spark, dir).filter(col("doc_id") % 2 === 0)
      val frozenB = s"$workDir/cs-$tag-build"
      val partials = s"$workDir/cs-$tag-partials"
      val frozenM = s"$workDir/cs-$tag-merged"

      val tBuild = time {
        CurationState.write(CurationState.compute(state), frozenB)
      }
      spark.catalog.clearCache()

      // N=4 partial chunks appended untimed (per-chunk ingest cost is the
      // writePartial path CurationStreamSpec already covers); the timed
      // leg is the once-per-cycle FINALIZE merge including the bounds
      // rescan of the merged bg partials.
      (0 until 4).foreach { i =>
        CurationState.writePartial(
          state.filter(pmod(col("doc_id"), lit(8)) === i * 2), partials, i.toLong)
      }
      spark.catalog.clearCache()
      val tFinalize = time {
        CurationState.finalizeFromPartials(spark, partials, frozenM)
      }
      spark.catalog.clearCache()

      // warm-up (codegen) then timed serve from the loaded artifact
      Pipeline.curateIncrementalFromState(CurationState.load(spark, frozenB), fresh)
        .queryExecution.toRdd.count()
      spark.catalog.clearCache()
      val tServe = time {
        Pipeline.curateIncrementalFromState(CurationState.load(spark, frozenB), fresh)
          .queryExecution.toRdd.count()
      }
      spark.catalog.clearCache()
      (tBuild, tFinalize, tServe)
    }

    val (b1, f1, s1) = probe(x1Dir, "x1")
    val (bk, fk, sk) = probe(kxDir, s"x$k")

    def row(n: String, a: Double, b: Double): String = {
      System.err.println(f"[cs-probe] $n%-10s 1x=$a%7.2fs ${k}x=$b%7.2fs ratio=${b / a}%5.2f")
      f"""\"$n\":{\"t1\":$a%.3f,\"tk\":$b%.3f,\"ratio\":${b / a}%.2f}"""
    }
    val rows = Seq(row("build", b1, bk), row("finalize", f1, fk), row("serve", s1, sk))
    println(s"""{"metric":"curation_state_probe","k":$k,"base":"$sfDir","legs":${rows.mkString("{", ",", "}")}}""")
    spark.stop()
  }
}
