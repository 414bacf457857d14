package graft.streaming

import java.nio.file.Files
import java.util.UUID

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Overlap

/** Streaming cross-source overlap maintenance: a document stream drained
  * through the per-batch KMV sketch sink must serve pairwise overlap
  * estimates IDENTICAL to a direct whole-corpus pass after every chunk —
  * exactly, not approximately, because KMV composes exactly under union.
  * This is the ingest-side form of overlap_kmv: the corpus is sketched as
  * it arrives and history is never rescanned. */
class OverlapStreamSpec extends AnyFunSuite {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getString(0), r.getString(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("streamed sketch partials serve exactly the direct overlap estimates after each chunk") {
    val spark = StreamFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "source", "text")
    val chunks = (0 until 3).map(i =>
      docs.filter($"doc_id" % 3 === i).as[(Long, String, String)].collect().toSeq)

    val statePath = Files.createTempDirectory("graft-ovl").toString + "/state"
    val input = MemoryStream[(Long, String, String)]
    val query = input.toDF().toDF("doc_id", "source", "text").writeStream
      .outputMode("update")
      .queryName("ovl_" + UUID.randomUUID().toString.replace("-", ""))
      .option("checkpointLocation", Files.createTempDirectory("graft-ovl-ckpt").toString)
      .foreachBatch(Overlap.sketchSink(statePath) _)
      .start()
    try {
      var arrived = Seq.empty[(Long, String, String)]
      chunks.foreach { chunk =>
        input.addData(chunk: _*)
        query.processAllAvailable()
        arrived ++= chunk
        val served = rows(Overlap.overlapServeFromState(spark, statePath))
        val direct = rows(Overlap.overlapKmv(
          Overlap.sourceShingleTable(arrived.toDF("doc_id", "source", "text"))))
        assert(served == direct, s"after ${arrived.size} docs")
      }
      // a retried micro-batch must overwrite its own partial, not add to it
      val lastBatch = spark.read.parquet(s"$statePath/sk").selectExpr("max(batch)")
        .collect()(0).getInt(0)
      Overlap.sketchSink(statePath)(
        chunks.last.toDF("doc_id", "source", "text"), lastBatch.toLong)
      val reServed = rows(Overlap.overlapServeFromState(spark, statePath))
      val direct = rows(Overlap.overlapKmv(
        Overlap.sourceShingleTable(arrived.toDF("doc_id", "source", "text"))))
      assert(reServed == direct, "retried micro-batch must be idempotent")
    } finally query.stop()
  }

  /** RTBF purge for the streamed KMV state (r16, VERDICT r15 task 4):
    * KMV is non-linear, so the purge re-sketches the AFFECTED sources
    * from their live rows and tombstones their pre-cutoff partials —
    * served estimates must equal a direct pass over the live corpus
    * EXACTLY after the purge, after a replayed purge epoch, after
    * post-purge ingest (new batches merge back in by KMV union), and
    * after a second, later purge epoch (max-epoch wins). Untouched
    * sources' state is never rewritten — the source-grain contract. */
  test("KMV purge epoch: served == direct over live docs; replay idempotent; " +
    "post-purge ingest merges; later epoch wins; untouched sources untouched") {
    val spark = StreamFixture.spark
    import spark.implicits._

    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "source", "text")
      .as[(Long, String, String)].collect().toSeq
    def direct(live: Seq[(Long, String, String)]) =
      rows(Overlap.overlapKmv(
        Overlap.sourceShingleTable(live.toDF("doc_id", "source", "text"))))

    val statePath = Files.createTempDirectory("graft-ovlpurge").toString + "/state"
    val (c0, c1) = docs.splitAt(docs.size / 2)
    Overlap.sketchSink(statePath)(c0.toDF("doc_id", "source", "text"), 0L)
    Overlap.sketchSink(statePath)(c1.toDF("doc_id", "source", "text"), 1L)
    assert(rows(Overlap.overlapServeFromState(spark, statePath)) == direct(docs),
      "happy-path serve broken before any purge")

    val sources = docs.map(_._2).distinct.sorted
    val victimSource = sources.head
    val victims = docs.filter(t => t._2 == victimSource && t._1 % 3 == 0)
    assert(victims.nonEmpty && victims.size < docs.count(_._2 == victimSource),
      "fixture must leave the victim source with live docs")
    val live = docs.filterNot(victims.toSet)
    val liveAffected = live.filter(_._2 == victimSource)
    Overlap.overlapPurgeSink(spark, statePath, 100L)(
      liveAffected.toDF("doc_id", "source", "text"), Seq(victimSource))
    assert(rows(Overlap.overlapServeFromState(spark, statePath)) == direct(live),
      "post-purge serve != direct over live docs")

    // replayed purge epoch (a retry) must overwrite, not corrupt
    Overlap.overlapPurgeSink(spark, statePath, 100L)(
      liveAffected.toDF("doc_id", "source", "text"), Seq(victimSource))
    assert(rows(Overlap.overlapServeFromState(spark, statePath)) == direct(live),
      "purge replay changed the serve")

    // source-grain: only the affected source was re-sketched
    val rebuiltSources = spark.read.parquet(s"$statePath/purge")
      .select("source").distinct().collect().map(_.getString(0)).toSet
    assert(rebuiltSources == Set(victimSource),
      "purge must not rewrite untouched sources' state")

    // post-purge ingest: batch ids allocated after the purge are >= the
    // tombstone cutoff and must merge back in
    val fresh = Seq(
      (900001L, victimSource, "zzfresh alpha beta gamma delta epsilon"),
      (900002L, sources.last, "qqfresh one two three four five six"))
    Overlap.sketchSink(statePath)(fresh.toDF("doc_id", "source", "text"), 2L)
    val live2 = live ++ fresh
    assert(rows(Overlap.overlapServeFromState(spark, statePath)) == direct(live2),
      "post-purge ingest did not merge back into the served estimates")

    // a SECOND purge of the same source (later epoch) must win over the
    // first epoch's rebuilt sketch
    val victims2 = live2.filter(t => t._2 == victimSource && t._1 % 3 == 1)
    assert(victims2.nonEmpty)
    val live3 = live2.filterNot(victims2.toSet)
    Overlap.overlapPurgeSink(spark, statePath, 101L)(
      live3.filter(_._2 == victimSource).toDF("doc_id", "source", "text"),
      Seq(victimSource))
    assert(rows(Overlap.overlapServeFromState(spark, statePath)) == direct(live3),
      "later purge epoch must supersede the earlier rebuilt sketch")
  }

  test("a source whose EVERY doc is purged vanishes from the served " +
    "estimates: tombstone without a rebuilt sketch, surviving pairs exact") {
    // The overlapPurgeSink contract's edge the partial-purge scenario
    // never reaches (its fixture must leave the victim live docs): drop
    // an entire provider. The rebuild is EMPTY (zero rows under
    // purge/epoch=), the tombstone still excises every pre-purge
    // partial, and the served pair estimates equal a direct pass over
    // the corpus without that source — the source simply disappears.
    val spark = StreamFixture.spark
    import spark.implicits._

    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "source", "text")
      .as[(Long, String, String)].collect().toSeq
    val victimSource = docs.map(_._2).distinct.sorted.head
    val live = docs.filterNot(_._2 == victimSource)
    assert(live.nonEmpty && live.size < docs.size &&
      live.map(_._2).distinct.size >= 2,
      "fixture degenerate: need >=2 surviving sources for pair estimates")

    val statePath = Files.createTempDirectory("graft-ovlgone").toString + "/state"
    Overlap.sketchSink(statePath)(docs.toDF("doc_id", "source", "text"), 0L)
    Overlap.overlapPurgeSink(spark, statePath, 100L)(
      live.filter(_._2 == victimSource) // none, by construction
        .toDF("doc_id", "source", "text"),
      Seq(victimSource))
    assert(spark.read.parquet(s"$statePath/purge/epoch=100").count() == 0,
      "a totally-purged source must rebuild to zero rows, not crash")
    val served = rows(Overlap.overlapServeFromState(spark, statePath))
    assert(served == rows(Overlap.overlapKmv(
      Overlap.sourceShingleTable(live.toDF("doc_id", "source", "text")))),
      "served estimates must equal a direct pass without the source")
    assert(!served.exists(t => t._1 == victimSource || t._2 == victimSource),
      "the purged source must not appear in any served pair")
  }

  /** ADVICE r16: a purge issued BEFORE any ingest batch exists is a
    * plausible ops ordering (an opt-out request can arrive while the
    * ingest job is still being provisioned) and must not crash on the
    * missing sk/ path — the sink writes a cutoff-0 tombstone, the serve
    * returns the rebuilt sketches alone, and ingest batches arriving
    * afterwards (ids >= 0 = all of them) merge back in by KMV union. */
  test("purge before first ingest: cutoff-0 tombstone, no crash, later ingest merges") {
    val spark = StreamFixture.spark
    import spark.implicits._

    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "source", "text")
      .as[(Long, String, String)].collect().toSeq
    def direct(live: Seq[(Long, String, String)]) =
      rows(Overlap.overlapKmv(
        Overlap.sourceShingleTable(live.toDF("doc_id", "source", "text"))))

    val statePath = Files.createTempDirectory("graft-ovlpre").toString + "/state"
    val victimSource = docs.map(_._2).distinct.sorted.head
    // the purge request names a source none of whose docs have arrived yet
    Overlap.overlapPurgeSink(spark, statePath, 100L)(
      spark.emptyDataset[(Long, String, String)].toDF("doc_id", "source", "text"),
      Seq(victimSource))
    val cutoffs = spark.read.parquet(s"$statePath/ts")
      .select("source", "cutoff").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(cutoffs.toSeq == Seq((victimSource, 0L)),
      "pre-ingest purge must write a cutoff-0 tombstone")
    // serving an ingest-free state: no pairs (nothing sketched), no crash
    assert(rows(Overlap.overlapServeFromState(spark, statePath)).isEmpty)
    // every later ingest batch has id >= 0 == cutoff, so all of it merges
    Overlap.sketchSink(statePath)(docs.toDF("doc_id", "source", "text"), 0L)
    assert(rows(Overlap.overlapServeFromState(spark, statePath)) == direct(docs),
      "post-purge ingest must serve exactly the direct estimates")
  }
}
