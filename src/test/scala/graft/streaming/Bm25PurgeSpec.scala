package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** RTBF deletion propagation for the streamed BM25 index (r15): after a
  * purge epoch, the served ranking must equal a direct recompute over the
  * LIVE corpus alone — the purged document leaves the result set, its
  * df/corpus-stat contributions leave the scoring weights, and nothing is
  * rebuilt. A later RE-PUBLISH of the same document must serve again
  * (epoch-aware tombstones: a publish newer than the doc's latest purge
  * outranks it), and a replayed purge epoch must not decrement twice. */
class Bm25PurgeSpec extends AnyFunSuite {

  test("purge epoch: served == direct over live docs; purged doc leaves " +
    "the ranking; re-publish restores it; purge replay idempotent") {
    val spark = StreamFixture.spark
    import spark.implicits._

    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "source", "text")
      .as[(Long, String, String)].collect().toSeq
    val (c0, c1) = docs.splitAt(docs.size / 2)

    def direct(live: Seq[(Long, String, String)]) =
      TextOps.bm25Search(live.toDF("doc_id", "source", "text"),
          TextOps.Bm25Query, 10).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    def served(statePath: String) =
      TextOps.bm25ServeFromIndex(spark, statePath, TextOps.Bm25Query, 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

    val statePath = Files.createTempDirectory("graft-bm25purge").toString + "/idx"
    TextOps.bm25IndexSink(statePath)(c0.toDF("doc_id", "source", "text"), 0L)
    TextOps.bm25IndexSink(statePath)(c1.toDF("doc_id", "source", "text"), 1L)
    assert(served(statePath) == direct(docs), "happy-path serve broken")

    // purge the CURRENT top hit — the flip is observable by construction
    val topDoc = direct(docs).head._1
    val victimRows = docs.filter(_._1 == topDoc)
    val live = docs.filterNot(_._1 == topDoc)
    TextOps.bm25PurgeSink(statePath)(
      victimRows.toDF("doc_id", "source", "text"), 2L)

    val afterPurge = served(statePath)
    assert(afterPurge == direct(live),
      s"post-purge serve != direct over live docs\nserved: $afterPurge\n" +
        s"direct: ${direct(live)}")
    assert(!afterPurge.exists(_._1 == topDoc),
      "purged doc still in the served ranking")

    // replayed purge epoch (a retry) must overwrite, not double-decrement
    TextOps.bm25PurgeSink(statePath)(
      victimRows.toDF("doc_id", "source", "text"), 2L)
    assert(served(statePath) == direct(live), "purge replay changed the serve")

    // tombstone-fold compaction (before the re-publish): the folded state
    // serves identically, is tombstone-free, and the purged doc's payload
    // rows are PHYSICALLY gone — the RTBF end state
    val foldedPath = Files.createTempDirectory("graft-bm25fold").toString + "/idx"
    TextOps.bm25FoldTombstones(spark, statePath, foldedPath)
    assert(!new java.io.File(s"$foldedPath/ts").exists(),
      "folded state must carry no tombstones")
    assert(served(foldedPath) == direct(live),
      "folded state serves differently from the tombstoned state")
    val foldedTfDocs = spark.read.parquet(s"$foldedPath/tf")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(!foldedTfDocs.contains(topDoc),
      "purged doc's tf rows survived the tombstone fold")

    // re-publish in a LATER epoch: the newer publish outranks the tombstone
    TextOps.bm25IndexSink(statePath)(
      victimRows.toDF("doc_id", "source", "text"), 3L)
    val afterRepub = served(statePath)
    assert(afterRepub == direct(docs),
      s"re-published doc does not serve again\nserved: $afterRepub\n" +
        s"direct: ${direct(docs)}")
    assert(afterRepub.exists(_._1 == topDoc), "re-published doc missing")
  }

  test("purging EVERY doc serves an empty ranking — no crash, no NaN " +
    "from the emptied corpus stats") {
    // The all-victims edge the single-doc scenario never reaches: with
    // zero live docs the corpus stats (df, avgdl) aggregate over
    // nothing, and a scoring path that divides by them would NaN or
    // throw instead of returning the empty set a live-corpus recompute
    // yields.
    val spark = StreamFixture.spark
    import spark.implicits._

    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "source", "text")
      .as[(Long, String, String)].collect().toSeq
    val statePath = Files.createTempDirectory("graft-bm25gone").toString + "/idx"
    TextOps.bm25IndexSink(statePath)(docs.toDF("doc_id", "source", "text"), 0L)
    TextOps.bm25PurgeSink(statePath)(docs.toDF("doc_id", "source", "text"), 1L)
    assert(TextOps.bm25ServeFromIndex(spark, statePath, TextOps.Bm25Query, 10)
      .collect().isEmpty,
      "an all-purged index must serve the empty ranking")
    // and a fresh publish after the wipe serves again, epoch-aware
    TextOps.bm25IndexSink(statePath)(
      docs.take(5).toDF("doc_id", "source", "text"), 2L)
    val revived = TextOps.bm25ServeFromIndex(spark, statePath, TextOps.Bm25Query, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val expect = TextOps.bm25Search(docs.take(5).toDF("doc_id", "source", "text"),
        TextOps.Bm25Query, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(revived == expect,
      "post-wipe publish must serve exactly the direct recompute")
  }
}
