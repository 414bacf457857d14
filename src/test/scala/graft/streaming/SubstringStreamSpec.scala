package graft.streaming

import java.nio.file.Files
import java.util.UUID

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Streaming gram-index maintenance for substring dedup (r14): a stream
  * of published documents drained through [[Dedup.gramIndexSink]] must
  * serve batch dedup results identical to an index built directly from
  * every document published so far — AFTER EVERY CHUNK — without ever
  * rescanning history (the ingest-side twin of
  * substring_dedup_incremental, which the driver hash-checks). Gram
  * presence is additive, so the merge-on-read distinct union is exact,
  * and a replayed micro-batch (overwrite under batch=<id>) must not
  * change the served index. */
class SubstringStreamSpec extends AnyFunSuite {

  test("streamed gram-index partials serve exactly the direct incremental " +
    "dedup after each chunk; batch replay is idempotent") {
    val spark = StreamFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val chunks = (0 until 3).map(i =>
      docs.filter($"doc_id" % 3 === i.toLong).as[(Long, String)].collect().toSeq)
    // probe batch: one doc copying a ≥k-token run from a PUBLISHED doc
    // (guarantees a hit through the served index) + one unique doc
    val donorText = chunks.head.head._2
    val probe = Seq(
      (900001L, "probe preamble words " + donorText + " probe epilogue words"),
      (900002L, "entirely unique probe content sharing nothing with anyone")
    ).toDF("doc_id", "text")

    val statePath = Files.createTempDirectory("graft-gramidx").toString + "/idx"
    val input = MemoryStream[(Long, String)]
    val query = input.toDF().toDF("doc_id", "text").writeStream
      .outputMode("update")
      .queryName("gramidx_" + UUID.randomUUID().toString.replace("-", ""))
      .option("checkpointLocation", Files.createTempDirectory("graft-ckpt").toString)
      .foreachBatch(Dedup.gramIndexSink(statePath) _)
      .start()
    try {
      var published = Seq.empty[(Long, String)]
      chunks.foreach { chunk =>
        input.addData(chunk: _*)
        query.processAllAvailable()
        published ++= chunk
        val served = Dedup.substringDedupFromIndex(
            Dedup.gramIndexFromState(spark, statePath), probe).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
        val direct = Dedup.substringDedupIncremental(
            published.toDF("doc_id", "text"), probe).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
        assert(served == direct,
          s"after ${published.size} docs: served != direct\n" +
            s"served-only: ${(served -- direct).take(2)}\ndirect-only: ${(direct -- served).take(2)}")
      }
      // the donor doc was published in chunk 1: its run must actually have
      // been excised from the probe (the test has teeth)
      val probed = Dedup.substringDedupFromIndex(
          Dedup.gramIndexFromState(spark, statePath), probe).collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(probed(900001L) > 0L, "copied run not excised via the served index")
      assert(probed(900002L) == 0L, "unique probe doc must stay intact")
      // replaying the LAST micro-batch (a retry) must overwrite, not grow
      val before = Dedup.gramIndexFromState(spark, statePath).count()
      Dedup.gramIndexSink(statePath)(chunks.last.toDF("doc_id", "text"), 2L)
      assert(Dedup.gramIndexFromState(spark, statePath).count() == before,
        "batch replay changed the served gram index")
    } finally query.stop()
  }
}
