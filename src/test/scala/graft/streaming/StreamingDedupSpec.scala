package graft.streaming

import java.nio.file.Files
import java.util.UUID

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** The streaming face of near-dup detection: LSH bucket ownership as the
  * single stateful stage, with the signature computation proven equal to
  * the batch (oracle-matched) md5 MinHash path. */
class StreamingDedupSpec extends AnyFunSuite {

  private val d = "/root/testdata/sf0.001"

  test("bandKeysLocal reproduces the batch md5 signature/band pipeline per document") {
    val spark = StreamFixture.spark
    val docs = graft.Tables.documents(spark, d).select("doc_id", "text")
    // batch truth: the oracle-matched wide-agg path
    val batch = Dedup.md5BandTableForTest(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val texts = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    assert(texts.nonEmpty)
    texts.foreach { case (id, text) =>
      val local = Dedup.bandKeysLocal(text)
      val expected = batch.getOrElse(id, Seq.empty)
      assert(local == expected,
        s"doc $id: local band keys diverge from the batch pipeline")
    }
  }

  test("streaming bucket ownership: first-seen wins, equals the batch min-id ownership table") {
    val spark = StreamFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = graft.Tables.documents(spark, d)
      .select($"doc_id", $"text").as[(Long, String)]
      .collect().sortBy(_._1)
    val (batch1, batch2) = docs.splitAt(docs.length / 2)

    val input = MemoryStream[(Long, String)]
    val hits = Dedup.nearDupStream(input.toDF().toDF("doc_id", "text"))
    val name = "neardup_" + UUID.randomUUID().toString.replace("-", "")
    val query = hits.toDF().writeStream
      .outputMode("append")
      .queryName(name)
      .format("memory")
      .option("checkpointLocation", Files.createTempDirectory("graft-ckpt").toString)
      .trigger(Trigger.ProcessingTime("25 milliseconds"))
      .start()
    try {
      input.addData(batch1: _*)
      query.processAllAvailable()
      input.addData(batch2: _*)
      query.processAllAvailable()

      val got = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      // fed in doc_id order, first-seen == global min id per bucket, which
      // is exactly the batch ownership table
      val expectedOwner = Dedup.md5BandTableForTest(
          graft.Tables.documents(spark, d).select("doc_id", "text"))
        .groupBy("bkey").agg(min("doc_id").as("owner"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got.nonEmpty)
      got.foreach { case (id, bkey, owner) =>
        assert(owner == expectedOwner(bkey),
          s"bucket $bkey: stream owner $owner vs batch ${expectedOwner(bkey)}")
        assert(owner <= id, "owner must be first-seen (min id under ordered feed)")
      }
      // every (doc, bkey) claim the batch table has must have streamed out
      val gotPairs = got.map(h => (h._1, h._2)).toSet
      val batchPairs = Dedup.md5BandTableForTest(
          graft.Tables.documents(spark, d).select("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getString(2))).toSet
      assert(gotPairs == batchPairs,
        s"missing: ${(batchPairs -- gotPairs).take(3)}; extra: ${(gotPairs -- batchPairs).take(3)}")
      // near-dup candidates: docs hitting a bucket someone else owns
      val candidates = got.collect { case (id, _, owner) if owner != id => id }.toSet
      assert(candidates.nonEmpty, "corpus has near-dups; stream must flag candidates")
      // state is bounded by DISTINCT buckets, not stream length
      val stateRows = Option(query.lastProgress).toSeq
        .flatMap(_.stateOperators).map(_.numRowsTotal).sum
      assert(stateRows.toInt == expectedOwner.size,
        s"state rows $stateRows != ${expectedOwner.size} distinct buckets")
    } finally query.stop()
  }

  test("bucket TTL evicts quiet buckets: state drains to zero after the window") {
    val spark = StreamFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = graft.Tables.documents(spark, d)
      .select($"doc_id", $"text").as[(Long, String)]
      .collect().sortBy(_._1).take(50)

    val input = MemoryStream[(Long, String)]
    val hits = Dedup.nearDupStream(input.toDF().toDF("doc_id", "text"), bucketTtlMs = 300)
    val name = "ttl_" + UUID.randomUUID().toString.replace("-", "")
    val query = hits.toDF().writeStream
      .outputMode("append")
      .queryName(name)
      .format("memory")
      .option("checkpointLocation", Files.createTempDirectory("graft-ckpt").toString)
      .trigger(Trigger.ProcessingTime("25 milliseconds"))
      .start()
    try {
      def stateRows = Option(query.lastProgress).toSeq
        .flatMap(_.stateOperators).map(_.numRowsTotal).sum
      input.addData(docs: _*)
      // NO processAllAvailable here: with processing-time timeouts firing
      // every trigger, it can wait forever for a quiet batch (EvictionSpec
      // polls for the same reason). Poll the sink + state metrics instead.
      val populated = {
        val deadline = System.currentTimeMillis() + 20000
        while ((spark.table(name).count() == 0 || stateRows == 0) &&
          System.currentTimeMillis() < deadline) Thread.sleep(50)
        stateRows
      }
      assert(spark.table(name).count() > 0, "hits must reach the sink")
      assert(populated > 0, "buckets must be resident right after the batch")
      // no further data: every bucket goes quiet and the TTL must drain it
      val deadline = System.currentTimeMillis() + 20000
      while (stateRows != 0 && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(stateRows == 0, s"TTL did not evict quiet buckets: $stateRows resident")
    } finally query.stop()
  }
}
