package graft.streaming

import java.nio.file.Files
import java.util.UUID

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** Streaming BM25 index maintenance: a document stream drained through
  * the foreachBatch partial-materializing sink must serve search results
  * identical to a direct whole-corpus recompute AFTER EVERY CHUNK — the
  * retrieval index stays continuously correct as the corpus grows,
  * without ever rescanning history (the ingest-side twin of the
  * bm25_incremental batch merge, which the driver hash-checks). */
class Bm25StreamSpec extends AnyFunSuite {

  test("streamed index partials serve exactly the direct BM25 ranking after each chunk") {
    val spark = StreamFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "source", "text")
    val chunks = (0 until 3).map(i =>
      docs.filter($"doc_id" % 3 === i).as[(Long, String, String)].collect().toSeq)

    val statePath = Files.createTempDirectory("graft-bm25idx").toString + "/idx"
    val input = MemoryStream[(Long, String, String)]
    val query = input.toDF().toDF("doc_id", "source", "text").writeStream
      .outputMode("update")
      .queryName("bm25idx_" + UUID.randomUUID().toString.replace("-", ""))
      .option("checkpointLocation", Files.createTempDirectory("graft-ckpt").toString)
      .foreachBatch(TextOps.bm25IndexSink(statePath) _)
      .start()
    try {
      var arrived = Seq.empty[(Long, String, String)]
      chunks.foreach { chunk =>
        input.addData(chunk: _*)
        query.processAllAvailable()
        arrived ++= chunk
        // served-from-index == direct recompute over exactly the docs seen
        val served = TextOps.bm25ServeFromIndex(
            spark, statePath, TextOps.Bm25Query, 10).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
        val direct = TextOps.bm25Search(
            arrived.toDF("doc_id", "source", "text"), TextOps.Bm25Query, 10).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
        assert(served == direct,
          s"after ${arrived.size} docs: served $served vs direct $direct")
      }
      // the index holds one partial set per micro-batch — replaying the
      // LAST batch id (a retry) must overwrite, not double-count
      val lastBatch = spark.read.parquet(s"$statePath/st").selectExpr("max(batch)")
        .collect()(0).getInt(0)
      TextOps.bm25IndexSink(statePath)(
        chunks.last.toDF("doc_id", "source", "text"), lastBatch.toLong)
      val reServed = TextOps.bm25ServeFromIndex(
          spark, statePath, TextOps.Bm25Query, 10).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      val direct = TextOps.bm25Search(
          arrived.toDF("doc_id", "source", "text"), TextOps.Bm25Query, 10).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(reServed == direct, "retried micro-batch must be idempotent")

      // maintenance closes the loop: compacting the append-only partial
      // logs (Layout.compact, the small-file rewrite a streaming sink
      // needs) must leave served rankings unchanged — the merge-on-read
      // serve is layout-agnostic by construction
      val compactPath = Files.createTempDirectory("graft-bm25idx2").toString + "/idx"
      Seq("tf", "dl", "df", "st").foreach { part =>
        val (before, after) = graft.operators.Layout.compact(
          spark, s"$statePath/$part", s"$compactPath/$part", targetBytes = 64L << 20)
        assert(after <= before, s"$part: compaction must not grow the file count")
      }
      val servedCompact = TextOps.bm25ServeFromIndex(
          spark, compactPath, TextOps.Bm25Query, 10).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(servedCompact == direct, "compacted index must serve identical rankings")
    } finally query.stop()
  }

  test("hybrid serving from the streamed lexical index equals the direct hybrid after each chunk") {
    val spark = StreamFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Similarity

    val d = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, d).select("doc_id", "source", "text")
    val vecs = Similarity.vectorTable(graft.Tables.embeddings(spark, d)).persist()
    val chunks = (0 until 3).map(i =>
      docs.filter($"doc_id" % 3 === i).as[(Long, String, String)].collect().toSeq)

    val statePath = Files.createTempDirectory("graft-hyidx").toString + "/idx"
    val input = MemoryStream[(Long, String, String)]
    val query = input.toDF().toDF("doc_id", "source", "text").writeStream
      .outputMode("update")
      .queryName("hyidx_" + UUID.randomUUID().toString.replace("-", ""))
      .option("checkpointLocation", Files.createTempDirectory("graft-hy-ckpt").toString)
      .foreachBatch(TextOps.bm25IndexSink(statePath) _)
      .start()
    try {
      var arrived = Seq.empty[(Long, String, String)]
      chunks.foreach { chunk =>
        input.addData(chunk: _*)
        query.processAllAvailable()
        arrived ++= chunk
        val served = Similarity.hybridServeFromIndex(spark, statePath, vecs).collect()
          .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
            r.getInt(3), r.getInt(4), r.getDouble(5))).toSeq
        val direct = Similarity.hybridFrom(
            TextOps.bm25Search(arrived.toDF("doc_id", "source", "text"),
              TextOps.Bm25Query, Similarity.HybridN).select($"doc_id", $"score"),
            vecs).collect()
          .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
            r.getInt(3), r.getInt(4), r.getDouble(5))).toSeq
        assert(served == direct, s"after ${arrived.size} docs")
      }
    } finally { query.stop(); vecs.unpersist() }
  }
}
