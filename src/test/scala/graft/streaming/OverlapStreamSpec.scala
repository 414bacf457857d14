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
}
