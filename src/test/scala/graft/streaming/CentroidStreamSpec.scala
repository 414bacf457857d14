package graft.streaming

import java.nio.file.Files
import java.util.UUID

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Streaming centroid maintenance: an embedding stream drained through the
  * foreachBatch partial-materializing sink must serve per-label centroids
  * identical to a direct whole-corpus recompute AFTER EVERY CHUNK — the
  * class-prototype table stays continuously correct as the corpus grows
  * without rescanning history (the ingest-side twin of the
  * centroid_incremental batch merge, which the driver hash-checks; decimal
  * partial sums are associative-exact, so equality is bit-for-bit). */
class CentroidStreamSpec extends AnyFunSuite {

  test("streamed centroid partials serve exactly the direct centroids after each chunk") {
    val spark = StreamFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val vecs = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "label", "embedding")
      .as[(Long, Long, Seq[Float])].collect().toSeq
    assert(vecs.nonEmpty)
    val chunks = (0 until 3).map(i => vecs.filter(_._1 % 3 == i))

    val statePath = Files.createTempDirectory("graft-centroids").toString + "/parts"
    val input = MemoryStream[(Long, Long, Seq[Float])]
    val query = input.toDF().toDF("vec_id", "label", "embedding").writeStream
      .outputMode("update")
      .queryName("centroids_" + UUID.randomUUID().toString.replace("-", ""))
      .option("checkpointLocation", Files.createTempDirectory("graft-ckpt").toString)
      .foreachBatch(Similarity.centroidPartialSink(statePath) _)
      .start()
    try {
      var arrived = Seq.empty[(Long, Long, Seq[Float])]
      chunks.foreach { chunk =>
        input.addData(chunk: _*)
        query.processAllAvailable()
        arrived ++= chunk
        val served = Similarity.centroidsFromPartials(spark, statePath)
          .collect().map(_.toSeq).toSet
        val direct = Similarity.embeddingCentroidsLong(
            arrived.toDF("vec_id", "label", "embedding"))
          .collect().map(_.toSeq).toSet
        assert(served == direct,
          s"after ${arrived.size} vectors: served-only ${(served -- direct).take(2)}; " +
            s"direct-only ${(direct -- served).take(2)}")
      }
      // a retried micro-batch overwrites its own batch=<id> directory —
      // replaying the LAST chunk must not double-count
      val lastBatch = spark.read.parquet(statePath)
        .selectExpr("max(batch)").collect()(0).getInt(0)
      Similarity.centroidPartialSink(statePath)(
        chunks.last.toDF("vec_id", "label", "embedding"), lastBatch.toLong)
      val reServed = Similarity.centroidsFromPartials(spark, statePath)
        .collect().map(_.toSeq).toSet
      val direct = Similarity.embeddingCentroidsLong(
          arrived.toDF("vec_id", "label", "embedding"))
        .collect().map(_.toSeq).toSet
      assert(reServed == direct, "replayed batch double-counted")
    } finally query.stop()
  }
}
