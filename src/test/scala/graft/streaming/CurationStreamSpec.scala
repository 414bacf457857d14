package graft.streaming

import java.nio.file.Files
import java.util.UUID

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation

/** The curation front end as a stream: Curation.signalProjection is a
  * stateless map, so documents scored as they arrive from a streaming
  * source must match the batch scores bit for bit — the property that lets
  * an ingest pipeline score-and-tag on the way in and leave only the
  * corpus-relative gates (dedup, contamination, terciles, domain mix) to
  * the batch pass. */
class CurationStreamSpec extends AnyFunSuite {

  test("streaming signal projection equals the batch projection on a replayed corpus slice") {
    val spark = StreamFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text", $"source")
      .as[(Long, String, String)]
      .collect().toSeq
    assert(docs.nonEmpty)

    val input = MemoryStream[(Long, String, String)]
    val streamed = Curation.signalProjection(
      input.toDF().toDF("doc_id", "text", "source"))
    val name = "cur_" + UUID.randomUUID().toString.replace("-", "")
    val query = streamed.writeStream
      .outputMode("append")
      .queryName(name)
      .format("memory")
      .option("checkpointLocation", Files.createTempDirectory("graft-ckpt").toString)
      .trigger(Trigger.ProcessingTime("25 milliseconds"))
      .start()
    try {
      input.addData(docs: _*)
      query.processAllAvailable()
      val expected = Curation.signalProjection(
        docs.toDF("doc_id", "text", "source")).collect().map(_.toSeq).toSet
      val got = spark.table(name).collect().map(_.toSeq).toSet
      assert(got == expected,
        s"stream-only: ${(got -- expected).take(3)}; batch-only: ${(expected -- got).take(3)}")
      assert(got.size == docs.size)
    } finally query.stop()
  }
}
