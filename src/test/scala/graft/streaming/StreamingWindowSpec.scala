package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import java.util.UUID

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** Streaming q21: the watermarked hourly-window aggregation emits, in
  * append mode, exactly the windows the batch form computes over the same
  * bounded replay (VERDICT r01 next-step 10). Uses the driver-provided
  * events table at sf0.001 as the replay source. */
class StreamingWindowSpec extends AnyFunSuite {

  test("streaming hourly window agrees with the batch form on a bounded replay") {
    val spark = StreamFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val rows = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select($"ts", $"event_type", $"value")
      .as[(Timestamp, String, Double)]
      .collect()
      .toSeq
    assert(rows.nonEmpty)

    // Sentinel far past the data pushes the watermark beyond every real
    // window so append mode finalizes them all; its own window stays open
    // and is never emitted.
    val maxTs = rows.map(_._1.getTime).max
    val sentinel = (new Timestamp(maxTs + 7 * 24 * 3600 * 1000L), "sentinel", 0.0)

    val input = MemoryStream[(Timestamp, String, Double)]
    val streamed = Relational.hourlyWindowStream(
      input.toDF().toDF("ts", "event_type", "value"))
    val name = "win_" + UUID.randomUUID().toString.replace("-", "")
    val query = streamed.writeStream
      .outputMode("append")
      .queryName(name)
      .format("memory")
      .option("checkpointLocation", Files.createTempDirectory("graft-ckpt").toString)
      .trigger(Trigger.ProcessingTime("25 milliseconds"))
      .start()
    try {
      input.addData(rows: _*)
      input.addData(sentinel)
      query.processAllAvailable()
      // one more empty-ish cycle so the advanced watermark finalizes windows
      input.addData(sentinel)
      query.processAllAvailable()

      val batch = Relational.hourlyWindowAgg(
          rows.toDF("ts", "event_type", "value"))
        .collect().map(canon).toSet
      val stream = spark.table(name).collect().map(canon).toSet
      assert(stream == batch,
        s"stream-only: ${(stream -- batch).take(3)}; batch-only: ${(batch -- stream).take(3)}")
    } finally query.stop()
  }

  private def canon(r: Row): (String, String, Long, Double) =
    (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))
}
