package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import java.util.UUID

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** Streaming sessionization: under an ordered replay the emitted CLOSED
  * sessions must equal the batch q55 rows minus each user's final
  * (still-open) session, and state must stay one row per user. */
class SessionStreamSpec extends AnyFunSuite {

  test("streamed closed sessions equal batch q55 minus each user's open tail") {
    val spark = StreamFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val d = "/root/testdata/sf0.001"
    val events = graft.Tables.events(spark, d)
      .select(col("user_id"), col("event_id"), col("ts"))
      .orderBy("ts", "event_id")
      .as[(Long, Long, Timestamp)].collect().toSeq
    // ordered replay in two time-closed chunks
    val cut = events(events.length / 2)._3
    val (b1, b2) = events.partition(_._3.compareTo(cut) <= 0)

    val input = MemoryStream[(Long, Long, Timestamp)]
    val closes = Relational.sessionizeStream(
      input.toDF().toDF("user_id", "event_id", "ts"))
    val name = "sess_" + UUID.randomUUID().toString.replace("-", "")
    val query = closes.toDF().writeStream
      .outputMode("update").queryName(name).format("memory")
      .option("checkpointLocation", Files.createTempDirectory("graft-ckpt").toString)
      .start()
    try {
      input.addData(b1: _*)
      query.processAllAvailable()
      input.addData(b2: _*)
      query.processAllAvailable()

      val streamed = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      val batch = Relational.q55Sessionize(spark, d).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      // drop each user's final session — still open in the stream
      val lastIdx = batch.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      val expected = batch.filterNot(r => r._2 == lastIdx(r._1)).toSet
      assert(streamed == expected,
        s"missing: ${expected -- streamed}; extra: ${streamed -- expected}")

      // state is exactly one open-session row per user
      val rows = Option(query.lastProgress).map(_.stateOperators).filter(_.nonEmpty)
        .map(_.head.numRowsTotal).getOrElse(-1L)
      val users = events.map(_._1).distinct.length.toLong
      assert(rows == users, s"state rows $rows != users $users")
    } finally query.stop()
  }
}
