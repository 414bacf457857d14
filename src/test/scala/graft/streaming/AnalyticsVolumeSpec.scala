package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import java.util.UUID

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** Volume soak for the product-analytics streaming twins (VERDICT r8
  * task 8): funnelStream and retentionStream document O(1) state per
  * user; this replays 50k events through each and asserts the state
  * store's TOTAL row count is bounded by the user population — the
  * property that lets a live dashboard run on an unbounded ingest stream.
  * The correctness halves (advances == batch results) live in
  * StreamingWindowSpec; here the assertions are about STATE SIZE, the
  * thing that fails at volume. */
class AnalyticsVolumeSpec extends AnyFunSuite {

  private val NUsers = 2000
  private val PerUser = 25 // 50k events total
  private val Steps = Seq("view", "cart", "purchase")

  /** user u's k-th event: cycles through funnel steps + noise types, with
    * globally increasing timestamps per user (the ordered-replay
    * contract both twins document). */
  private def event(u: Long, k: Int): (Long, String, Timestamp) = {
    val types = Seq("view", "noise", "cart", "click", "purchase")
    val ts = new Timestamp(1700000000000L + u * 1000000L + k * 1000L)
    (u, types((k + (u % 3).toInt) % types.length), ts)
  }

  private def stateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
    Option(q.lastProgress).map(_.stateOperators).filter(_.nonEmpty)
      .map(_.head.numRowsTotal).getOrElse(-1L)

  test("funnelStream: 50k-event replay keeps state at one row per advanced user") {
    val spark = StreamFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Long, String, Timestamp)]
    val advances = Relational.funnelStream(
      input.toDF().toDF("user_id", "event_type", "ts"), Steps)
    val name = "funnel_vol_" + UUID.randomUUID().toString.replace("-", "")
    val query = advances.toDF().writeStream
      .outputMode("update").queryName(name).format("memory")
      .option("checkpointLocation", Files.createTempDirectory("graft-ckpt").toString)
      .trigger(Trigger.ProcessingTime("25 milliseconds"))
      .start()
    try {
      // 5 chunks of 10k, each a closed per-user time range (ordered replay)
      (0 until 5).foreach { chunk =>
        input.addData((for {
          u <- 0L until NUsers
          k <- chunk * (PerUser / 5) until (chunk + 1) * (PerUser / 5)
        } yield event(u, k)): _*)
        query.processAllAvailable()
      }
      val rows = stateRows(query)
      val advanced = spark.table(name).select("user_id").distinct().count()
      assert(advanced > NUsers / 2, s"fixture too weak: only $advanced users advanced")
      // funnel state is written only once a user advances: the store must
      // hold EXACTLY one row per advanced user — not per event
      assert(rows == advanced,
        s"state rows $rows != advanced users $advanced (state must be O(users), not O(events))")
      // and stages never exceed the funnel depth
      val maxStage = spark.table(name).agg(org.apache.spark.sql.functions.max("stage"))
        .collect()(0).getInt(0)
      assert(maxStage <= Steps.length)
    } finally query.stop()
  }

  test("retentionStream: 50k-event replay keeps state at one row per user") {
    val spark = StreamFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Long, Timestamp)]
    val advances = Relational.retentionStream(input.toDF().toDF("user_id", "ts"))
    val name = "retention_vol_" + UUID.randomUUID().toString.replace("-", "")
    val query = advances.toDF().writeStream
      .outputMode("update").queryName(name).format("memory")
      .option("checkpointLocation", Files.createTempDirectory("graft-ckpt").toString)
      .start()
    try {
      // spread each user's events over ~4 weeks so offsets actually move
      (0 until 5).foreach { chunk =>
        input.addData((for {
          u <- 0L until NUsers
          k <- chunk * (PerUser / 5) until (chunk + 1) * (PerUser / 5)
        } yield (u, new Timestamp(1700000000000L + u * 3600000L + k.toLong * 6L * 86400000L))): _*)
        query.processAllAvailable()
      }
      val rows = stateRows(query)
      // retention state is exactly one (cohort, last-offset) pair per user
      assert(rows == NUsers.toLong,
        s"state rows $rows != users $NUsers (state must be O(users), not O(user-weeks))")
      // every user emitted at least the cohort advance, none twice per offset
      val perUserOffsets = spark.table(name).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSeq).toMap
      assert(perUserOffsets.size == NUsers)
      perUserOffsets.foreach { case (u, offs) =>
        assert(offs.distinct.length == offs.length, s"user $u duplicate offsets: $offs")
      }
    } finally query.stop()
  }
}
