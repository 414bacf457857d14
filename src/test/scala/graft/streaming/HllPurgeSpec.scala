package graft.streaming

import java.nio.file.Files
import java.util.UUID

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** Streamed HLL serving state + RTBF purge (r17, VERDICT r16 task 5a) —
  * the last declared-rebuild purge row closed. An event stream drained
  * through the per-batch (event_type, day) HLL partial sink must serve
  * the q43 rollup IDENTICAL to a direct whole-corpus pass after every
  * chunk — exactly, because HLL union is register-wise max and therefore
  * composes exactly under arbitrary batch splits. The purge contract is
  * the overlapPurgeSink contract at cell grain: affected cells re-sketch
  * from live events, tombstone epochs fold by max-epoch, replay is
  * idempotent, post-purge ingest merges back in, untouched cells' state
  * is never rewritten. */
class HllPurgeSpec extends AnyFunSuite {

  private type Ev = (Long, java.sql.Timestamp, Long, String)

  private def rows(df: DataFrame): Seq[(String, Any)] =
    df.collect().map(r => (r.getString(0), r.get(1))).toSeq

  private def direct(live: DataFrame): Seq[(String, Any)] =
    rows(Relational.hllPartitionedDistinctFrom(live))

  private def toDf(evs: Seq[Ev]): DataFrame = {
    val spark = StreamFixture.spark
    import spark.implicits._
    evs.toDF("event_id", "ts", "user_id", "event_type")
  }

  test("streamed HLL partials serve exactly the direct rollup after each " +
    "chunk; retried micro-batch idempotent") {
    val spark = StreamFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val evs = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "event_type").as[Ev].collect().toSeq
    val chunks = (0 until 3).map(i => evs.filter(_._1 % 3 == i))

    val statePath = Files.createTempDirectory("graft-hll").toString + "/state"
    val input = MemoryStream[Ev]
    val query = input.toDF().toDF("event_id", "ts", "user_id", "event_type")
      .writeStream
      .outputMode("update")
      .queryName("hll_" + UUID.randomUUID().toString.replace("-", ""))
      .option("checkpointLocation", Files.createTempDirectory("graft-hll-ckpt").toString)
      .foreachBatch(Relational.hllSketchSink(statePath) _)
      .start()
    try {
      var arrived = Seq.empty[Ev]
      chunks.foreach { chunk =>
        input.addData(chunk: _*)
        query.processAllAvailable()
        arrived ++= chunk
        assert(rows(Relational.hllServeFromState(spark, statePath))
          == direct(toDf(arrived)), s"after ${arrived.size} events")
      }
      // a retried micro-batch must overwrite its own partial
      val lastBatch = spark.read.parquet(s"$statePath/sk")
        .selectExpr("max(batch)").collect()(0).getInt(0)
      Relational.hllSketchSink(statePath)(toDf(chunks.last), lastBatch.toLong)
      assert(rows(Relational.hllServeFromState(spark, statePath))
        == direct(toDf(arrived)), "retried micro-batch must be idempotent")
    } finally query.stop()
  }

  test("HLL purge epoch: served == direct over live events; replay " +
    "idempotent; post-purge ingest merges; later epoch wins; untouched " +
    "cells untouched") {
    val spark = StreamFixture.spark
    import spark.implicits._

    val evs = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "event_type").as[Ev].collect().toSeq
    def cells(df: DataFrame): DataFrame =
      df.select(col("event_type"), to_date(col("ts")).as("day")).distinct()
    def cellSet(df: DataFrame): Set[(String, java.sql.Date)] =
      cells(df).collect().map(r => (r.getString(0), r.getDate(1))).toSet
    def liveIn(live: DataFrame, affected: DataFrame): DataFrame =
      live.join(affected,
        live("event_type") === affected("event_type") &&
          to_date(live("ts")) === affected("day"), "left_semi")

    val statePath = Files.createTempDirectory("graft-hllpurge").toString + "/state"
    val (c0, c1) = evs.splitAt(evs.size / 2)
    Relational.hllSketchSink(statePath)(toDf(c0), 0L)
    Relational.hllSketchSink(statePath)(toDf(c1), 1L)
    assert(rows(Relational.hllServeFromState(spark, statePath)) == direct(toDf(evs)),
      "happy-path serve broken before any purge")

    // RTBF: users with user_id % 17 == 0 opt out — all their events go
    val victims = evs.filter(_._3 % 17 == 0)
    assert(victims.nonEmpty && victims.size < evs.size, "fixture degenerate")
    val live = evs.filterNot(_._3 % 17 == 0)
    val affected = cells(toDf(victims)).persist()
    Relational.hllPurgeSink(spark, statePath, 100L)(
      liveIn(toDf(live), affected), affected)
    assert(rows(Relational.hllServeFromState(spark, statePath)) == direct(toDf(live)),
      "post-purge serve != direct over live events")

    // replayed purge epoch (a retry) must overwrite, not corrupt
    Relational.hllPurgeSink(spark, statePath, 100L)(
      liveIn(toDf(live), affected), affected)
    assert(rows(Relational.hllServeFromState(spark, statePath)) == direct(toDf(live)),
      "purge replay changed the serve")

    // cell grain: only affected cells were re-sketched
    val rebuiltCells = cellSet(spark.read.parquet(s"$statePath/purge")
      .select(col("event_type"), col("day").cast("timestamp").as("ts")))
    assert(rebuiltCells.subsetOf(cellSet(toDf(victims))),
      "purge must not rewrite untouched cells' state")

    // post-purge ingest merges back in (batch ids >= cutoff)
    val fresh = Seq[Ev](
      (900001L, c0.head._2, 990001L, c0.head._4),
      (900002L, c1.last._2, 990002L, c1.last._4))
    Relational.hllSketchSink(statePath)(toDf(fresh), 2L)
    val live2 = live ++ fresh
    assert(rows(Relational.hllServeFromState(spark, statePath)) == direct(toDf(live2)),
      "post-purge ingest did not merge back into the served rollup")

    // a SECOND purge (later epoch) must win over the first rebuilt sketch
    val victims2 = live2.filter(_._3 % 17 == 5)
    assert(victims2.nonEmpty)
    val live3 = live2.filterNot(_._3 % 17 == 5)
    val affected2 = cells(toDf(victims2)).persist()
    Relational.hllPurgeSink(spark, statePath, 101L)(
      liveIn(toDf(live3), affected2), affected2)
    assert(rows(Relational.hllServeFromState(spark, statePath)) == direct(toDf(live3)),
      "later purge epoch must supersede the earlier rebuilt sketch")
  }

  test("a cell whose EVERY event is purged vanishes from the served " +
    "rollup: tombstone without a rebuilt sketch, surviving cells exact") {
    // The hllPurgeSink scaladoc's reason for taking affectedCells
    // separately from the live events — proven here directly, not by
    // composition: a totally-purged cell contributes an EMPTY rebuild
    // (zero rows under purge/epoch=) yet its tombstone still excises the
    // pre-purge partials, so the cell is absent from the serve exactly
    // as a live-corpus rebuild would have it.
    val spark = StreamFixture.spark
    import spark.implicits._

    val all = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "event_type")
    // victim = the smallest (event_type, day) cell, resolved in-plan so
    // the client never re-derives to_date's session-timezone semantics
    val victim = all.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .count().orderBy(col("count"), col("event_type"), col("day"))
      .limit(1).select("event_type", "day").persist()
    def inVictim(df: DataFrame, joinType: String): DataFrame =
      df.join(victim,
        df("event_type") === victim("event_type") &&
          to_date(df("ts")) === victim("day"), joinType)
    val live = inVictim(all, "left_anti")
    assert(inVictim(all, "left_semi").count() > 0 && live.count() > 0,
      "fixture degenerate")

    val statePath = Files.createTempDirectory("graft-hllcell").toString + "/state"
    Relational.hllSketchSink(statePath)(all, 0L)
    Relational.hllPurgeSink(spark, statePath, 100L)(
      inVictim(live, "left_semi"), victim) // live events of the cell: none
    assert(spark.read.parquet(s"$statePath/purge/epoch=100").count() == 0,
      "a totally-purged cell must rebuild to zero rows, not crash")
    assert(rows(Relational.hllServeFromState(spark, statePath)) == direct(live),
      "served rollup must equal a direct pass over the corpus minus the cell")
  }

  test("purge before first ingest: cutoff-0 tombstone, no crash, later " +
    "ingest merges") {
    val spark = StreamFixture.spark
    import spark.implicits._

    val evs = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "event_type").as[Ev].collect().toSeq
    val statePath = Files.createTempDirectory("graft-hllpre").toString + "/state"
    val affected = toDf(evs.take(1))
      .select(col("event_type"), to_date(col("ts")).as("day")).distinct()
    Relational.hllPurgeSink(spark, statePath, 100L)(
      toDf(Seq.empty), affected)
    val cutoffs = spark.read.parquet(s"$statePath/ts")
      .select("cutoff").collect().map(_.getLong(0)).toSeq
    assert(cutoffs == Seq(0L), "pre-ingest purge must write a cutoff-0 tombstone")
    assert(rows(Relational.hllServeFromState(spark, statePath)).isEmpty,
      "serving an ingest-free state must be empty, not a crash")
    Relational.hllSketchSink(statePath)(toDf(evs), 0L)
    assert(rows(Relational.hllServeFromState(spark, statePath)) == direct(toDf(evs)),
      "post-purge ingest must serve exactly the direct rollup")
  }
}
