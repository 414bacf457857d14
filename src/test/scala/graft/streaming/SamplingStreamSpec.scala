package graft.streaming

import java.nio.file.Files
import java.util.UUID

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Sampling, TextOps}

/** Streaming weighted-reservoir maintenance (r11 VERDICT task 5): a
  * document stream drained through the per-batch reservoir-partial sink
  * must serve a per-group sample IDENTICAL to a direct whole-corpus
  * [[Sampling.weightedReservoir]] pass after every chunk — exactly, not
  * approximately, because the Efraimidis–Spirakis reservoir merges like
  * KMV (top-k of a union = top-k of the union of per-shard top-ks, same
  * deterministic (rkey, id) tie-break on both paths). This is the
  * ingest-side form of reservoir_sample: the sample is maintained as the
  * corpus arrives and history is never rescanned. */
class SamplingStreamSpec extends AnyFunSuite {

  private val K = Sampling.ReservoirK

  private def weighted(df: org.apache.spark.sql.DataFrame) =
    df.select(col("source"), col("doc_id"),
        size(TextOps.normWords(col("text"))).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._4)).toSeq

  test("streamed reservoir partials serve exactly the direct sample after " +
    "each chunk, per-batch state is bounded, and a retried batch is idempotent") {
    val spark = StreamFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "source", "text")
    val chunks = (0 until 3).map(i =>
      docs.filter($"doc_id" % 3 === i).as[(Long, String, String)].collect().toSeq)
    val nGroups = docs.select("source").distinct().count()

    val statePath = Files.createTempDirectory("graft-res").toString + "/state"
    val input = MemoryStream[(Long, String, String)]
    val query = weighted(input.toDF().toDF("doc_id", "source", "text"))
      .writeStream
      .outputMode("update")
      .queryName("res_" + UUID.randomUUID().toString.replace("-", ""))
      .option("checkpointLocation", Files.createTempDirectory("graft-res-ckpt").toString)
      .foreachBatch(Sampling.reservoirSink(statePath, "source", "doc_id", "n_tokens", K) _)
      .start()
    try {
      var arrived = Seq.empty[(Long, String, String)]
      chunks.foreach { chunk =>
        input.addData(chunk: _*)
        query.processAllAvailable()
        arrived ++= chunk
        val served = rows(Sampling.reservoirServeFromState(
          spark, statePath, "source", "doc_id", "n_tokens", K))
        val direct = rows(Sampling.weightedReservoir(
          weighted(arrived.toDF("doc_id", "source", "text")),
          "source", "doc_id", "n_tokens", K))
        assert(served == direct, s"after ${arrived.size} docs")
        assert(served.nonEmpty)
      }
      // state-size bound: every per-batch partial is <= groups * k rows
      val perBatch = spark.read.parquet(s"$statePath/res")
        .groupBy("batch").count().collect().map(_.getLong(1))
      assert(perBatch.nonEmpty)
      perBatch.foreach(n =>
        assert(n <= nGroups * K, s"partial has $n rows > groups*k = ${nGroups * K}"))
      // a retried micro-batch must overwrite its own partial, not add to it
      val lastBatch = spark.read.parquet(s"$statePath/res")
        .selectExpr("max(batch)").collect()(0).getInt(0)
      Sampling.reservoirSink(statePath, "source", "doc_id", "n_tokens", K)(
        weighted(chunks.last.toDF("doc_id", "source", "text")), lastBatch.toLong)
      val reServed = rows(Sampling.reservoirServeFromState(
        spark, statePath, "source", "doc_id", "n_tokens", K))
      val direct = rows(Sampling.weightedReservoir(
        weighted(arrived.toDF("doc_id", "source", "text")),
        "source", "doc_id", "n_tokens", K))
      assert(reServed == direct, "retried micro-batch must be idempotent")
    } finally query.stop()
  }

  /** Streaming DSIR model maintenance (r15): the importance model's
    * mergeable half is an integer per-bucket count table, so per-batch
    * partials folded bucket-wise serve a model IDENTICAL to a direct
    * whole-prefix [[Sampling.dsirWeights]] pass — exactly, because the
    * ratio step is deterministic given the folded counts. */
  test("streamed DSIR count partials serve exactly the direct model after " +
    "each chunk; a retried batch is idempotent; per-batch state is bounded") {
    val spark = StreamFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDecimal(3).toPlainString))
        .sortBy(_._1).toSeq

    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text", "lang")
    val chunks = (0 until 3).map(i =>
      docs.filter($"doc_id" % 3 === i).as[(Long, String, String)].collect().toSeq)

    val statePath = Files.createTempDirectory("graft-dsir").toString + "/state"
    val input = MemoryStream[(Long, String, String)]
    val query = input.toDF().toDF("doc_id", "text", "lang")
      .writeStream
      .outputMode("update")
      .queryName("dsir_" + UUID.randomUUID().toString.replace("-", ""))
      .option("checkpointLocation", Files.createTempDirectory("graft-dsir-ckpt").toString)
      .foreachBatch(Sampling.dsirSink(statePath, "en") _)
      .start()
    try {
      var arrived = Seq.empty[(Long, String, String)]
      chunks.foreach { chunk =>
        input.addData(chunk: _*)
        query.processAllAvailable()
        arrived ++= chunk
        val served = rows(Sampling.dsirWeightsFromState(spark, statePath))
        val direct = rows(Sampling.dsirWeights(
          arrived.toDF("doc_id", "text", "lang"), col("lang") === "en"))
        assert(served == direct, s"after ${arrived.size} docs")
        assert(served.nonEmpty)
      }
      // per-batch partials are model-sized, never data-sized
      val perBatch = spark.read.parquet(s"$statePath/dsir")
        .groupBy("batch").count().collect().map(_.getLong(1))
      assert(perBatch.nonEmpty)
      perBatch.foreach(n =>
        assert(n <= Sampling.DsirBuckets, s"partial has $n rows > B = ${Sampling.DsirBuckets}"))
      // a retried micro-batch must overwrite its own partial, not add to it
      val lastBatch = spark.read.parquet(s"$statePath/dsir")
        .selectExpr("max(batch)").collect()(0).getInt(0)
      Sampling.dsirSink(statePath, "en")(
        chunks.last.toDF("doc_id", "text", "lang"), lastBatch.toLong)
      val reServed = rows(Sampling.dsirWeightsFromState(spark, statePath))
      val direct = rows(Sampling.dsirWeights(
        arrived.toDF("doc_id", "text", "lang"), col("lang") === "en"))
      assert(reServed == direct, "retried micro-batch must be idempotent")
    } finally query.stop()
  }

  /** RTBF purge for the DSIR model state (r15 deletion-propagation
    * story): the model is linear in documents, so a negated count
    * partial is an EXACT deletion — served == a full rebuild over the
    * live corpus after the purge epoch, a replayed purge must not
    * double-decrement, and a re-publish restores the original model by
    * plain linearity. */
  test("DSIR purge epoch: served == rebuild over live docs; replay " +
    "idempotent; re-publish restores; zeroed buckets leave the model") {
    val spark = StreamFixture.spark
    import spark.implicits._

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDecimal(3).toPlainString))
        .sortBy(_._1).toSeq

    val real = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text", "lang")
      .as[(Long, String, String)].collect().toSeq
    // plant a doc with a UNIQUE vocabulary: its buckets exist ONLY through
    // it, so the purge must zero them out of the served model entirely
    val planted = (900000L, "qqxyzzy qqxyzzy wwvutts", "en")
    val docs = real :+ planted
    val (c0, c1) = docs.splitAt(docs.size / 2)

    def direct(live: Seq[(Long, String, String)]) =
      rows(Sampling.dsirWeights(live.toDF("doc_id", "text", "lang"), col("lang") === "en"))

    val statePath = Files.createTempDirectory("graft-dsirpurge").toString + "/state"
    Sampling.dsirSink(statePath, "en")(c0.toDF("doc_id", "text", "lang"), 0L)
    Sampling.dsirSink(statePath, "en")(c1.toDF("doc_id", "text", "lang"), 1L)
    assert(rows(Sampling.dsirWeightsFromState(spark, statePath)) == direct(docs),
      "happy-path serve broken")

    val victims = Seq(planted)
    val live = docs.filterNot(_._1 == planted._1)
    Sampling.dsirPurgeSink(statePath, "en")(victims.toDF("doc_id", "text", "lang"), 2L)
    val afterPurge = rows(Sampling.dsirWeightsFromState(spark, statePath))
    assert(afterPurge == direct(live), "post-purge serve != rebuild over live docs")
    assert(afterPurge.size < direct(docs).size,
      "the planted doc's unique buckets must vanish from the served model")

    // replayed purge epoch (a retry) must overwrite, not double-decrement
    Sampling.dsirPurgeSink(statePath, "en")(victims.toDF("doc_id", "text", "lang"), 2L)
    assert(rows(Sampling.dsirWeightsFromState(spark, statePath)) == direct(live),
      "purge replay changed the serve")

    // re-publish in a later epoch: linearity restores the original model
    Sampling.dsirSink(statePath, "en")(victims.toDF("doc_id", "text", "lang"), 3L)
    assert(rows(Sampling.dsirWeightsFromState(spark, statePath)) == direct(docs),
      "re-published doc does not count again")
  }
}
