package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Overlap, Relational, Sampling, Similarity, TextOps}

/** An EMPTY micro-batch through every foreachBatch serving sink must be a
  * no-op: the next serve is identical and nothing throws. Structured
  * Streaming can legitimately deliver zero-row batches (an
  * availableNow/processing-time trigger firing on an idle source, a
  * filter inside the stream dropping a whole batch), and the hazard is
  * real on two sides: a sink that aggregates before writing can persist a
  * NULL global-aggregate row (e.g. `sum` over nothing) that a serve-side
  * fold then swallows into its own sums, and a sink that crashes on an
  * empty frame takes the whole query down. One test per serving family,
  * each: ingest a real batch → snapshot the serve → deliver an empty
  * batch under a NEW batch id → serve must equal the snapshot. */
class EmptyBatchSinkSpec extends AnyFunSuite {

  private lazy val spark = StreamFixture.spark
  private val d = "/root/testdata/sf0.001"

  private def snap(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** Ingest-once, serve, empty-batch, serve — the shared scenario. */
  private def noOp(name: String, batch: DataFrame,
      sink: (DataFrame, Long) => Unit, serve: () => DataFrame): Unit = {
    sink(batch, 0L)
    val before = snap(serve())
    assert(before.nonEmpty, s"$name: degenerate fixture (serve empty after ingest)")
    sink(batch.limit(0), 1L) // schema-preserving empty micro-batch
    assert(snap(serve()) == before,
      s"$name: an empty micro-batch changed the served result")
  }

  test("hllSketchSink: empty micro-batch is a no-op") {
    val path = Files.createTempDirectory("graft-empty-hll").toString + "/state"
    val ev = graft.Tables.events(spark, d)
      .select("event_id", "ts", "user_id", "event_type")
    noOp("hll", ev, Relational.hllSketchSink(path),
      () => Relational.hllServeFromState(spark, path))
  }

  test("Overlap.sketchSink: empty micro-batch is a no-op") {
    val path = Files.createTempDirectory("graft-empty-ovl").toString + "/state"
    val docs = graft.Tables.documents(spark, d).select("doc_id", "source", "text")
    noOp("overlap", docs, Overlap.sketchSink(path),
      () => Overlap.overlapServeFromState(spark, path))
  }

  test("bm25IndexSink: empty micro-batch is a no-op (NULL tot_tokens " +
    "stats row must not poison the served sums)") {
    val path = Files.createTempDirectory("graft-empty-bm25").toString + "/state"
    val docs = graft.Tables.documents(spark, d).select("doc_id", "source", "text")
    noOp("bm25", docs, TextOps.bm25IndexSink(path),
      () => TextOps.bm25ServeFromIndex(spark, path, TextOps.Bm25Query, 10))
  }

  test("dsirSink: empty micro-batch is a no-op") {
    val path = Files.createTempDirectory("graft-empty-dsir").toString + "/state"
    val docs = graft.Tables.documents(spark, d).select("doc_id", "text", "lang")
    noOp("dsir", docs, Sampling.dsirSink(path, "en"),
      () => Sampling.dsirWeightsFromState(spark, path))
  }

  test("reservoirSink: empty micro-batch is a no-op") {
    val path = Files.createTempDirectory("graft-empty-res").toString + "/state"
    val docs = graft.Tables.documents(spark, d)
      .select("source", "doc_id", "n_chars")
    noOp("reservoir", docs,
      Sampling.reservoirSink(path, "source", "doc_id", "n_chars", 5),
      () => Sampling.reservoirServeFromState(
        spark, path, "source", "doc_id", "n_chars", 5))
  }

  test("gramIndexSink: empty micro-batch is a no-op") {
    val path = Files.createTempDirectory("graft-empty-gram").toString + "/idx"
    val docs = graft.Tables.documents(spark, d).select("doc_id", "text")
    noOp("gramIndex", docs, Dedup.gramIndexSink(path),
      () => Dedup.gramIndexFromState(spark, path))
  }

  test("refGramIndexSink: empty micro-batch is a no-op") {
    import org.apache.spark.sql.functions.lit
    val path = Files.createTempDirectory("graft-empty-refgram").toString + "/idx"
    val docs = graft.Tables.documents(spark, d)
      .select("doc_id", "text").withColumn("op", lit("publish"))
    noOp("refGramIndex", docs, Dedup.refGramIndexSink(path),
      () => Dedup.refGramIndexFromState(spark, path))
  }

  test("centroidPartialSink: empty micro-batch is a no-op") {
    val path = Files.createTempDirectory("graft-empty-cent").toString + "/parts"
    val vecs = graft.Tables.embeddings(spark, d)
      .select("vec_id", "label", "embedding")
    noOp("centroid", vecs, Similarity.centroidPartialSink(path),
      () => Similarity.centroidsFromPartials(spark, path))
  }
}
