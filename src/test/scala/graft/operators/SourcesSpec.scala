package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamFixture.spark

/** Source/sink format coverage beyond the parquet tables and the Kafka/
  * memory streaming paths: JSON-lines, CSV (with explicit schema — CSV
  * carries none), and ORC all round-trip the documents table content
  * exactly. Spark treats every format behind the same DataFrame read/write
  * surface, so the engine inherits them for free — these tests pin that
  * the inherited behavior actually holds for this data (UTF-8 text with
  * embedded quotes/newlines is exactly where CSV escaping goes wrong). */
class SourcesSpec extends AnyFunSuite {

  val d = "/root/testdata/sf0.001"

  private def docs = graft.Tables.documents(spark, d)
    .select(col("doc_id"), col("lang"), col("text"))

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, String)] =
    df.select(col("doc_id"), col("lang"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1).toSeq

  test("JSON-lines round-trip preserves every document") {
    val dir = Files.createTempDirectory("graft-json").toString + "/docs"
    docs.write.json(dir)
    val back = spark.read.json(dir)
    // JSON infers doc_id as long; reorder columns to match
    assert(canon(back) == canon(docs))
  }

  test("CSV round-trip with explicit schema preserves UTF-8 text with quotes and commas") {
    val dir = Files.createTempDirectory("graft-csv").toString + "/docs"
    docs.write.option("header", "true").option("escape", "\"").csv(dir)
    val back = spark.read
      .schema("doc_id LONG, lang STRING, text STRING")
      .option("header", "true").option("escape", "\"")
      .csv(dir)
    assert(canon(back) == canon(docs))
  }

  test("ORC round-trip preserves schema and content") {
    val dir = Files.createTempDirectory("graft-orc").toString + "/docs"
    docs.write.orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == docs.schema)
    assert(canon(back) == canon(docs))
  }

  test("XML round-trip (built-in Spark 4 source) preserves UTF-8 text through entity escaping") {
    // XML is where markup-significant characters (<, &, quotes) and
    // non-ASCII text go through an extra encode/decode layer — exactly
    // the corpus content most likely to corrupt.
    val dir = Files.createTempDirectory("graft-xml").toString + "/docs"
    docs.write
      .format("xml").option("rowTag", "doc").option("rootTag", "docs")
      .save(dir)
    val back = spark.read
      .format("xml").option("rowTag", "doc")
      .schema("doc_id LONG, lang STRING, text STRING")
      .load(dir)
    assert(canon(back) == canon(docs))
  }

  test("corrupt JSON records: PERMISSIVE quarantines, FAILFAST aborts — bad rows never pass silently") {
    // Operational reality of TB-scale ingest: some records are garbage.
    // PERMISSIVE mode must land them in the corrupt-record column with
    // every well-formed field nulled (no half-parsed rows), and FAILFAST
    // must refuse the batch — the two policies a pipeline chooses between.
    val dir = Files.createTempDirectory("graft-badjson").toString + "/in"
    val good = Seq(
      """{"doc_id": 1, "text": "alpha"}""",
      """{"doc_id": 2, "text": "beta"}""")
    val bad = Seq(
      """{"doc_id": 3, "text": "gamma""", // truncated
      """not json at all""")
    import spark.implicits._
    (good ++ bad).toDF("value").coalesce(1).write.text(dir)

    val schema = "doc_id LONG, text STRING, _corrupt_record STRING"
    val permissive = spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir)
      .cache()
    assert(permissive.count() == 4)
    val quarantined = permissive.filter(col("_corrupt_record").isNotNull)
    assert(quarantined.count() == 2)
    assert(quarantined.filter(col("doc_id").isNotNull || col("text").isNotNull).count() == 0,
      "corrupt rows must not surface half-parsed fields")
    assert(permissive.filter(col("_corrupt_record").isNull).count() == 2)
    permissive.unpersist()

    val failfast = spark.read
      .schema("doc_id LONG, text STRING")
      .option("mode", "FAILFAST")
      .json(dir)
    val e = intercept[org.apache.spark.SparkException] { failfast.collect() }
    assert(e.getMessage != null)
  }

  test("incremental file ingest: Trigger.AvailableNow processes only the delta across checkpointed runs") {
    // The nightly-incremental pattern at 100 TB: a file-source stream with
    // a persistent checkpoint processes everything available, terminates,
    // and a later run picks up ONLY files that arrived since — no rescans,
    // no duplicates, driven entirely by checkpointed source offsets.
    import org.apache.spark.sql.streaming.Trigger
    val root = Files.createTempDirectory("graft-incr")
    val in = root.resolve("in").toString
    val ckpt = root.resolve("ckpt").toString
    val out = root.resolve("out").toString
    import spark.implicits._

    def runOnce(): Unit = {
      val q = spark.readStream
        .schema("doc_id LONG, text STRING")
        .json(in)
        .writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .write.mode("append").json(in)
    runOnce()
    val firstPass = spark.read.parquet(out).as[(Long, String)].collect().toSet
    assert(firstPass == Set((1L, "alpha"), (2L, "beta")))

    Seq((3L, "gamma")).toDF("doc_id", "text")
      .write.mode("append").json(in)
    runOnce()
    val secondPass = spark.read.parquet(out).as[(Long, String)].collect().toSeq
    assert(secondPass.size == 3, s"delta run must add exactly one row: $secondPass")
    assert(secondPass.toSet == Set((1L, "alpha"), (2L, "beta"), (3L, "gamma")))
  }

  test("doc_chunk invariants: full coverage, fixed stride, tail always chunked") {
    // Cross-checks the chunker beyond the oracle: every chunk except the
    // last has exactly ChunkWindow tokens, consecutive chunks start
    // ChunkStride apart (so overlap = W - S tokens), and the union of
    // chunks covers every token position of every document.
    val chunks = TextOps.qDocChunk(spark, d)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
      .groupBy(_._1)
    val lens = graft.Tables.documents(spark, d)
      .select(col("doc_id"), size(TextOps.normWords(col("text"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val W = TextOps.ChunkWindow
    val S = TextOps.ChunkStride
    lens.foreach { case (doc, n) =>
      val cs = chunks(doc).sortBy(_._2)
      assert(cs.map(_._2) == cs.indices.toSeq, s"doc $doc: chunk_idx gaps")
      // expected chunk count: ceil(max(n-W,0)/S)+1
      val expected = math.ceil(math.max(n - W, 0) / S.toDouble).toInt + 1
      assert(cs.size == expected, s"doc $doc: ${cs.size} chunks for $n tokens")
      cs.init.foreach { case (_, _, tok) => assert(tok == W, s"doc $doc: interior chunk != $W") }
      // coverage: last chunk must reach the final token
      val (_, lastIdx, lastTok) = cs.last
      assert(lastIdx * S + lastTok == n, s"doc $doc: tail uncovered")
    }
  }

  test("schema evolution: mergeSchema unifies old and new parquet generations (scale: long-lived corpora)") {
    // A 100 TB corpus is written over months; later generations grow
    // columns. mergeSchema must surface the union schema with nulls for
    // the old generation — and unionByName(allowMissingColumns) is the
    // in-query equivalent.
    val dir = Files.createTempDirectory("graft-evolve").toString + "/docs"
    val v1 = docs.select(col("doc_id"), col("text"))
    val v2 = docs.select(col("doc_id"), col("text"), col("lang"),
      org.apache.spark.sql.functions.length(col("text")).as("n_chars"))
    v1.write.parquet(s"$dir/gen=1")
    v2.write.parquet(s"$dir/gen=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("doc_id", "text", "lang", "n_chars", "gen"))
    val n = docs.count()
    assert(merged.count() == 2 * n)
    assert(merged.filter(col("gen") === 1 && col("lang").isNull).count() == n)
    assert(merged.filter(col("gen") === 2 && col("lang").isNotNull).count() == n)

    val unioned = v1.unionByName(v2, allowMissingColumns = true)
    assert(unioned.columns.toSet == Set("doc_id", "text", "lang", "n_chars"))
    assert(unioned.count() == 2 * n)
  }

  test("partitioned parquet write prunes partitions on read (scale: partition pruning)") {
    val dir = Files.createTempDirectory("graft-part").toString + "/docs"
    docs.write.partitionBy("lang").parquet(dir)
    val one = spark.read.parquet(dir).filter(col("lang") === "en")
    val plan = one.queryExecution.executedPlan.toString
    // the lang filter must become a partition filter, not a data filter
    assert(plan.contains("PartitionFilters") &&
      plan.linesIterator.exists(l => l.contains("PartitionFilters") && l.contains("lang")),
      s"partition pruning missing:\n$plan")
    assert(one.count() == docs.filter(col("lang") === "en").count())
  }
}
