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
