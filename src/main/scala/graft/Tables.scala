package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * Plain `spark.read.parquet` — Catalyst pushes filters and prunes columns
  * down to the scan, so callers just compose DataFrame ops and the physical
  * plan reads only what it needs (verify with `.explain("formatted")`:
  * `PushedFilters` / `ReadSchema`).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** events.parquet carries `ts` as parquet TIMESTAMP(NANOS), which Spark 4
    * rejects at analysis time. Read it as a raw long (legacy nanosAsLong —
    * the SESSION must be built with `spark.sql.legacy.parquet.nanosAsLong=
    * true`; Bench/Verify/PlanDump and the test fixture all set it, and this
    * loader no longer mutates session conf as a side effect) and truncate
    * to microseconds with INTEGER division (`div`) — a double division
    * would lose precision above 2^53 ns and drift the truncation by a few
    * microseconds vs the DuckDB oracle. Oracle SQL reads nanos natively, so
    * any query emitting `ts`-derived values must truncate at or above
    * microsecond granularity on both sides. */
  private def eventsWithTs(spark: SparkSession, sfDir: String): DataFrame = {
    require(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "events.parquet is TIMESTAMP(NANOS): build the session with " +
        "spark.sql.legacy.parquet.nanosAsLong=true")
    import org.apache.spark.sql.functions._
    table(spark, sfDir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = eventsWithTs(s, d)
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
