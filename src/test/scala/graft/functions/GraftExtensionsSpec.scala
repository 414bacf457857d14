package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamFixture

/** The SQL surface of the codegen'd vector kernels: both registration
  * paths (runtime FunctionRegistry and spark.sql.extensions-style
  * builder injection) must resolve graft_dot / graft_agree_count to the
  * same expressions the Column API plans. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("runtime registration makes the kernels callable from SQL, codegen'd") {
    val spark = StreamFixture.spark
    GraftExtensions.register(spark)
    val df = spark.sql(
      """SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d,
        |       graft_agree_count(array(1L, 2L, 3L), array(1L, 9L, 3L)) AS c""".stripMargin)
    val row = df.collect().head
    assert(row.getDouble(0) == 32.0 && row.getInt(1) == 2)
    // registration is idempotent (replaces, not duplicates-or-throws)
    GraftExtensions.register(spark)
    assert(spark.sql("SELECT graft_dot(array(1.0d), array(2.0d))").collect().head.getDouble(0) == 2.0)
    // the SQL path must plan the SAME custom expression (shows up by name),
    // not a fallback — and over a real scan it stays in codegen
    GraftExtensions.register(spark)
    val planned = spark.sql(
      """SELECT graft_dot(CAST(embedding AS ARRAY<DOUBLE>), CAST(embedding AS ARRAY<DOUBLE>)) AS n
        |FROM parquet.`/root/testdata/sf0.001/embeddings.parquet`""".stripMargin)
    assert(planned.queryExecution.executedPlan.toString.contains("graft_dot"))
    val viaSql = planned.collect().map(_.getDouble(0)).sorted
    val viaCol = {
      import org.apache.spark.sql.functions.col
      val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      e.select(VectorFunctions.dot(
          col("embedding").cast("array<double>"), col("embedding").cast("array<double>")))
        .collect().map(_.getDouble(0)).sorted
    }
    assert(viaSql.toSeq == viaCol.toSeq, "SQL and Column paths must compute identically")
  }

  test("builder injection (the spark.sql.extensions path) applies to a fresh session") {
    val base = StreamFixture.spark
    // a new session over the SAME SparkContext, built with the extensions
    // hook exactly as --conf spark.sql.extensions would
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val injected = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(injected ne base, "must be a fresh session, not the fixture")
      val v = injected.sql("SELECT graft_dot(array(2.0d, 3.0d), array(4.0d, 5.0d))")
        .collect().head.getDouble(0)
      assert(v == 23.0)
      // do NOT injected.stop(): SparkSession.stop() stops the SHARED
      // SparkContext; the extra session is state-only and GC-collectable
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }
}
