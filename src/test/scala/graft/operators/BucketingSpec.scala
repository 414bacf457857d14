package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing: the cross-query answer to repeated fact⋈fact joins at scale
  * (SURVEY §4, brief "co-located joins"). Writing both sides bucketed on
  * the join key lets EVERY subsequent join on that key skip its shuffle —
  * the plan must contain no Exchange. Verified against the plain
  * shuffle-join result. */
class BucketingSpec extends AnyFunSuite {

  test("join over tables bucketed on the key runs with zero exchanges and equal results") {
    val spark = graft.streaming.StreamFixture.spark // temp warehouse dir set there
    val d = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
    spark.sql("DROP TABLE IF EXISTS orders_bkt")

    graft.Tables.lineitem(spark, d).write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_bkt")
    graft.Tables.orders(spark, d).write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_bkt")

    // merge hint pins a sort-merge join: at test scale AQE would broadcast
    // the small side, which is exactly the shuffle-question we're NOT asking
    def agg(li: org.apache.spark.sql.DataFrame, or: org.apache.spark.sql.DataFrame) =
      li.hint("merge").join(or, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("qty"))

    val bucketed = agg(spark.table("lineitem_bkt"), spark.table("orders_bkt"))
    // The join itself must not shuffle: both sides are pre-partitioned by
    // the key on disk. (The final aggregation on o_orderpriority still
    // exchanges — different key — so assert on the join subtree.)
    val plan = bucketed.queryExecution.executedPlan.toString
    val joinSubtree = plan.substring(plan.indexOf("SortMergeJoin"))
    assert(!joinSubtree.contains("Exchange"),
      s"bucketed join still shuffles:\n$joinSubtree")
    assert(plan.contains("SelectedBucketsCount"), s"bucket pruning info missing:\n$plan")

    val expected = agg(graft.Tables.lineitem(spark, d), graft.Tables.orders(spark, d))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val actual = bucketed.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(actual == expected)
  }
}
