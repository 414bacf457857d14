package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator surface (SURVEY.md §2.4).
  *
  * Every query is a pure `(SparkSession, sfDir) => DataFrame` so the
  * DuckDB-oracle harness can hash results. Design rules applied throughout:
  *
  *  - declarative DataFrame ops only — Catalyst supplies pushdown, pruning,
  *    join selection, partial aggregation; no RDDs, no collect loops.
  *  - dimension tables (region/nation/customer/supplier/part at TPC-H
  *    proportions) are `broadcast()` so fact-side scans never shuffle for
  *    the join; fact⋈fact joins shuffle once on the join key and AQE picks
  *    SMJ vs shuffled-hash at runtime.
  *  - every computed double is rounded on output (and the oracle SQL rounds
  *    identically) so cross-engine float summation-order noise can't flip a
  *    hash compare; inputs are 2-decimal money values so error << 1 ulp of
  *    the rounding grid.
  *  - top-k / windowed queries carry explicit unique tie-breaker keys so the
  *    result SET is deterministic.
  */
object Relational {

  /** Full-scan count — exercises parquet scan + partial count aggregation
    * (one long per task, merged on driver; no row shuffle). */
  def q01ScanCount(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).agg(count(lit(1)).as("n"))

  /** Projection + filter. Filter and the 4-column projection reach the
    * parquet reader (PushedFilters + pruned ReadSchema) — at 100 TB this is
    * the difference between scanning 4 columns of a date range and the
    * whole table. */
  def q02FilterProject(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") < lit("1995-01-01").cast("timestamp"))
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 2).as("net_price"))

  /** Equi inner join, broadcast: orders (fact) ⋈ customer (dim). customer is
    * ~1.5 % of orders rows — broadcast keeps the fact side shuffle-free. */
  def q03JoinBroadcast(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
      .select(
        col("o_orderkey"),
        col("c_custkey"),
        col("c_name"),
        round(col("o_totalprice"), 2).as("total"))

  /** Equi inner join, shuffle: lineitem ⋈ orders — both fact-sized, so this
    * is a genuine shuffle-on-key join (AQE chooses SMJ/shuffled-hash).
    * Aggregates after the join so the shuffle output is small. */
  def q04JoinShuffle(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))

  /** Left-semi join (EXISTS): customers that placed at least one order. */
  def q05JoinSemi(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))

  /** Left-anti join (NOT EXISTS): customers with no orders. */
  def q06JoinAnti(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))

  /** Hash aggregate, partial+final — TPC-H Q1 shape. Map-side partial agg
    * means the shuffle carries (flag,status) groups, not rows. */
  def q07AggTpchQ1(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** Exact distinct aggregation (two-phase shuffle: expand on user_id, then
    * merge) — per event_type unique users. */
  def q08DistinctAgg(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("uniq_users"))

  /** Approximate distinct via HLL++ — the 100 TB answer to q08: one pass,
    * fixed-size sketch per group, no expand shuffle. No DuckDB oracle (HLL
    * implementations differ); ScalaTest bounds it against the exact count. */
  def q09ApproxDistinct(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"))

  /** Grouping sets via ROLLUP: revenue by (nation, year), (nation), ().
    * Dim joins broadcast; one shuffle for the aggregate. */
  def q10Rollup(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .withColumn("order_year", year(col("o_orderdate")))
      .rollup(col("n_name"), col("order_year"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"), count(lit(1)).as("n_orders"))
      .select(col("n_name"), col("order_year"), col("revenue"), col("n_orders"))

  /** CUBE over events: all (event_type, year) combinations. */
  def q11Cube(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("event_year", year(col("ts")))
      .cube(col("event_type"), col("event_year"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(col("event_type"), col("event_year"), col("n"), col("total_value"))

  /** Window rank: top-3 orders per customer by totalprice. Tie-broken on
    * o_orderkey so the emitted set is deterministic. One shuffle on
    * o_custkey; per-partition sort. */
  def q12WindowRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), round(col("o_totalprice"), 2).as("total"), col("rn"))
  }

  /** Window running aggregate: cumulative quantity per supplier in ship
    * order. ORDER BY is a total order (shipdate, orderkey, linenumber) so
    * every prefix sum is deterministic. */
  def q13WindowRunning(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lineitem(s, d)
      .withColumn("running_qty", round(sum(col("l_quantity")).over(w), 2))
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("running_qty"))
  }

  /** Sort + limit → TakeOrderedAndProject (per-partition top-k, merge on
    * driver — no global sort shuffle). Tie-broken on p_partkey. */
  def q14TopK(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
      .limit(10)
      .select(col("p_partkey"), col("p_name"), round(col("p_retailprice"), 2).as("price"))

  /** Set ops: users who both signed up and purchased, minus users who ever
    * errored — INTERSECT then EXCEPT (both distinct-set semantics). */
  def q15SetOps(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    def slice(t: String) = ev.filter(col("event_type") === t).select(col("user_id"))
    slice("signup").intersect(slice("purchase")).except(slice("error"))
  }

  /** UNION ALL of two tagged slices + reaggregation (multiset union). */
  def q16UnionAll(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val a = ev.filter(col("event_type") === "purchase").select(lit("buyers").as("tag"), col("user_id"))
    val b = ev.filter(col("value") > 50.0).select(lit("whales").as("tag"), col("user_id"))
    a.union(b).groupBy(col("tag"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("uniq"))
  }

  /** Scalar string/date/math functions: month bucketing + string surgery on
    * order priority. */
  def q17ScalarFns(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .withColumn("order_month", date_trunc("month", col("o_orderdate")))
      .withColumn("priority_name", upper(substring(col("o_orderpriority"), 3, 20)))
      .groupBy(col("order_month"), col("priority_name"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))

  /** JSON functions: extract props.k as int per event. */
  def q18JsonFns(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_val"))

  /** Array functions over embeddings: size, first element, L2 norm.
    * All math in double (floats widen exactly) so oracle comparison is
    * stable after round(…, 3). */
  def q19ArrayFns(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        col("embedding").getItem(0).cast("double").as("first_val"),
        round(
          sqrt(aggregate(
            transform(col("embedding"), x => x.cast("double") * x.cast("double")),
            lit(0.0), (acc, x) => acc + x)),
          3).as("l2_norm"))

  /** posexplode: flatten embeddings to (vec_id, pos, val) — 1-based pos to
    * match SQL WITH ORDINALITY. Caps to vec_id < 100 to keep the exploded
    * row count bounded at bench scale. */
  def q20Explode(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .filter(col("vec_id") < 100)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos0", "val")))
      .select(
        col("vec_id"),
        (col("pos0") + 1).as("pos"),
        col("val").cast("double").as("val"))

  /** Tumbling event-time window (the streaming-native operator, run over a
    * bounded source): hourly event counts per type. Identical code works
    * under readStream + withWatermark — see streaming specs. */
  def q21HourlyWindow(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(
        col("window.start").as("hour_start"),
        col("event_type"), col("n"), col("total_value"))
}
