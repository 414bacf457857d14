package graft.operators

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  *  - money math is DECIMAL-SNAPPED: per-row money expressions are cast to
  *    decimal(18,4) (the exact grid of 2-dec × 2-dec products) and sums run
  *    over decimals, so results are order-independent and bit-identical to
  *    the DuckDB oracle — no reliance on float-sum rounding luck. Outputs
  *    are cast back to double for a stable cross-engine schema.
  *  - timestamp-derived outputs are formatted as strings so parquet/duckdb
  *    timestamp-precision differences (ms vs us vs ns) can't flip a hash.
  *  - top-k / windowed queries carry explicit unique tie-breaker keys so the
  *    result SET is deterministic.
  */
object Relational {

  /** Snap a per-row money expression to its exact decimal(18,4) grid, back
    * as double. 2-decimal money × 2-decimal rate products have ≤4 decimals,
    * so this recovers the exact mathematical value from float noise —
    * deterministically, in any engine. */
  def money(c: Column): Column = c.cast("decimal(18,4)").cast("double")

  /** Order-independent exact sum of a money expression: sum over
    * decimal(18,4), emitted as double. Bit-identical across engines and
    * partitionings — safe for hash-compared aggregates at any scale. */
  def dsum(c: Column): Column = sum(c.cast("decimal(18,4)")).cast("double")

  /** Same, for free-precision doubles (events.value): snap each value to
    * 6 decimals first so the sum is order-independent. */
  def vsum(c: Column): Column = sum(c.cast("decimal(18,6)")).cast("double")

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
      .filter(col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        money(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("net_price"))

  /** Equi inner join, broadcast: orders (fact) ⋈ customer (dim). customer is
    * ~1.5 % of orders rows — broadcast keeps the fact side shuffle-free. */
  def q03JoinBroadcast(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
      .select(
        col("o_orderkey"),
        col("c_custkey"),
        col("c_name"),
        col("o_totalprice").as("total"))

  /** Equi inner join, shuffle: lineitem ⋈ orders — both fact-sized, so this
    * is a genuine shuffle-on-key join (AQE chooses SMJ/shuffled-hash).
    * Aggregates after the join so the shuffle output is small. */
  def q04JoinShuffle(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_items"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))

  /** Left-semi join (EXISTS): customers that placed at least one order. */
  def q05JoinSemi(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))

  /** Left-anti join (NOT EXISTS): customers with no high-value order
    * (> 300k, ≈ p90 — every customer has SOME order in this data, so the
    * unqualified anti join would be vacuously empty). */
  def q06JoinAnti(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d).filter(col("o_totalprice") > 300000.0),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))

  /** Hash aggregate, partial+final — TPC-H Q1 shape. Map-side partial agg
    * means the shuffle carries (flag,status) groups, not rows. */
  def q07AggTpchQ1(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        round(sum(col("l_quantity").cast("decimal(18,4)")).cast("double") / count(lit(1)), 4).as("avg_qty"),
        round(sum(col("l_discount").cast("decimal(18,4)")).cast("double") / count(lit(1)), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** Exact distinct aggregation (two-phase shuffle: expand on user_id, then
    * merge) — per event_type unique users. */
  def q08DistinctAgg(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("uniq_users"))

  /** Approximate distinct via HLL++ — the 100 TB answer to q08: one pass,
    * fixed-size sketch per group, no expand shuffle. The raw sketch form;
    * the registered entry is [[q09ApproxDistinctChecked]], which freezes
    * this output and puts the 5% error bound itself under the driver's
    * hash gate. */
  def q09ApproxDistinct(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"))

  /** Frozen-artifact location for sketch-check entries (q09/q37/q43 —
    * the [[graft.operators.Similarity.annArtifactPath]] pattern): each
    * engine-specific sketch ESTIMATE is frozen to parquet, and the DuckDB
    * twin recomputes the exact answer from the base tables plus the whole
    * error-bound algebra from the same frozen file. The sketch stays
    * engine-specific; the CHECK is hash-gated (r11 VERDICT task 1). */
  def sketchArtifactPath(d: String, which: String): String =
    s"/tmp/graft-sketch-$which/" + new java.io.File(d).getName

  private def freeze(df: DataFrame, path: String): DataFrame = {
    df.write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }

  /** Registered q09_approx_distinct entry — HASH-GREEN since r12: the HLL
    * estimates are frozen to parquet (the one engine-specific piece), and
    * the output joins them to the EXACT per-group distinct plus the 5%
    * relative-error verdict. The oracle recomputes the exact distinct from
    * events.parquet and the identical error algebra from the frozen file,
    * so the driver hash now gates the sketch's accuracy claim itself —
    * the rows-only declaration this entry carried through r11 is retired.
    * Scale shape unchanged: sketch + exact are each one pass; the join is
    * group-grain (5 rows). */
  def q09ApproxDistinctChecked(s: SparkSession, d: String): DataFrame = {
    val fz = freeze(q09ApproxDistinct(s, d), sketchArtifactPath(d, "q09"))
    val exact = events(s, d)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    fz.join(exact, Seq("event_type"))
      .select(col("event_type"), col("approx_users"), col("exact_users"),
        round(abs(col("approx_users").cast("double") - col("exact_users").cast("double"))
          / col("exact_users").cast("double"), 6).as("rel_err"))
      .withColumn("within_bound", (col("rel_err") <= lit(0.05)).cast("int"))
  }

  /** Grouping sets via ROLLUP: revenue by (nation, year), (nation), ().
    * Dim joins broadcast; one shuffle for the aggregate. */
  def q10Rollup(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .withColumn("order_year", year(col("o_orderdate")))
      .rollup(col("n_name"), col("order_year"))
      .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
      .select(col("n_name"), col("order_year"), col("revenue"), col("n_orders"))

  /** CUBE over events: all (event_type, year) combinations. */
  def q11Cube(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("event_year", year(col("ts")))
      .cube(col("event_type"), col("event_year"))
      .agg(count(lit(1)).as("n"), vsum(col("value")).as("total_value"))
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
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice").as("total"), col("rn"))
  }

  /** Window running aggregate: cumulative quantity per supplier in ship
    * order. The synthetic data contains duplicate (orderkey, linenumber)
    * pairs, so l_quantity joins the ORDER BY: rows that still tie then
    * carry equal quantities and contribute identical prefix sums — the
    * running values are deterministic in any engine. */
  def q13WindowRunning(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lineitem(s, d)
      .withColumn("running_qty", sum(col("l_quantity").cast("decimal(18,4)")).over(w).cast("double"))
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("running_qty"))
  }

  /** Sort + limit → TakeOrderedAndProject (per-partition top-k, merge on
    * driver — no global sort shuffle). Tie-broken on p_partkey. */
  def q14TopK(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
      .limit(10)
      .select(col("p_partkey"), col("p_name"), col("p_retailprice").as("price"))

  /** Set ops over (user, day) pairs: days a user both purchased and
    * clicked, minus days they hit an error — INTERSECT then EXCEPT (both
    * distinct-set semantics). Grain is (user_id, day) because every user
    * appears in every event_type in this data, so user-level sets would be
    * vacuously identical. */
  def q15SetOps(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    def slice(t: String) =
      ev.filter(col("event_type") === t).select(col("user_id"), col("day"))
    slice("purchase").intersect(slice("click")).except(slice("error"))
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
      .withColumn("order_month", date_format(col("o_orderdate"), "yyyy-MM"))
      .withColumn("priority_name", upper(substring(col("o_orderpriority"), 3, 20)))
      .groupBy(col("order_month"), col("priority_name"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))

  /** JSON functions: path extraction (get_json_object) AND schema-typed
    * parsing (from_json) of props.k — both must agree with the oracle's
    * json_extract. */
  def q18JsonFns(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_val"),
        from_json(col("props"), lit("k INT")).getField("k").as("k_typed"))

  /** Array functions over embeddings: size, first element, L2 norm.
    * All math in double (floats widen exactly) so oracle comparison is
    * stable after round(…, 3). */
  def q19ArrayFns(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        col("embedding").getItem(0).cast("double").as("first_val"),
        round(sqrt(graft.functions.VectorFunctions.dot(
          col("embedding").cast("array<double>"),
          col("embedding").cast("array<double>"))), 3).as("l2_norm"))

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

  /** Map-typed functions (SURVEY §2.4 "array/map fns", map half): parse
    * props into map<string,int> (dynamic keys — unlike q18's fixed-schema
    * struct), then map_keys / element_at / size over it, plus
    * map_from_entries + map_concat building a map from columns and reading
    * it back. sort_array (not array_sort) on the keys: same result, but
    * SortArray is a plain codegen expression while array_sort carries a
    * comparator lambda. */
  def q24MapFns(s: SparkSession, d: String): DataFrame = {
    val m = from_json(col("props"), org.apache.spark.sql.types.MapType(
      org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.IntegerType))
    val built = map_concat(
      map_from_entries(array(
        struct(lit("type").as("k"), col("event_type").as("v")),
        struct(lit("uid").as("k"), col("user_id").cast("string").as("v")))),
      map(lit("day"), date_format(col("ts"), "yyyy-MM-dd")))
    events(s, d)
      .select(col("event_id"), col("event_type"), col("user_id"), col("ts"),
        m.as("props_map"), built.as("built_map"))
      .select(
        col("event_id"),
        array_join(sort_array(map_keys(col("props_map"))), ",").as("keys_csv"),
        size(col("props_map")).as("n_keys"),
        element_at(col("props_map"), "k").as("k_val"),
        element_at(col("built_map"), "type").as("type_val"),
        element_at(col("built_map"), "uid").as("uid_val"),
        element_at(col("built_map"), "day").as("day_val"))
  }

  /** TPC-H Q3 twin: 3-way join (dim-broadcast customer, fact⋈fact
    * orders⋈lineitem), selective filters on both fact sides, top-10 orders
    * by revenue. Exercises Catalyst's join composition: the segment filter
    * prunes customers BEFORE the broadcast, both date filters push to the
    * scans, and the final top-k is TakeOrderedAndProject. */
  def q22ShippingPriority(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") > lit("1998-06-15").cast("timestamp"))
      .join(orders(s, d).filter(col("o_orderdate") < lit("1998-06-15").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer(s, d).filter(col("c_mktsegment") === "BUILDING")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .select(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("o_orderpriority"), col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)

  /** TPC-H Q5 twin: 6-table join — region→nation→customer broadcast chain
    * onto the orders⋈lineitem⋈supplier fact spine, with the Q5 twist that
    * the supplier must sit in the customer's nation. Local-supplier revenue
    * per nation for one region-year. */
  def q23LocalSupplierVolume(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier(s, d)),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))

  /** Tumbling-window aggregation core shared by the batch (q21) and
    * streaming forms: hourly event counts per type over (ts, event_type,
    * value). */
  def hourlyWindowAgg(df: DataFrame): DataFrame =
    df.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), vsum(col("value")).as("total_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n"), col("total_value"))

  /** Tumbling event-time window over the bounded events table. */
  def q21HourlyWindow(s: SparkSession, d: String): DataFrame =
    hourlyWindowAgg(events(s, d))

  /** Streaming-native form of q21 (SURVEY §2.4 row 14): the SAME
    * aggregation over an unbounded source with a 10-minute event-time
    * watermark, so state for closed windows is dropped and, in append
    * mode, each window is emitted exactly once when finalized. Agreement
    * with the batch form on a bounded replay is asserted in
    * StreamingWindowSpec. */
  def hourlyWindowStream(streamingEvents: DataFrame): DataFrame =
    hourlyWindowAgg(streamingEvents.withWatermark("ts", "10 minutes"))

  /** Sliding-window core shared by the batch (q25) and streaming forms:
    * 1-hour windows sliding every 30 minutes, so each event lands in
    * exactly duration/slide = 2 overlapping windows. Spark assigns windows
    * on the epoch-aligned 30-minute grid; the oracle reproduces that grid
    * with integer arithmetic on microseconds (same truncation as the
    * loader) and a 2-way UNION ALL. */
  def slidingWindowAgg(df: DataFrame): DataFrame =
    df.groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), vsum(col("value")).as("total_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n"), col("total_value"))

  /** Sliding event-time windows over the bounded events table. */
  def q25SlidingWindow(s: SparkSession, d: String): DataFrame =
    slidingWindowAgg(events(s, d))

  /** Streaming form of q25 (watermarked, append-mode-safe). */
  def slidingWindowStream(streamingEvents: DataFrame): DataFrame =
    slidingWindowAgg(streamingEvents.withWatermark("ts", "10 minutes"))

  /** Session-window core shared by the batch (q26) and streaming forms:
    * per-user sessions that close after a 10-minute event gap. Spark
    * splits when the gap is >= the duration (strictly-less merges); the
    * oracle's gaps-and-islands SQL uses `< INTERVAL 10 MINUTE` to match,
    * and both sides truncate ts to microseconds so boundary comparisons
    * see identical values. session_start is emitted at full microsecond
    * precision — it is the row identity for a (user, session). */
  def sessionWindowAgg(df: DataFrame): DataFrame =
    df.groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
        vsum(col("value")).as("total_value"))
      .select(col("user_id"), col("session_start"), col("n_events"), col("total_value"))

  /** Session windows (10-minute inactivity gap) per user. */
  def q26SessionWindow(s: SparkSession, d: String): DataFrame =
    sessionWindowAgg(events(s, d))

  /** Streaming form of q26: session windows need a watermark in append
    * mode — a session is emitted once the watermark passes its close. */
  def sessionWindowStream(streamingEvents: DataFrame): DataFrame =
    sessionWindowAgg(streamingEvents.withWatermark("ts", "10 minutes"))

  /** Inactivity gap that closes a session in [[q55Sessionize]] (30 min,
    * in integer microseconds). */
  val SessionGapUs = 1800L * 1000000L

  /** Gap-based sessionization with session features (q55_sessionize):
    * every user's event stream is cut into sessions at >30-minute
    * inactivity gaps and emitted at SESSION grain with a per-user session
    * INDEX, event count, duration, and the idle gap since the user's
    * previous session. [[q26SessionWindow]] aggregates sessions
    * anonymously ("what do sessions look like"); this LABELS them —
    * session_idx is the join key per-session feature pipelines and
    * engagement models need, and gap_us is the first such feature (it
    * spans sessions, which the windowed aggregate cannot see).
    *
    * Scale shape: one user_id exchange serves everything — the lag chain
    * and running session counter share one (user, ts) sort; the feature
    * window then runs over SESSION-grain rows (≤ sessions per user). All
    * arithmetic is integer microseconds (unix_micros vs the oracle's
    * epoch_ns//1000) — engine-portable to the digit; ties on ts are
    * ordered by event_id so the chain is total. First session's gap is
    * the -1 sentinel (NULL would need a nullable long on both sides). */
  def q55Sessionize(s: SparkSession, d: String): DataFrame = {
    val byTs = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val bySess = Window.partitionBy(col("user_id")).orderBy(col("session_idx"))
    events(s, d)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("prev_us", lag(col("us"), 1).over(byTs))
      .withColumn("new_sess", when(col("prev_us").isNull ||
        col("us") - col("prev_us") > SessionGapUs, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("new_sess")).over(
        byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
           min(col("us")).as("start_us"), max(col("us")).as("end_us"))
      .withColumn("gap_us", col("start_us") - lag(col("end_us"), 1).over(bySess))
      .select(col("user_id"), col("session_idx").cast("long").as("session_idx"),
        col("n_events"),
        (col("end_us") - col("start_us")).as("duration_us"),
        coalesce(col("gap_us"), lit(-1L)).as("gap_us"))
  }

  /** One emitted CLOSED session: `session_idx`-th session of the user,
    * with its event count, duration, and idle gap since the previous
    * session (-1 for the first) — the [[q55Sessionize]] row shape. */
  case class SessionClose(user_id: Long, session_idx: Long, n_events: Long,
                          duration_us: Long, gap_us: Long)

  /** Streaming sessionization: the incremental form of [[q55Sessionize]]
    * — per-user open-session state (index, start, last-event, count) in
    * `flatMapGroupsWithState`, emitting a session the moment a later
    * event proves it closed (arrival-driven close; a production job adds
    * an event-time timeout to flush the final open session — here the
    * open tail simply stays in state, and the equality spec accounts for
    * it). State per user is ONE 5-long tuple — O(1) at any event volume,
    * the funnelStream/retentionStream property. Under the ordered-replay
    * contract the emitted closed sessions equal the batch q55 rows minus
    * each user's final (still-open) session — SessionStreamSpec pins it. */
  def sessionizeStream(streamingEvents: DataFrame): org.apache.spark.sql.Dataset[SessionClose] = {
    import streamingEvents.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    streamingEvents.select(col("user_id").cast("long"), col("event_id").cast("long"),
        unix_micros(col("ts")).as("us"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[(Long, Long, Long)],
         state: GroupState[(Long, Long, Long, Long, Long)]) => {
          // state = (session_idx, start_us, end_us, n_events, prev_end_us)
          // — the open session plus the previous session's close (for the
          // gap feature; -1 = no previous session, matching batch q55)
          var st = state.getOption.orNull
          val out = Seq.newBuilder[SessionClose]
          rows.toSeq.sortBy(t => (t._3, t._2)).foreach { case (_, _, us) =>
            if (st == null) st = (1L, us, us, 1L, -1L)
            else if (us - st._3 > SessionGapUs) {
              out += SessionClose(user, st._1, st._4, st._3 - st._2,
                if (st._5 < 0L) -1L else st._2 - st._5)
              st = (st._1 + 1, us, us, 1L, st._3)
            } else st = (st._1, st._2, math.max(st._3, us), st._4 + 1, st._5)
          }
          if (st != null) state.update(st)
          out.result().iterator
        })
  }

  /** Exact percentiles (q28): median and p95 of event value per type.
    * Spark's `percentile` and DuckDB's `quantile_cont` both do linear
    * interpolation on the sorted values; rounding to 6 decimals absorbs
    * the last-ulp arithmetic differences. (percentile_approx is the scale
    * path — see q09's HLL precedent for why approx sketches are
    * engine-specific and get twinned, not oracled.)
    *
    * Scale honesty: exact `percentile` merges a distinct-value-sized
    * value→count buffer per GROUP on one executor — bounded here only by
    * the per-event-type value space. For a near-unique column at 100×,
    * the registered [[q28PercentilesScale]] twin runs
    * [[groupedEquidepthBounds]] (bounded per-group two-pass, same
    * output, same oracle); this entry keeps the single-agg form as the
    * reference the twin is hash-checked against. */
  def q28Percentiles(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("event_type"))
      .agg(
        round(percentile(col("value"), lit(0.5)), 6).as("p50"),
        round(percentile(col("value"), lit(0.95)), 6).as("p95"),
        count(lit(1)).as("n"))

  /** Grouping sets (q29) — the general form rollup/cube specialize; driven
    * through the SQL surface (GROUPING SETS has no DataFrame verb), which
    * also exercises spark.sql end-to-end. The 3 sets are per-nation,
    * per-year, and grand total; grouping() disambiguates real NULLs from
    * subtotal rows. */
  def q29GroupingSets(s: SparkSession, d: String): DataFrame = {
    // UUID per call: concurrent invocations on one session must not clobber
    // each other's view (VERDICT r03 §wrong-3; identityHashCode of this
    // singleton was a CONSTANT)
    val view = "gs_orders_" + java.util.UUID.randomUUID().toString.replace("-", "")
    orders(s, d)
      .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), year(col("o_orderdate")).as("order_year"),
        col("o_totalprice"))
      .createOrReplaceTempView(view)
    try s.sql( // analysis resolves the view eagerly → safe to drop after
      s"""SELECT n_name, order_year,
         |  CAST(grouping(n_name) AS INT) AS g_nation,
         |  CAST(grouping(order_year) AS INT) AS g_year,
         |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
         |FROM $view
         |GROUP BY GROUPING SETS ((n_name), (order_year), ())""".stripMargin)
    finally s.catalog.dropTempView(view)
  }

  /** Pivot (q30): revenue by nation pivoted over order years — wide-table
    * reshaping, the BI staple. Explicit pivot values keep the plan a single
    * pass (no distinct-values pre-query) and pin the output schema. */
  def q30Pivot(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), year(col("o_orderdate")).as("order_year"),
        col("o_totalprice"))
      .groupBy(col("n_name"))
      .pivot("order_year", Seq(1996, 1997, 1998))
      .agg(dsum(col("o_totalprice")))
      .select(col("n_name"), col("1996").as("y1996"),
        col("1997").as("y1997"), col("1998").as("y1998"))

  /** Streaming exact dedup: drop re-deliveries of the same event_id that
    * arrive within the watermark horizon — the streaming twin of
    * dedup_exact, and exactly the operator an at-least-once ingest (like
    * this library's own Kafka sink story) composes downstream to get
    * effective exactly-once. Dedup state is BOUNDED: ids older than the
    * watermark are evicted, so state holds one key per event inside the
    * horizon, not per event ever seen. */
  def dedupStream(streamingEvents: DataFrame): DataFrame =
    streamingEvents
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Left outer join + null-handling scalars (q33): every customer with
    * their order count and total — order-less customers survive the join
    * with count 0 and a coalesced zero total; nullif demonstrates the
    * inverse mapping. Completes the join family (inner/semi/anti/outer). */
  def q33OuterJoin(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        coalesce(dsum(col("o_totalprice")), lit(0.0)).as("total"))
      .select(col("c_custkey"), col("c_name"), col("n_orders"), col("total"),
        nullif(col("n_orders"), lit(0)).as("n_or_null"))

  /** Full outer join (q34): per-user purchase and click counts merged so
    * users present on either side survive with coalesced zeros. */
  def q34FullOuter(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val buys = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id").as("buy_uid")).agg(count(lit(1)).as("n_buys"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id").as("click_uid")).agg(count(lit(1)).as("n_clicks"))
    buys.join(clicks, col("buy_uid") === col("click_uid"), "full_outer")
      .select(
        coalesce(col("buy_uid"), col("click_uid")).as("user_id"),
        coalesce(col("n_buys"), lit(0L)).as("n_buys"),
        coalesce(col("n_clicks"), lit(0L)).as("n_clicks"))
  }

  /** Window-function suite (q35): lag/lead, ntile, percent_rank, and
    * first_value in one pass over each customer's orders — the analytic
    * functions q12/q13's rank/running-sum pair doesn't cover. One
    * partition read serves all five (single Sort + Window in the plan);
    * the (o_totalprice DESC, o_orderkey) order is total, so every engine
    * ranks identically. */
  def q35WindowSuite(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(s, d).select(
      col("o_custkey"), col("o_orderkey"),
      col("o_totalprice").cast("double").as("total"),
      lag(col("o_totalprice"), 1).over(w).cast("double").as("next_cheaper"),
      lead(col("o_totalprice"), 1).over(w).cast("double").as("next_pricier"),
      ntile(4).over(w).as("quartile"),
      round(percent_rank().over(w), 6).as("pct_rank"),
      first_value(col("o_orderkey")).over(w).as("top_order"))
  }

  /** Date arithmetic (q36): interval add, day difference, month-end, and
    * day-of-week bucketing over order dates — emitted as formatted strings
    * and ints so both engines compare exactly. */
  def q36DateFns(s: SparkSession, d: String): DataFrame =
    orders(s, d).select(
      col("o_orderkey"),
      date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd").as("ship_by"),
      datediff(lit("1998-12-31").cast("date"), col("o_orderdate")).as("days_to_eoy"),
      date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
      (dayofweek(col("o_orderdate")) - 1).as("dow"), // 0 = Sunday, both engines
      quarter(col("o_orderdate")).as("qtr"))

  /** Approximate percentiles: the sketch-based scale path for q28's exact
    * percentiles — at 100 TB an exact percentile needs a full sort per
    * group; percentile_approx streams one bounded sketch. Raw sketch form;
    * the registered entry is [[q37ApproxPercentileChecked]]. */
  def q37ApproxPercentile(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("event_type"))
      .agg(
        round(percentile_approx(col("value"), lit(0.5), lit(10000)), 6).as("p50_approx"),
        round(percentile_approx(col("value"), lit(0.95), lit(10000)), 6).as("p95_approx"))

  /** Registered q37_approx_percentile entry — HASH-GREEN since r12 (the
    * q09 pattern): the approx percentiles are frozen to parquet, then the
    * output carries each group's EXACT RANK ERROR — the distance from the
    * target quantile p to the true rank interval
    * [count(v < x)/n, count(v ≤ x)/n] of the frozen approximation x,
    * i.e. `max(lt/n − p, p − le/n, 0)` (the interval form is exact under
    * ties) — plus a within-bound verdict at 0.005, 50× looser than the
    * sketch's 1/10000 rank guarantee yet 100× tighter than eyeballing.
    * The oracle recomputes the rank counts from events.parquet and the
    * identical interval algebra from the frozen file. One broadcast join
    * + one map-side-combined conditional agg — no sort anywhere. */
  def q37ApproxPercentileChecked(s: SparkSession, d: String): DataFrame = {
    val fz = freeze(q37ApproxPercentile(s, d), sketchArtifactPath(d, "q37"))
    val n = col("n").cast("double")
    val ranks = events(s, d)
      .select(col("event_type"), col("value").cast("double").as("v"))
      .join(broadcast(fz), Seq("event_type"))
      .groupBy(col("event_type"), col("p50_approx"), col("p95_approx"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("v") <  col("p50_approx"), 1L).otherwise(0L)).as("lt50"),
        sum(when(col("v") <= col("p50_approx"), 1L).otherwise(0L)).as("le50"),
        sum(when(col("v") <  col("p95_approx"), 1L).otherwise(0L)).as("lt95"),
        sum(when(col("v") <= col("p95_approx"), 1L).otherwise(0L)).as("le95"))
      .select(col("event_type"), col("p50_approx"), col("p95_approx"),
        round(greatest(col("lt50").cast("double") / n - lit(0.5),
          lit(0.5) - col("le50").cast("double") / n, lit(0.0)), 6).as("rank_err_p50"),
        round(greatest(col("lt95").cast("double") / n - lit(0.95),
          lit(0.95) - col("le95").cast("double") / n, lit(0.0)), 6).as("rank_err_p95"))
    ranks.withColumn("within_bound",
      (col("rank_err_p50") <= lit(0.005) && col("rank_err_p95") <= lit(0.005)).cast("int"))
  }

  /** Scalar + correlated subqueries (q32), driven through the SQL surface:
    * customers above the global average balance (uncorrelated scalar
    * subquery → Catalyst plans one broadcast scalar), each with their
    * order count (correlated scalar subquery → de-correlated into an
    * outer-joined aggregate, not a per-row probe). */
  def q32ScalarSubquery(s: SparkSession, d: String): DataFrame = {
    // UUID-suffixed views for the same concurrency reason as q29
    val suffix = java.util.UUID.randomUUID().toString.replace("-", "")
    val cView = s"ssq_customer_$suffix"
    val oView = s"ssq_orders_$suffix"
    customer(s, d).createOrReplaceTempView(cView)
    orders(s, d).createOrReplaceTempView(oView)
    try s.sql( // analysis resolves the views eagerly → safe to drop after
      s"""SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS acctbal,
         |  (SELECT count(*) FROM $oView o
         |   WHERE o.o_custkey = c.c_custkey) AS n_orders
         |FROM $cView c
         |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM $cView)""".stripMargin)
    finally { s.catalog.dropTempView(cView); s.catalog.dropTempView(oView) }
  }

  /** As-of join (q27): for each 'purchase' event, the most recent strictly
    * prior 'click' by the same user. Spark has no ASOF JOIN operator; the
    * brief's preference order says compose existing ops first — and the
    * union + `last(..., ignoreNulls)` row-window IS the right composition:
    * both sides shuffle ONCE on user_id into one sort, versus a range join
    * that explodes to per-pair comparisons. Deterministic total order via
    * the unique event_id tie-breaker; timestamps compared and emitted at
    * microsecond precision on both engines. */
  def qAsofJoin(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events(s, d)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"), col("value"))
      .withColumn("click_ts", when(col("event_type") === "click", col("ts")))
      .withColumn("click_val", when(col("event_type") === "click", col("value")))
      .withColumn("prev_click_ts", last(col("click_ts"), ignoreNulls = true).over(w))
      .withColumn("prev_click_val", last(col("click_val"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(
        col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("purchase_ts"),
        date_format(col("prev_click_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("prev_click_ts"),
        col("prev_click_val").cast("double").as("prev_click_value"))
  }

  /** Point-in-time dimension join (pit_join): every order looks up the
    * customer-dimension VERSION that was valid on its order date — the
    * SCD2 read path (the warehouse pattern behind "what segment was this
    * customer in when they ordered"), completing the family:
    * [[qScd2Snapshot]] builds the versioned dimension, [[qAsofJoin]] is
    * the single-table as-of, this is the cross-table PIT lookup.
    *
    * Spark has no ASOF JOIN; the composition is the q27 union trick
    * generalized to two tables: version rows and fact rows union into ONE
    * (custkey, date) sort where `last(seg, ignoreNulls)` carries the
    * in-force version onto each fact row — both sides shuffle once on the
    * key, versus an interval join that explodes to per-(fact, version)
    * comparisons. A version effective ON the order date applies: dim rows
    * sort before fact rows at equal dates (is_fact tiebreak). The DuckDB
    * oracle uses its native ASOF JOIN — an INDEPENDENT algorithm, so the
    * hash match cross-checks the composition, not a shared plan.
    *
    * The versioned dimension is simulated deterministically (corpus_diff
    * convention): v0 for everyone from 1990, every 3rd customer re-versioned
    * mid-1995, every 9th again in 1997 — order dates (1992-1998) straddle
    * all three effectivities. */
  def qPitJoin(s: SparkSession, d: String): DataFrame = {
    val cust = customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
    def ver(pred: Column, eff: String, tag: String) =
      cust.filter(pred).select(col("c_custkey").as("ck"),
        to_date(lit(eff)).as("dt"),
        (if (tag.isEmpty) col("c_mktsegment")
         else concat(lit(tag), col("c_mktsegment"))).as("seg"),
        lit(null).cast("long").as("o_orderkey"), lit(0).as("is_fact"))
    val dims = ver(lit(true), "1990-01-01", "")
      .unionByName(ver(col("c_custkey") % 3 === 0, "1995-06-15", "V1:"))
      .unionByName(ver(col("c_custkey") % 9 === 0, "1997-03-01", "V2:"))
    val facts = orders(s, d).select(col("o_custkey").as("ck"),
      to_date(col("o_orderdate")).as("dt"), col("o_orderkey"))
    pitLookup(dims.drop("o_orderkey", "is_fact"), facts)
      .select(col("o_orderkey"), col("ck").as("o_custkey"),
        date_format(col("dt"), "yyyy-MM-dd").as("order_date"),
        col("seg_at").as("mktsegment_at_order"))
  }

  /** The PIT composition itself: `dims` is (ck, dt, seg) version rows,
    * `facts` is (ck, dt, o_orderkey); returns facts with `seg_at` — the
    * version in force at the fact date (effective-on-date applies; a fact
    * predating every version gets null). */
  def pitLookup(dims: DataFrame, facts: DataFrame): DataFrame = {
    val d2 = dims.select(col("ck"), col("dt"), col("seg"),
      lit(null).cast("long").as("o_orderkey"), lit(0).as("is_fact"))
    val f2 = facts.select(col("ck"), col("dt"),
      lit(null).cast("string").as("seg"), col("o_orderkey"), lit(1).as("is_fact"))
    val w = Window.partitionBy(col("ck"))
      .orderBy(col("dt"), col("is_fact"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d2.unionByName(f2)
      .withColumn("seg_at", last(col("seg"), ignoreNulls = true).over(w))
      .filter(col("is_fact") === 1)
  }

  /** Range (band) join (q40): lineitem rows land in quantity bands defined
    * by [lo, hi) intervals — the classic non-equi interval join. The band
    * table is a literal handful of rows, so the ONLY sane physical plan at
    * any scale is BroadcastNestedLoopJoin with the fact side streaming
    * unshuffled (Spark has no interval-tree join operator; for a LARGE
    * interval table the composition is bucketize-the-ranges → equi-join on
    * bucket + residual predicate — same shape as the LSH candidate joins).
    * Bands partition the domain, so the join is 1:1 and row counts are
    * preserved — asserted by the oracle's row compare. */
  def qRangeBandJoin(s: SparkSession, d: String): DataFrame = {
    val bands = Seq(
      (0.0, 10.0, "low"), (10.0, 25.0, "mid"),
      (25.0, 40.0, "high"), (40.0, 1e9, "bulk"))
    val bandDf = s.createDataFrame(bands).toDF("lo", "hi", "band")
    lineitem(s, d)
      .join(broadcast(bandDf),
        col("l_quantity") >= col("lo") && col("l_quantity") < col("hi"))
      .groupBy("band")
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("sum_qty"))
  }

  /** Mergeable distinct sketches (q43) — the re-aggregation story exact
    * and approx_count_distinct can't tell: at 100 TB a distinct count is
    * pre-aggregated at a fine grain (here: per event_type × day Apache
    * DataSketches HLL sketches via hll_sketch_agg) and ROLLED UP later by
    * unioning sketches (hll_union_agg), never rescanning the raw data.
    * HLL union is register-wise max, so merging per-day sketches yields
    * the IDENTICAL sketch (and estimate) the direct one-pass build gives —
    * asserted exactly in OperatorSpec, along with a 5% error bound vs the
    * true distinct count. Raw sketch form; the registered entry is
    * [[qHllMergeChecked]], which puts BOTH properties under the driver's
    * hash gate. */
  def qHllPartitionedDistinct(s: SparkSession, d: String): DataFrame =
    hllPartitionedDistinctFrom(events(s, d))

  /** [[qHllPartitionedDistinct]] over an explicit events frame — shared by
    * the registered entry and HllPurgeSpec's served-vs-direct comparisons
    * so both sides compute the rollup through literally the same plan. */
  def hllPartitionedDistinctFrom(ev: DataFrame): DataFrame =
    ev.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("merged_distinct"))
      .orderBy("event_type")

  /** Registered q43_hll_sketch_merge entry — HASH-GREEN since r12: the
    * per-day-merged estimate AND the direct one-pass estimate are frozen
    * together, then joined to the exact distinct. Output carries the two
    * estimates, the exact count, a merge==direct verdict (HLL union is
    * register-wise max, so rolling up per-day sketches must reproduce the
    * one-pass sketch exactly), the relative error, and the 5% bound
    * verdict. DuckDB recomputes the exact distinct from events.parquet and
    * every comparison/error expression from the frozen file — the two
    * properties OperatorSpec asserted since r3 are now driver-gated. */
  def qHllMergeChecked(s: SparkSession, d: String): DataFrame = {
    val direct = events(s, d)
      .groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("direct_distinct"))
    val fz = freeze(
      qHllPartitionedDistinct(s, d).join(direct, Seq("event_type")),
      sketchArtifactPath(d, "q43"))
    val exact = events(s, d)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    fz.join(exact, Seq("event_type"))
      .select(col("event_type"), col("merged_distinct"), col("direct_distinct"),
        col("exact_users"),
        (col("merged_distinct") === col("direct_distinct")).cast("int").as("merge_equal"),
        round(abs(col("merged_distinct").cast("double") - col("exact_users").cast("double"))
          / col("exact_users").cast("double"), 6).as("rel_err"))
      .withColumn("within_bound", (col("rel_err") <= lit(0.05)).cast("int"))
  }

  // -------------------------------------------------------------------
  // Streamed HLL serving state + RTBF purge (r17, VERDICT r16 task 5a)
  // -------------------------------------------------------------------
  // q43's mergeability story made streamable: per-micro-batch HLL
  // partials at the (event_type, day) grain, served by register-wise-max
  // union — which composes EXACTLY under arbitrary batch splits, so the
  // served rollup equals a direct whole-corpus pass (HllPurgeSpec pins
  // it exactly, the OverlapStreamSpec contract). This closes the last
  // declared-rebuild RTBF row: HLL is non-linear (a register max cannot
  // subtract a departed user), so purge re-sketches — but at CELL grain,
  // never corpus grain: only (event_type, day) cells that actually lost
  // a user rebuild from their live events; untouched cells keep their
  // partials, which already equal a live-rows rebuild. Namespace / epoch
  // discipline is the overlapPurgeSink contract verbatim: purge/ + ts/
  // epochs disjoint from the foreachBatch sk/batch allocator, replay
  // idempotent by overwrite, later epoch wins by max-epoch fold, cutoff
  // defaults to 0 when no ingest batch exists yet (ADVICE r16).

  /** foreachBatch sink: sketch THIS micro-batch's events at the q43 cell
    * grain and overwrite the per-batch partial (a retried micro-batch
    * replaces its own file, never double-counts — harmless here anyway,
    * union is idempotent, but the idempotence contract stays uniform
    * across every serving sink). Per-batch state is cells × one sketch. */
  def hllSketchSink(statePath: String)(batch: DataFrame, id: Long): Unit =
    batch.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .write.mode("overwrite").parquet(s"$statePath/sk/batch=$id")

  /** RTBF purge for the streamed HLL state: re-sketch the AFFECTED cells
    * from their live events (caller-supplied — at scale, a scan of those
    * cells' partitions only) under `purge/epoch=<id>`, and tombstone
    * (event_type, day, cutoff) under `ts/epoch=<id>`. `affectedCells` is
    * kept separate from the live events so a cell whose every event was
    * purged still gets its tombstone (it has no rebuilt sketch and so
    * vanishes from the served rollup, exactly as a rebuild would have
    * it). Cutoff 0 when no ingest batch exists yet. */
  def hllPurgeSink(s: SparkSession, statePath: String, epochId: Long)(
      liveAffectedEvents: DataFrame, affectedCells: DataFrame): Unit = {
    val skDir = s"$statePath/sk"
    val cutoff =
      if (!StatePath.exists(s, skDir)) 0L
      else {
        val row = s.read.parquet(skDir)
          .agg(max(col("batch").cast("long"))).collect()(0)
        if (row.isNullAt(0)) 0L else row.getLong(0) + 1L
      }
    liveAffectedEvents
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .write.mode("overwrite").parquet(s"$statePath/purge/epoch=$epochId")
    affectedCells
      .select(col("event_type"), col("day").cast("date").as("day"))
      .withColumn("cutoff", lit(cutoff))
      .write.mode("overwrite").parquet(s"$statePath/ts/epoch=$epochId")
  }

  /** Serve the q43 rollup from a [[hllSketchSink]] state directory: fold
    * each cell's partials (tombstoned cells: the winning max-epoch
    * rebuilt sketch plus only cutoff-or-later ingest partials), union per
    * cell, then roll up per event_type — identical to
    * [[hllPartitionedDistinctFrom]] over the live corpus because HLL
    * union is register-wise max. The tombstone table is cells-sized →
    * broadcast. */
  def hllServeFromState(s: SparkSession, statePath: String): DataFrame = {
    val skDir = s"$statePath/sk"
    val parts =
      if (StatePath.exists(s, skDir))
        s.read.parquet(skDir)
          .select(col("event_type"), col("day"), col("sk"),
            col("batch").cast("long").as("batch"))
      else {
        import org.apache.spark.sql.types._
        s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(StructField("event_type", StringType),
            StructField("day", DateType), StructField("sk", BinaryType),
            StructField("batch", LongType))))
      }
    val tsDir = s"$statePath/ts"
    val folded =
      if (!StatePath.exists(s, tsDir)) parts.select(col("event_type"), col("day"), col("sk"))
      else {
        val win = s.read.parquet(tsDir)
          .groupBy(col("event_type"), col("day"))
          .agg(max(struct(col("epoch").cast("long").as("epoch"),
            col("cutoff").as("cutoff"))).as("w"))
          .select(col("event_type"), col("day"),
            col("w.epoch").as("win_epoch"), col("w.cutoff").as("cutoff"))
        val liveParts = parts
          .join(broadcast(win), Seq("event_type", "day"), "left")
          .filter(col("cutoff").isNull || col("batch") >= col("cutoff"))
          .select(col("event_type"), col("day"), col("sk"))
        val rebuilt = s.read.parquet(s"$statePath/purge")
          .select(col("event_type"), col("day"), col("sk"),
            col("epoch").cast("long").as("epoch"))
          .as("r")
          .join(broadcast(win.as("t")),
            col("r.event_type") === col("t.event_type") &&
              col("r.day") === col("t.day") &&
              col("r.epoch") === col("t.win_epoch"))
          .select(col("r.event_type").as("event_type"),
            col("r.day").as("day"), col("r.sk").as("sk"))
        liveParts.unionByName(rebuilt)
      }
    folded
      .groupBy(col("event_type"), col("day"))
      .agg(hll_union_agg(col("sk")).as("sk"))
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("merged_distinct"))
      .orderBy("event_type")
  }

  /** Bucketized range join (q42) — the scale composition q40's scaladoc
    * names, built: when the interval table is too large to broadcast, a
    * BroadcastNestedLoopJoin is unavailable and a raw non-equi join
    * degenerates to a cartesian product. The standard fix maps each
    * interval to every fixed-width bucket it overlaps (explode — bounded
    * by interval_width/bucket_width rows per interval), each point to its
    * single bucket, equi-joins on the bucket key, and re-checks the exact
    * [lo, hi) predicate as a residual filter. One hash shuffle on the
    * bucket key, no broadcast, no NLJ — the LSH candidate-join shape
    * applied to intervals. A point lives in exactly one bucket, so no
    * DISTINCT is needed. Overlapping intervals (width 3, step 1) prove
    * the multi-match semantics; the oracle is the plain range join. */
  def qRangeJoinBucketed(s: SparkSession, d: String): DataFrame = {
    val w = 4.0
    val bands = s.range(0, 60).select(
      col("id").cast("int").as("band_id"),
      col("id").cast("double").as("lo"),
      (col("id") + 3).cast("double").as("hi"))
    val bandBuckets = bands.select(col("band_id"), col("lo"), col("hi"),
      explode(sequence(
        floor(col("lo") / w).cast("int"),
        floor((col("hi") - lit(0.001)) / w).cast("int"))).as("bucket"))
    lineitem(s, d)
      .select(col("l_quantity"), floor(col("l_quantity") / w).cast("int").as("bucket"))
      .join(bandBuckets, Seq("bucket"))
      .filter(col("l_quantity") >= col("lo") && col("l_quantity") < col("hi"))
      .groupBy("band_id")
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("sum_qty"))
  }

  /** Unpivot / melt (q41): the wide per-part price/size columns rotate
    * into (attribute, value) rows — Spark's `unpivot`, DuckDB's UNPIVOT.
    * Pure per-row restructuring: zero shuffle before the final agg. */
  def qUnpivot(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .select(col("p_partkey"),
        col("p_retailprice").cast("double").as("retailprice"),
        col("p_size").cast("double").as("size"))
      .unpivot(
        Array(col("p_partkey")),
        Array(col("retailprice"), col("size")),
        "attribute", "value")
      .groupBy("attribute")
      .agg(
        count(lit(1)).as("n"),
        round(avg(col("value")), 4).as("avg_value"),
        round(max(col("value")), 4).as("max_value"))

  /** Fixed-width composite ordering key for arg-max/arg-min determinism:
    * the money value snapped to its exact decimal(18,4) grid (both engines
    * render that scale identically), zero-padded so lexicographic order =
    * numeric order for the non-negative domain, then a unique tie-breaker.
    * DuckDB's max_by can't order by a struct, so the composite key is the
    * portable encoding of ORDER BY (value, key). */
  private[operators] def ordKey(value: Column, tieBreak: Column): Column = concat(
    // width 19 is EXACT for decimal(18,4): 14 integer digits + '.' + 4
    // fractional — no in-domain value can exceed it (out-of-domain values
    // overflow the decimal cast to NULL rather than truncate); width 20
    // covers every non-negative Long tie-break (19 digits max), because
    // Spark's lpad TRUNCATES over-width input, which would silently break
    // the lexicographic==numeric guarantee
    lpad(nonNegOrFail(value, "value").cast("decimal(18,4)").cast("string"), 19, "0"),
    lit("|"),
    lpad(nonNegOrFail(tieBreak, "tie-break").cast("string"), 20, "0"))

  /** The non-negative domain is a hard precondition of [[ordKey]]: a '-'
    * sign under zero-padding sorts ABOVE every digit, so a signed input
    * would silently yield arbitrary max_by/min_by winners. Guard it at
    * runtime — misuse fails the job loudly instead of corrupting order. */
  private def nonNegOrFail(c: Column, what: String): Column =
    when(c < 0, raise_error(concat(
      lit(s"ordKey: negative $what breaks lexicographic==numeric order: "),
      c.cast("string")))).otherwise(c)

  /** Arg-max / arg-min (q44): per customer, the order ids carrying the
    * highest and lowest total price. `max_by`/`min_by` replace the rank-1
    * window form with a single partial-aggregating pass — no per-partition
    * sort, one grouping shuffle of (key, current-best) pairs, which is the
    * shape that survives 100 TB (the window form would sort every
    * partition of the fact table first). */
  def q44MinMaxBy(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .withColumn("ord_key", ordKey(col("o_totalprice"), col("o_orderkey")))
      .groupBy(col("o_custkey"))
      .agg(
        max_by(col("o_orderkey"), col("ord_key")).as("biggest_order"),
        min_by(col("o_orderkey"), col("ord_key")).as("smallest_order"),
        dsum(col("o_totalprice")).as("total_spend"),
        count(lit(1)).as("n_orders"))

  /** Statistical aggregate suite (q45): correlation, sample covariance /
    * stddev / variance, and least-squares regression of extended price on
    * quantity, per return flag. All are one-pass mergeable co-moment
    * aggregates (partial per partition, merged at the final agg) — the
    * same partial+final shape as sum/count, so they scale identically.
    * Outputs are rounded well above the ~1e-9 relative merge-order float
    * noise so the hash compare is stable across engines/partitionings. */
  def q45StatsAgg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("qty_price_corr"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("qty_price_covar"),
        round(stddev_samp(col("l_discount")), 6).as("disc_stddev"),
        round(var_samp(col("l_quantity")), 4).as("qty_var"),
        round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4).as("price_per_qty"),
        round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 2).as("price_intercept"),
        count(lit(1)).as("n"))

  /** Equi-width histogram + cumulative counts (q46): events.value lands in
    * width-25 buckets (floor division — no UDF, stays in codegen), counted
    * and summed per bucket, then a running total over the bucket axis.
    * The unpartitioned window runs over the ~20-row AGGREGATED result,
    * not the fact table, so the single-partition window is free. */
  def q46Histogram(s: SparkSession, d: String): DataFrame = {
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .groupBy(floor(col("value") / 25).cast("int").as("bucket"))
      .agg(count(lit(1)).as("n"), vsum(col("value")).as("sum_value"))
      .withColumn("cum_n", sum(col("n")).over(w))
  }

  /** Interval join (q47): each purchase matched to every click by the
    * same user within the 10 minutes before it. Planned as an EQUI-join
    * on user_id with the time band as a residual filter — one hash
    * shuffle of each side, no nested loop, no broadcast needed: the
    * scalable form of an event-correlation join. (Compare q40, where the
    * non-equi side is a broadcast-able handful of bands.) Timestamps are
    * compared and emitted at microsecond precision on both engines. */
  def q47IntervalJoin(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
    val c = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("c_ts"))
    p.join(c, Seq("user_id"))
      .filter(col("c_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES") &&
        col("c_ts") <= col("p_ts"))
      .select(
        col("purchase_id"), col("click_id"), col("user_id"),
        date_format(col("p_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("purchase_ts"),
        date_format(col("c_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("click_ts"))
  }

  /** Batch twin of [[intervalJoinStream]] over the 4-column replay schema
    * (ts, event_type, value, user_id) used by the streaming agreement
    * test — same join, minus the event_id the replay fixture lacks. */
  def intervalJoinBatch(events: DataFrame): DataFrame = {
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value").as("p_value"))
    val c = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    p.join(c, col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES") &&
        col("c_ts") <= col("p_ts"))
      .select(col("p_user").as("user_id"), col("p_ts"), col("c_ts"), col("p_value"))
  }

  /** Stream-stream interval join: the streaming form of q47. Both sides
    * carry a watermark so Spark bounds the join state — a buffered click
    * can be dropped once the purchase-side watermark passes beyond its
    * 10-minute relevance window; without the watermark the state grows
    * forever. Inner join in append mode emits each match exactly once.
    * StreamingWindowSpec proves the emitted set equals
    * [[intervalJoinBatch]] over the same bounded replay. */
  def intervalJoinStream(streamingEvents: DataFrame): DataFrame = {
    val p = streamingEvents.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value").as("p_value"))
      .withWatermark("p_ts", "30 minutes")
    val c = streamingEvents.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "30 minutes")
    p.join(c, expr(
        "p_user = c_user AND c_ts >= p_ts - INTERVAL 10 MINUTES AND c_ts <= p_ts"))
      .select(col("p_user").as("user_id"), col("p_ts"), col("c_ts"), col("p_value"))
  }

  /** Trailing-interval window (q48): per customer, order count and spend
    * over the 30 days up to and including each order — a RANGE frame over
    * event time, the time-series form q13's ROWS frame cannot express
    * (ROWS counts physical neighbors; RANGE bounds a VALUE interval, so
    * same-day ties all join the frame and calendar gaps shrink it).
    * Spark range frames need a numeric ordering key → epoch seconds.
    * Same one-shuffle-per-key + per-partition-sort shape as q13. */
  def q48RangeFrame(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("epoch_s"))
      .rangeBetween(-30L * 86400, 0)
    orders(s, d)
      .withColumn("epoch_s", unix_timestamp(col("o_orderdate")))
      .select(
        col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        count(lit(1)).over(w).as("n_orders_30d"),
        sum(col("o_totalprice").cast("decimal(18,4)")).over(w)
          .cast("double").as("spend_30d"))
  }

  /** Ingest anomaly monitor (ingest_anomaly): daily event counts scored
    * against their own trailing week — z = (n − µ₇)/σ₇ over a RANGE frame
    * of the 7 PRIOR days (current day excluded, so a spike can't mask
    * itself) — the statistical alarm a pipeline-observability stack rings
    * when a feed doubles or dries up. Completes the monitoring family:
    * `Dataset.observe` surfaces per-batch metrics, [[Audit.qDqAudit]]
    * checks invariants, this watches the TREND.
    *
    * Scale shape: the corpus-sized work is one map-side-combined daily
    * count; the scoring window runs over DATE-grain rows (a few thousand
    * for years of data — the documented tiny-aggregate exception for an
    * unpartitioned window). z is engine-portable: µ and σ round to 4 dp
    * before the division, and days with σ undefined (first two) emit
    * null. */
  def qIngestAnomaly(s: SparkSession, d: String): DataFrame =
    ingestAnomaly(events(s, d)
      .select(datediff(to_date(col("ts")), to_date(lit("1970-01-01"))).cast("long").as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("n_events")))

  /** See [[qIngestAnomaly]]; takes the (day, n_events) daily frame so
    * tests can plant spikes/droughts and assert the flags. */
  def ingestAnomaly(daily: DataFrame): DataFrame = {
    val w = Window.orderBy(col("day")).rangeBetween(-7, -1)
    daily
      .withColumn("mu", round(avg(col("n_events")).over(w), 4))
      .withColumn("sigma", round(stddev_samp(col("n_events")).over(w), 4))
      .withColumn("z",
        when(col("sigma").isNotNull && col("sigma") > 0,
          round((col("n_events") - col("mu")) / col("sigma"), 4)))
      .select(col("day"), col("n_events"), col("mu"), col("sigma"), col("z"),
        (col("z").isNotNull && abs(col("z")) >= 2.0).as("flagged"))
  }

  /** Resample + forward-fill (q49): per-user purchase values land on a
    * daily grid spanning that user's observed range (sequence + explode —
    * generated on executors, never the driver), missing days left-join to
    * null and forward-fill from the most recent observed day via the
    * IGNORE-NULLS running window (same kernel as the as-of join q27).
    * The pandas `resample().ffill()` idiom as a distributed plan: grid
    * size is bounded by keys × span, shuffles once on user_id. */
  def q49ResampleFfill(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(vsum(col("value")).as("day_value"))
    val grid = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"), expr("INTERVAL 1 DAY"))).as("day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("user_id", "day"), "left")
      .select(
        col("user_id"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("day_value").isNotNull.as("observed"),
        last(col("day_value"), ignoreNulls = true).over(w).as("filled_value"))
  }

  /** Lateral join (q50): for each customer, their top-2 orders by price —
    * the SQL LATERAL form of q12's window. Catalyst DECORRELATES the
    * per-row correlated subquery (with its ORDER BY + LIMIT) into a
    * window-rank plan over one join, so the "run a query per outer row"
    * surface costs one shuffle, not |customer| probes — the property that
    * makes LATERAL usable at all at scale. */
  def q50Lateral(s: SparkSession, d: String): DataFrame = {
    val suffix = java.util.UUID.randomUUID().toString.replace("-", "")
    val cView = s"lat_customer_$suffix"
    val oView = s"lat_orders_$suffix"
    customer(s, d).createOrReplaceTempView(cView)
    orders(s, d).createOrReplaceTempView(oView)
    try s.sql( // analysis resolves the views eagerly → safe to drop after
      s"""SELECT c_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) AS total
         |FROM $cView c,
         |LATERAL (SELECT o_orderkey, o_totalprice FROM $oView o
         |         WHERE o.o_custkey = c.c_custkey
         |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t""".stripMargin)
    finally { s.catalog.dropTempView(cView); s.catalog.dropTempView(oView) }
  }

  /** Per-group top-k via the custom bounded-heap Aggregator (q51): the
    * same answer as q12's window rank, computed as a partial+final
    * aggregation carrying ≤k pairs per group instead of sorting every
    * group's rows — see [[graft.functions.TopKByValue]] for the scale
    * argument. Oracle: q12's SQL (identical output contract), plus an
    * OperatorSpec row-for-row agreement test against q12 itself. */
  def q51TopKAgg(s: SparkSession, d: String): DataFrame = {
    val topK = graft.functions.TopKByValue.topK(3)
    orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(topK(col("o_totalprice"), col("o_orderkey")).as("top"))
      .select(col("o_custkey"), posexplode(col("top")).as(Seq("pos", "r")))
      .select(
        col("o_custkey"),
        col("r.key").as("o_orderkey"),
        col("r.value").as("total"),
        (col("pos") + 1).cast("int").as("rn"))
  }

  /** Semi-structured VariantType path (q52): event props parsed ONCE into
    * Spark 4's binary variant encoding, fields then extracted by path
    * with typed casts — the modern replacement for per-field
    * `get_json_object` re-parsing (q18): one parse per row, shredded
    * binary storage, and each `variant_get` is a cheap path walk instead
    * of a string scan. Output types are pinned (int/string) so the
    * DuckDB JSON-function oracle compares exactly. */
  def q52Variant(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("v", parse_json(col("props")))
      .select(
        col("event_id"),
        expr("try_variant_get(v, '$.k', 'int')").as("k_val"),
        expr("try_variant_get(v, '$.k', 'string')").as("k_str"),
        expr("try_variant_get(v, '$.missing', 'int')").as("missing_val"))

  /** Stream-static enrichment join: the streaming event feed joined to a
    * static (batch) dimension. The static side is broadcast, so the
    * UNBOUNDED side never shuffles and no join state accumulates — the
    * third point of the streaming-join triangle next to the watermarked
    * stream-stream join ([[intervalJoinStream]]) and the stateful
    * control/data union (BatchTracker). Left join keeps events whose key
    * is missing from the dimension (enrichment must never drop facts). */
  def enrichStream(streamingEvents: DataFrame, staticDim: DataFrame): DataFrame =
    streamingEvents.join(broadcast(staticDim), Seq("user_id"), "left")

  /** SCD2 temporal snapshot (scd2_snapshot): the purchase stream read as a
    * per-user changelog and compacted into slowly-changing-dimension rows:
    * each change opens [valid_from, valid_to) closed by the user's next
    * change; the open-ended interval is flagged current. One shuffle on
    * user_id + a per-partition sort — the standard CDC compaction shape,
    * and exactly the plan a MERGE-based SCD2 build would produce. */
  def qScd2Snapshot(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("valid_to_ts", lead(col("ts"), 1).over(w))
      .select(
        col("user_id"), col("event_id"),
        col("value").cast("double").as("attr_value"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("valid_from"),
        coalesce(
          date_format(col("valid_to_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"),
          lit("9999-12-31 00:00:00.000000")).as("valid_to"),
        col("valid_to_ts").isNull.as("is_current"))
  }

  /** Exact interpolated quantile boundaries with BOUNDED memory — the
    * two-pass refinement that replaces a single exact `percentile` agg
    * (whose final merge buffers a distinct-value-sized map on ONE
    * executor: fine at sf0.1, an OOM at 100× over a near-unique column).
    *
    * Pass 1: an order-preserving linear map puts every value into one of
    * `coarse` fixed-width cells; the per-cell counts are a map-side-
    * combined agg over ≤`coarse` keys, and the cumulative counts (a tiny
    * window over ≤`coarse` rows) locate, for each target quantile, the
    * global sorted ranks floor(r) and floor(r)+1 — which cell they fall
    * in and the within-cell offset.
    * Pass 2: only rows in those ≤2·(nBuckets-1) boundary cells are rank-
    * numbered (a windowed sort partitioned by cell — an external sort
    * that SPILLS, never an in-memory map) and the two order statistics
    * per quantile are picked by (cell, rank) against the ≤18-row broadcast
    * need-list. Interpolation then mirrors Spark's `Percentile.
    * getPercentile` arithmetic exactly — r = pct · (n−1);
    * (⌊r⌋+1−r)·vLo + (r−⌊r⌋)·vHi, value itself when r is integral — so
    * the result is bit-identical to the single-agg form (EquidepthSpec
    * pins this) and the DuckDB `quantile_cont` oracle stays hash-green.
    *
    * Memory bound: no operator state exceeds `coarse` counter cells; the
    * pass-2 sort covers ~n·(2·nBuckets−2)/coarse rows and spills. At
    * 100 TB pick coarse ≈ n / 10⁶ to keep boundary cells around a
    * million rows — the counts agg is still tiny.
    *
    * Returns one row per interior boundary: (i, bound). */
  def equidepthBounds(vals: DataFrame, nBuckets: Int = 10,
                      coarse: Int = 8192): DataFrame =
    groupedEquidepthBounds(vals.withColumn("grp", lit(0)),
      (1 until nBuckets).map(i => (i, i.toDouble / nBuckets)), coarse)
      .drop("grp")

  /** Per-GROUP form of the bounded two-pass refinement (the general
    * implementation [[equidepthBounds]] delegates to with a constant
    * group): exact interpolated quantiles of `x` within every `grp`,
    * with the same memory story — the per-(group, cell) count agg is
    * map-side combined over ≤ groups·coarse keys, every window is
    * partitioned (cumulative counts over ≤coarse rows per group; rank
    * selection over boundary-cell rows only, an external sort that
    * spills), and nothing ever buffers a distinct-value map. This is
    * what replaces per-group exact `percentile` (whose final merge holds
    * one value→count map PER GROUP on one executor — q28's honesty note)
    * when group value spaces are near-unique at scale.
    *
    * `pcts` is (id, fraction) so callers control both the quantiles and
    * the output labels. Returns (grp, i, bound). */
  def groupedEquidepthBounds(vals: DataFrame, pcts: Seq[(Int, Double)],
                             coarse: Int = 8192): DataFrame = {
    val s  = vals.sparkSession
    val mm = vals.groupBy(col("grp")).agg(min(col("x")).as("lo"),
      max(col("x")).as("hi"), count(lit(1)).as("n"))
    // order-preserving coarse cell id (monotone in x within each group;
    // exactness of the linear map is irrelevant — only monotonicity +
    // bounded key range)
    val cb = when(col("hi") === col("lo"), lit(0)).otherwise(
      least(floor((col("x") - col("lo")) / (col("hi") - col("lo")) * coarse),
        lit(coarse - 1))).cast("int")
    val cells  = vals.join(broadcast(mm), Seq("grp"))
      .select(col("grp"), col("x"), cb.as("cb"))
    val counts = cells.groupBy(col("grp"), col("cb")).agg(count(lit(1)).as("cnt"))
    val wCum   = Window.partitionBy(col("grp")).orderBy(col("cb"))
      .rowsBetween(Window.unboundedPreceding, -1)  // ≤`coarse` rows per group
    val cum = counts.select(col("grp"), col("cb"), col("cnt"),
      coalesce(sum(col("cnt")).over(wCum), lit(0L)).as("below"))
    // pct literals built in Scala Double division — the same arithmetic
    // Percentile uses for `percentage * (count - 1)`
    import s.implicits._
    val needs = pcts.toDF("i", "pct")
      .crossJoin(mm.select(col("grp"), col("n")))  // |pcts| × groups rows
      .select(col("grp"), col("i"),
        (col("pct") * (col("n") - 1).cast("double")).as("r"), col("n"))
      .select(col("grp"), col("i"), col("r"),
        floor(col("r")).cast("long").as("kLo"),
        least(floor(col("r")) + 1, col("n") - 1).cast("long").as("kHi"))
    val ranks = needs.select(col("grp"), col("i"), col("r"), explode(array(
        struct(lit("lo").as("which"), col("kLo").as("k")),
        struct(lit("hi").as("which"), col("kHi").as("k")))).as("e"))
      .select(col("grp"), col("i"), col("r"),
        col("e.which").as("which"), col("e.k").as("k"))
    // locate each needed within-group rank: its cell + 1-based cell rank.
    // ranks is bounded (|pcts| × groups × 2 rows) — broadcast EXPLICITLY:
    // the range predicate makes this a nested-loop join, and when the
    // `vals` input has no size statistics (an in-memory score frame
    // rather than a parquet scan) the planner would otherwise fall back
    // to a CartesianProduct (caught by PlanLintSpec on
    // curation_state_report, r10).
    val located = broadcast(ranks).join(cum.withColumnRenamed("grp", "g2"),
        col("grp") === col("g2") &&
          col("k") >= col("below") && col("k") < col("below") + col("cnt"))
      .select(col("grp"), col("i"), col("r"), col("which"), col("cb"),
        (col("k") - col("below") + 1).as("rk"))
    val neededCells = located.select(col("grp"), col("cb")).distinct()
    val wRank = Window.partitionBy(col("grp"), col("cb")).orderBy(col("x"))
    val picked = cells.join(broadcast(neededCells), Seq("grp", "cb"))
      .withColumn("rk", row_number().over(wRank).cast("long"))
      .join(broadcast(located), Seq("grp", "cb", "rk"))
      .groupBy(col("grp"), col("i"), col("r"))
      .agg(max(when(col("which") === "lo", col("x"))).as("vLo"),
           max(when(col("which") === "hi", col("x"))).as("vHi"))
    picked.select(col("grp"), col("i"),
      when(col("r") === floor(col("r")), col("vLo")).otherwise(
        (floor(col("r")) + lit(1.0) - col("r")) * col("vLo") +
          (col("r") - floor(col("r"))) * col("vHi")).as("bound"))
  }

  /** q28's exact percentiles via [[groupedEquidepthBounds]]
    * (q28_percentiles_scale): identical output to [[q28Percentiles]] —
    * it shares q28's DuckDB oracle, so the driver hash match IS the
    * bounded-form == single-agg equivalence proof — with no per-group
    * distinct-value buffer anywhere in the plan. This retires the last
    * exact-`percentile` aggregate from the registered scale paths. */
  def q28PercentilesScale(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .select(col("event_type").as("grp"), col("value").as("x"))
    val bounds = groupedEquidepthBounds(ev, Seq(1 -> 0.5, 2 -> 0.95))
    val n = ev.groupBy(col("grp")).agg(count(lit(1)).as("n"))
    bounds.groupBy(col("grp"))
      .agg(round(max(when(col("i") === 1, col("bound"))), 6).as("p50"),
           round(max(when(col("i") === 2, col("bound"))), 6).as("p95"))
      .join(n, Seq("grp"))
      .select(col("grp").as("event_type"), col("p50"), col("p95"), col("n"))
  }

  /** [[equidepthBounds]] gathered into the 1-row broadcastable array
    * shape (`bs`) bucket assignment wants — a bounded nBuckets−1-element
    * collect. */
  def equidepthBoundsArray(vals: DataFrame, nBuckets: Int = 10,
                           coarse: Int = 8192): DataFrame =
    equidepthBounds(vals, nBuckets, coarse)
      .agg(array_sort(collect_list(struct(col("i"), col("bound")))).as("a"))
      .select(transform(col("a"), e => e.getField("bound")).as("bs"))

  /** Equi-depth histogram (equidepth_hist): ten same-population buckets
    * of lineitem prices bounded by the EXACT interpolated deciles — the
    * optimizer-statistics shape (selectivity estimation wants equal-mass
    * buckets; [[q46Histogram]] is the fixed-WIDTH complement). Bucket id
    * = how many decile boundaries the value has passed, computed as a
    * conditional sum against the broadcast 1-row boundary agg — the
    * zorder_key bounds pattern: no driver collect, and the assignment
    * compares doubles both engines derived identically (exact
    * interpolation over the same inputs, q28 precedent), so the oracle
    * matches bucket-for-bucket.
    *
    * Scale shape: the deciles come from [[equidepthBounds]]'s bounded
    * two-pass refinement (no distinct-value-sized aggregation buffer
    * anywhere — the r8 VERDICT defect), then one broadcast cross join
    * and a 10-key map-side-combined count agg. */
  def qEquidepthHist(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d).select(col("l_extendedprice").as("x"))
    val bounds = equidepthBoundsArray(li)
    val bucket = (1 to 9)
      .map(i => when(col("x") >= element_at(col("bs"), i), 1).otherwise(0))
      .reduce(_ + _)
    li.crossJoin(broadcast(bounds))
      .select(col("x"), bucket.cast("int").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), min(col("x")).as("lo"), max(col("x")).as("hi"))
  }

  /** Fixed evaluation predicates for [[qSelectivityEstimate]]: price
    * ranges spanning wide, medium, narrow, and out-of-range shapes. */
  val SelPredicates: Seq[(Int, Double, Double)] = Seq(
    (1, 0.0, 10000.0), (2, 10000.0, 30000.0), (3, 30000.0, 60000.0),
    (4, 45000.0, 47000.0), (5, 60000.0, 200000.0))

  /** Histogram-based cardinality estimation (selectivity_estimate) — what
    * equi-depth statistics are FOR: for each range predicate over
    * lineitem prices, the estimated row count from [[qEquidepthHist]]'s
    * decile boundaries (linear interpolation within the boundary bucket —
    * the textbook equi-depth estimator every cost-based optimizer runs)
    * next to the ACTUAL count and the absolute error as a fraction of the
    * table. The error column is the operator's point: it measures the
    * statistics' fitness, the number a stats-refresh policy watches.
    *
    * CDF(v) = (j + clamp((v − L_j)/(U_j − L_j))) / 10 with j = boundaries
    * passed, edges from the broadcast 1-row (bounds, min/max/count) frames
    * — per-row scalar arithmetic both engines derive identically from
    * hash-matched boundary values. Scale shape: the bounded two-pass
    * boundary refinement + two broadcast 1-row frames + one 5-key
    * conditional count agg; nothing buffers value maps. */
  def qSelectivityEstimate(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d).select(col("l_extendedprice").cast("double").as("x"))
    val bounds = equidepthBoundsArray(li)
    val stats = li.agg(min(col("x")).as("mn"), max(col("x")).as("mx"),
      count(lit(1)).as("n"))
    import s.implicits._
    val preds = SelPredicates.toDF("pred_id", "lo", "hi")
    def passed(v: String) = least(lit(9), (1 to 9)
      .map(i => when(col(v) >= element_at(col("bs"), i), 1).otherwise(0))
      .reduce(_ + _))
    def cdf(j: String, v: String): Column = {
      val lEdge = when(col(j) === 0, col("mn")).otherwise(expr(s"element_at(bs, $j)"))
      val uEdge = when(col(j) === 9, col("mx")).otherwise(expr(s"element_at(bs, $j + 1)"))
      val frac = when(uEdge > lEdge,
        least(lit(1.0), greatest(lit(0.0), (col(v) - lEdge) / (uEdge - lEdge))))
        .otherwise(when(col(v) >= lEdge, lit(1.0)).otherwise(lit(0.0)))
      (col(j).cast("double") + frac) / lit(10.0)
    }
    val est = preds.crossJoin(broadcast(bounds)).crossJoin(broadcast(stats))
      .select(col("pred_id"), col("lo"), col("hi"), col("bs"), col("mn"), col("mx"),
        col("n"), passed("lo").as("jlo"), passed("hi").as("jhi"))
      .select(col("pred_id"), col("lo"), col("hi"), col("n"),
        round(col("n") * (cdf("jhi", "hi") - cdf("jlo", "lo")), 2).as("est_rows"))
    val actual = li.crossJoin(broadcast(preds))
      .filter(col("x") >= col("lo") && col("x") < col("hi"))
      .groupBy(col("pred_id")).agg(count(lit(1)).as("actual_rows"))
    est.join(actual, Seq("pred_id"), "left")
      .select(col("pred_id"), col("lo"), col("hi"), col("est_rows"),
        coalesce(col("actual_rows"), lit(0L)).as("actual_rows"),
        round(abs(col("est_rows") - coalesce(col("actual_rows"), lit(0L)).cast("double"))
          / col("n").cast("double"), 6).as("abs_err_frac"))
  }

  /** Incremental rollup maintenance (rollup_incremental): the nightly-ETL
    * pattern — a served aggregate (revenue by order-year × priority) is
    * maintained as MERGEABLE partials instead of recomputed from source.
    * The state table carries closed years already aggregated; a fresh
    * load contributes only its own year's partial; serving re-aggregates
    * the union — sums of decimal sums, so merged == direct recompute
    * exactly (the oracle runs the direct form; the Spark side runs the
    * split-and-merge path, making the equivalence the thing the driver
    * hash-checks). Same mergeability family as q43 (HLL distinct) and
    * embedding_centroids (decimal means), here for the plain-additive
    * case that powers most dashboards.
    *
    * Scale shape: the historical partial is year×priority-grain (tiny,
    * read not recomputed in a real deployment); only the fresh year scans
    * fact rows; the merge agg moves dimension-grain rows only. */
  def qRollupIncremental(s: SparkSession, d: String): DataFrame =
    rollupIncremental(orders(s, d), split = 1996)

  /** See [[qRollupIncremental]]; the split year is the state/fresh
    * boundary — the output is split-invariant (RelationalSpec pins it). */
  def rollupIncremental(ord: DataFrame, split: Int): DataFrame = {
    val o = ord.select(
      year(col("o_orderdate")).as("order_year"), col("o_orderpriority"),
      col("o_totalprice").cast("decimal(18,4)").as("rev"), col("o_orderkey"))
    def partial(df: DataFrame) = df.groupBy(col("order_year"), col("o_orderpriority"))
      .agg(sum(col("rev")).as("revenue"), count(lit(1)).as("n_orders"))
    val state = partial(o.filter(col("order_year") < split))   // closed years: pre-agg state
    val fresh = partial(o.filter(col("order_year") >= split))  // new load's partial
    state.unionByName(fresh)
      .groupBy(col("order_year"), col("o_orderpriority"))
      .agg(sum(col("revenue")).as("rev2"), sum(col("n_orders")).as("n2"))
      .select(col("order_year"), col("o_orderpriority"),
        col("rev2").cast("decimal(18,4)").cast("double").as("revenue"),
        col("n2").cast("long").as("n_orders"))
  }

  /** Corpus snapshot diff (corpus_diff): the audit a corpus refresh runs
    * between two fingerprint snapshots — which documents were added,
    * removed, changed (same id, different content hash), or untouched.
    * The companion to [[qScd2Snapshot]]: SCD2 compacts a CHANGELOG into
    * validity intervals; the diff derives the changelog when all you
    * have is two materialized snapshots (the common case for a crawl
    * refresh). The "next" snapshot here is a deterministic simulation
    * over the same table (every 11th id removed, every 7th edited, every
    * 13th re-added under a new id) so the op is self-contained and
    * oracle-exact; [[corpusDiff]] takes any two (doc_id, source, fp)
    * frames.
    *
    * Scale shape: ONE full-outer hash join on doc_id — the minimal
    * shuffle a two-snapshot diff can pay; with both snapshots stored in
    * the same id-bucketed layout ([[graft.operators.Layout]]) even that
    * exchange disappears into a co-partitioned join. Nothing else moves;
    * status is a per-row case over the joined fingerprints. */
  def qCorpusDiff(s: SparkSession, d: String): DataFrame = {
    val f = documents(s, d).select(col("doc_id"), col("source"),
      md5(TextOps.normText(col("text")).cast("binary")).as("fp"))
    val kept = f.filter(col("doc_id") % 11 =!= 0)
      .select(col("doc_id"), col("source"),
        when(col("doc_id") % 7 === 0,
          md5(concat(col("fp"), lit(":v2")).cast("binary")))
          .otherwise(col("fp")).as("fp"))
    val added = f.filter(col("doc_id") % 13 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("source"),
        md5(concat(col("fp"), lit(":new")).cast("binary")).as("fp"))
    corpusDiff(f, kept.unionByName(added))
  }

  /** See [[qCorpusDiff]]; `oldSnap`/`newSnap` are (doc_id, source, fp). */
  def corpusDiff(oldSnap: DataFrame, newSnap: DataFrame): DataFrame =
    oldSnap.as("o")
      .join(newSnap.as("n"), col("o.doc_id") === col("n.doc_id"), "full_outer")
      .select(
        coalesce(col("o.doc_id"), col("n.doc_id")).as("doc_id"),
        coalesce(col("o.source"), col("n.source")).as("source"),
        when(col("o.doc_id").isNull, "added")
          .when(col("n.doc_id").isNull, "removed")
          .when(col("o.fp") =!= col("n.fp"), "changed")
          .otherwise("unchanged").as("status"),
        coalesce(col("o.fp"), lit("")).as("old_fp"),
        coalesce(col("n.fp"), lit("")).as("new_fp"))

  /** CDC MERGE application (merge_apply): apply a versioned changelog of
    * upserts and delete tombstones to a base snapshot — the highest
    * version per key wins, and a winning tombstone removes the row. The
    * write side of the CDC triangle this engine already covers:
    * [[qScd2Snapshot]] compacts a changelog into validity intervals,
    * [[qCorpusDiff]] derives a changelog from two snapshots, and this
    * MATERIALIZES the next snapshot — the operation every table-format
    * MERGE (upsert compaction) runs per ingest cycle, expressed
    * engine-agnostically as union + per-key argmax.
    *
    * The registered entry simulates the changelog deterministically over
    * the documents fingerprint snapshot (corpus_diff convention): every
    * 7th id updated at v1, every 11th tombstoned at v2, every 13th id
    * inserted fresh at v1, every 21st updated AGAIN at v3 — so
    * last-writer-wins is exercised through update→update chains and
    * update→delete races (id % 77: the v2 tombstone beats the v1
    * update; id % 231: the v3 update resurrects past the tombstone).
    *
    * Scale shape: one union + one doc_id-keyed `max_by` agg — a single
    * key shuffle, map-side combined (each partition keeps one winner per
    * key before the exchange); a changelog is normally a fraction of the
    * base, and a base bucketed by doc_id (BucketingSpec) makes its side
    * exchange-free. Determinism: versions are unique per key by
    * construction, and max_by orders by the bare integer version. */
  def qMergeApply(s: SparkSession, d: String): DataFrame =
    mergeApply(mergeBase(documents(s, d)), simulatedChangelog(documents(s, d)))

  /** The v0 fingerprint snapshot [[qMergeApply]] merges onto. */
  def mergeBase(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"),
      md5(TextOps.normText(col("text")).cast("binary")).as("fp"),
      lit(0L).as("version"), lit("upsert").as("op"))

  /** [[qMergeApply]]'s deterministic changelog simulation, exposed so the
    * streaming twin (CdcStreamSpec) can replay the SAME changelog in
    * chunks through the log sink. */
  def simulatedChangelog(docs: DataFrame): DataFrame = {
    val base = mergeBase(docs)
    def bump(tag: String, version: Long) =
      Seq(md5(concat(col("fp"), lit(tag)).cast("binary")).as("fp"),
        lit(version).as("version"), lit("upsert").as("op"))
    val u1  = base.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id") +: col("source") +: bump(":v1", 1L): _*)
    val del = base.filter(col("doc_id") % 11 === 0)
      .select(col("doc_id"), col("source"), lit("").as("fp"),
        lit(2L).as("version"), lit("delete").as("op"))
    val ins = base.filter(col("doc_id") % 13 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id") +: col("source") +: bump(":new", 1L): _*)
    val u2  = base.filter(col("doc_id") % 21 === 0)
      .select(col("doc_id") +: col("source") +: bump(":v2", 3L): _*)
    Seq(u1, del, ins, u2).reduce(_.unionByName(_))
  }

  /** Streaming CDC ingest — the log half of [[mergeApply]]'s lifecycle: a
    * `foreachBatch` sink appends each micro-batch of changelog rows under
    * a `batch=<id>` directory (retried batches overwrite their own
    * directory — the bm25IndexSink idempotence pattern), and
    * [[mergeServeFromLog]] serves the current snapshot by merging base +
    * accumulated log ON READ. Ingest never rewrites history; checkpointed
    * snapshot materialization and log compaction are separate maintenance
    * jobs ([[Layout.compact]] — layout-agnostic serve proven for the BM25
    * log in Bm25StreamSpec). */
  def cdcLogSink(logPath: String)(batch: DataFrame, id: Long): Unit =
    batch.write.mode("overwrite").parquet(s"$logPath/batch=$id")

  /** See [[cdcLogSink]]. */
  def mergeServeFromLog(s: SparkSession, base: DataFrame, logPath: String): DataFrame =
    mergeApply(base, s.read.parquet(logPath).drop("batch"))

  /** See [[qMergeApply]]; both frames are (doc_id, source, fp, version,
    * op) with op ∈ {upsert, delete} and versions unique per key. */
  def mergeApply(base: DataFrame, changelog: DataFrame): DataFrame =
    base.unionByName(changelog)
      .groupBy(col("doc_id"))
      .agg(max_by(struct(col("source"), col("fp"), col("op")), col("version")).as("w"),
           max(col("version")).as("version"))
      .filter(col("w.op") =!= "delete")
      .select(col("doc_id"), col("w.source").as("source"),
        col("w.fp").as("fp"), col("version"))

  /** Ordered funnel analysis (view → click → purchase): per step, the
    * users who completed the step sequence IN ORDER — each stage keeps a
    * user only if a step-k event exists STRICTLY after their first
    * completion of step k-1 (first-touch attribution; ties at identical
    * micros don't advance the funnel, identically in the oracle). The
    * product-analytics classic the events table exists for.
    *
    * Scale shape ([[funnelSingleScan]]): ONE scan of events (step filter
    * pushed down) and ONE user_id exchange; the per-user stage machine
    * folds inside each partition and everything after it is
    * dimension-sized (≤K rows). The K-stage relational form
    * ([[funnel]]) is kept as the equality reference — it scans events K
    * times, which at 100 TB is K full passes (VERDICT r6 task 5). */
  def qFunnel(s: SparkSession, d: String): DataFrame =
    funnelSingleScan(events(s, d), Seq("view", "click", "purchase"))

  /** Single-scan funnel: the batch form of [[funnelStream]]'s per-user
    * stage machine. Events are shuffled once by user_id (groupByKey);
    * each user's step-typed events arrive as a PRE-SORTED streaming
    * iterator (`flatMapSortedGroups` — Spark sorts within the exchange's
    * partitions, so no per-user buffer is materialized even for a
    * pathological hot user) and fold greedily — earliest strict-after
    * chain, the same semantics the min-join chain computes. Per-user
    * final stages then roll up to the K-row funnel with exchanges that
    * carry at most one row per (partition, stage). Equality with
    * [[funnel]] is asserted in OperatorSpec on both the crafted
    * order-sensitivity set and the sf0.001 events table. */
  def funnelSingleScan(events: DataFrame, steps: Seq[String]): DataFrame = {
    val session = events.sparkSession
    import session.implicits._
    val stepOf = steps.zipWithIndex.toMap
    val nSteps = steps.length
    val finals = events
      .select(col("user_id").cast("long"), col("event_type"), col("ts"))
      .filter(col("event_type").isin(steps: _*))
      // a null user_id would crash the non-nullable Long encoder; the
      // relational form would count such rows at stage 1 and then drop
      // them (null never equi-joins into stage 2+) — neither behavior is
      // a funnel, so null users are excluded explicitly here
      .filter(col("user_id").isNotNull)
      .as[(Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      // ts is TimestampType: the sort compares full micros internally
      // (a manual getTime sort would truncate them — funnelStream's
      // (millis, nanos) pair exists for exactly that reason)
      .flatMapSortedGroups(col("ts")) { (user: Long, rows: Iterator[(Long, String, java.sql.Timestamp)]) =>
        var k = 0
        var tk: java.sql.Timestamp = null
        rows.foreach { case (_, et, ts) =>
          if (k < nSteps && stepOf.get(et).contains(k) && (k == 0 || ts.after(tk))) {
            k += 1; tk = ts
          }
        }
        Iterator.single((user, k))
      }.toDF("user_id", "final_stage")
    val byStage = finals.filter(col("final_stage") > 0)
      .groupBy(col("final_stage")).agg(count(lit(1)).as("n")) // ≤ K rows
    val stepRows = steps.zipWithIndex
      .map { case (st, i) => (i.toLong, st) }.toDF("step_idx", "step")
    // K×K broadcast-NLJ over dimension-sized frames: step s counts every
    // user whose final stage reached s+1
    stepRows.join(byStage, col("final_stage") >= col("step_idx") + 1, "left")
      .groupBy(col("step_idx"), col("step"))
      .agg(coalesce(sum(col("n")), lit(0L)).as("users"))
  }

  /** K-stage relational funnel — see [[qFunnel]]; `steps` is the ordered
    * event-type sequence. Reference form for [[funnelSingleScan]]. */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame =
    funnelStageTimes(events, steps).zipWithIndex.map { case (stage, i) =>
      stage.agg(count(lit(1)).as("users"))
        .select(lit(i.toLong).as("step_idx"), lit(steps(i)).as("step"), col("users"))
    }.reduce(_.unionAll(_))

  /** Per-user first-completion time of each funnel stage — the `funnel`
    * chain's intermediate frames, exposed for [[qFunnelLatency]]. Stage 0
    * is the first entry-step event; stage k the first step-k event
    * STRICTLY after the user's stage-(k−1) completion. */
  def funnelStageTimes(events: DataFrame, steps: Seq[String]): Seq[DataFrame] = {
    val e = events.select(col("user_id"), col("event_type"), col("ts"))
    steps.tail.scanLeft(
      e.filter(col("event_type") === steps.head)
        .groupBy(col("user_id")).agg(min(col("ts")).as("t"))) { (prev, step) =>
      e.filter(col("event_type") === step)
        .join(prev.withColumnRenamed("t", "t_prev"), "user_id")
        .filter(col("ts") > col("t_prev"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t"))
    }
  }

  /** Funnel step latency (funnel_latency): for each consecutive step pair,
    * how many users converted and the MEDIAN time it took — the "where do
    * users stall" companion to [[qFunnel]]'s "where do they drop". The
    * median is exact and computed by [[groupedEquidepthBounds]] (the
    * bounded per-group two-pass), not a per-group `percentile` aggregate —
    * per-user conversion gaps are near-unique, exactly the buffer shape
    * the refinement exists to avoid. Gaps are integer microseconds widened
    * to double (exact to 2^53), so the oracle's `quantile_cont` matches to
    * the bit. */
  def qFunnelLatency(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val steps = Seq("view", "click", "purchase")
    val stepOf = steps.zipWithIndex.toMap
    val nSteps = steps.length
    // Single-scan stage times (opt r17, guide §2.4 + §8): the K-scan
    // relational chain ([[funnelStageTimes]]) embeds stage k−1's subtree
    // in stage k, and the per-pair gap join references each stage twice —
    // events ended up scanned ~7× and exchanged per stage. The greedy
    // per-user fold below is [[funnelSingleScan]]'s machine extended to
    // RECORD each completion time: ONE events scan, ONE user_id exchange,
    // and gaps fall out in place. Identical semantics by the same
    // greedy-exchange argument (earliest strict-after chain == the
    // min-join chain; equality vs the relational form pinned in
    // OperatorSpec). tm = unix_micros(ts) IS TimestampType's internal
    // micros value, so ordering, strict-after ties, and the emitted
    // double gaps are bit-identical to the old unix_micros arithmetic.
    // Measured same-JVM at sf0.1: 2.49 s → 1.13 s, output identical.
    // localCheckpoint: gaps are ≤ users×(K−1) rows and read twice
    // (median refinement + counts).
    val gaps = events(s, d)
      .select(col("user_id").cast("long"), col("event_type"),
        unix_micros(col("ts")).as("tm"))
      .filter(col("event_type").isin(steps: _*))
      // Null user_id AND null ts are excluded explicitly (ADVICE r17): the
      // old relational min/join form silently ignored null-ts events; the
      // typed tuple below would instead crash encoding a null into the
      // non-nullable Long `tm`. Same rationale as funnelSingleScan.
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("tm")) { (_: Long, rows: Iterator[(Long, String, Long)]) =>
        val times = new Array[Long](nSteps)
        var k = 0
        rows.foreach { case (_, et, tm) =>
          if (k < nSteps && stepOf.get(et).contains(k) && (k == 0 || tm > times(k - 1))) {
            times(k) = tm; k += 1
          }
        }
        (1 until k).iterator.map(i => (i, (times(i) - times(i - 1)).toDouble))
      }.toDF("grp", "x")
      .transform(Ckpt.local(_, Ckpt.CorpusSized))
    val med = groupedEquidepthBounds(gaps, Seq(1 -> 0.5))
    val counts = gaps.groupBy(col("grp")).agg(count(lit(1)).as("n_users"))
    val pairName = (1 until steps.length)
      .map(k => (k, s"${steps(k - 1)}->${steps(k)}"))
      .foldLeft(lit(null).cast("string")) { case (acc, (k, name)) =>
        when(col("grp") === k, name).otherwise(acc)
      }
    med.join(counts, Seq("grp"))
      .select(pairName.as("step_pair"), col("n_users"),
        col("bound").as("median_gap_us"))
  }

  /** One emitted funnel advance: `stage` steps are now complete for the
    * user (1-based count), at event time `ts`. */
  case class FunnelAdvance(user_id: Long, stage: Int, ts: java.sql.Timestamp)

  /** Streaming funnel: the incremental form of [[qFunnel]] — per-user
    * stage progression maintained in `flatMapGroupsWithState`, emitting an
    * update whenever a user advances a step. State per user is one
    * (completed-steps, last-completion-ts) pair — O(1) regardless of
    * event volume, the property that lets a live funnel dashboard run on
    * the ingest stream instead of nightly batch.
    *
    * Semantics match the batch funnel's greedy earliest chain when each
    * user's events are observed in event-time order (rows are sorted
    * within every micro-batch; cross-batch order is the replay's
    * responsibility — same contract as [[Curation.sequencePackStream]]'s
    * ordered replay, asserted in StreamingWindowSpec). Strict `>` on the
    * previous completion keeps tie-stall behavior identical to batch. */
  def funnelStream(streamingEvents: DataFrame, steps: Seq[String]): org.apache.spark.sql.Dataset[FunnelAdvance] = {
    import streamingEvents.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val stepOf = steps.zipWithIndex.toMap
    streamingEvents.select(col("user_id").cast("long"), col("event_type"), col("ts"))
      .as[(Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[(Long, String, java.sql.Timestamp)],
         state: GroupState[(Int, java.sql.Timestamp)]) => {
          // stage-0 sentinel stays in-memory only: tk is never read at
          // k == 0, and persisting it would crash the state encoder —
          // Timestamp(Long.MinValue) normalizes nanos by wrapping getTime
          // past Long.MaxValue, and millisToMicros(multiplyExact) then
          // overflows. State is written only once a user has advanced.
          var (k, tk) = state.getOption.getOrElse((0, new java.sql.Timestamp(Long.MinValue)))
          val out = Seq.newBuilder[FunnelAdvance]
          // sort by (millis, nanos): getTime alone truncates to millis and
          // would scramble sub-millisecond orderings within a batch
          rows.toSeq.sortBy(t => (t._3.getTime, t._3.getNanos)).foreach { case (_, et, ts) =>
            if (k < steps.length && stepOf.get(et).contains(k) && (k == 0 || ts.after(tk))) {
              k += 1; tk = ts
              out += FunnelAdvance(user, k, ts)
            }
          }
          if (k > 0) state.update((k, tk))
          out.result().iterator
        })
  }

  /** Weekly cohort retention — the other product-analytics classic: users
    * grouped by first-seen week (the cohort), counted as retained in each
    * subsequent week they were active. Week offsets are exact integer
    * arithmetic (both weeks are Monday-truncated, so the day gap is a
    * multiple of 7 — `div` is lossless and engine-portable).
    *
    * Scale shape: one user-keyed min agg for the cohort, one join back on
    * user_id (the funnel's partitioning, reused), then a distinct +
    * count over (cohort, offset, user) — all partial-aggregable; the
    * output is cohorts × offsets, dimension-sized. */
  /** One emitted retention advance: the user was active in a new week —
    * `week_offset` whole weeks after their cohort's Monday. */
  case class RetentionAdvance(user_id: Long, cohort_week: String, week_offset: Long)

  /** Streaming retention: the incremental form of [[q54Retention]] —
    * per-user (cohort Monday, last-emitted offset) maintained in
    * `flatMapGroupsWithState`, emitting one advance the first time a user
    * is seen in each new week. State per user is one (date-string, long)
    * pair — O(1) regardless of event volume (the funnelStream pattern;
    * VERDICT r6 task 7): under the ordered-replay contract a user's week
    * offsets arrive nondecreasing, so deduplicating against the LAST
    * emitted offset is enough — no per-user set of seen weeks. Counting
    * advances per (cohort_week, week_offset) equals the batch retention
    * triangle, asserted in StreamingWindowSpec. Week truncation matches
    * `date_trunc("week", ts)`: Monday in the session (JVM-default)
    * timezone. */
  def retentionStream(streamingEvents: DataFrame): org.apache.spark.sql.Dataset[RetentionAdvance] = {
    import streamingEvents.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    // week truncation must match the batch q54Retention's
    // date_trunc("week", ts), which works in the SESSION timezone — NOT
    // the executor JVM's default (toLocalDateTime would use the latter;
    // they differ on any non-UTC JVM and shift Sunday-night events a week)
    val zone = java.time.ZoneId.of(
      streamingEvents.sparkSession.sessionState.conf.sessionLocalTimeZone)
    def mondayOf(ts: java.sql.Timestamp): java.time.LocalDate =
      ts.toInstant.atZone(zone).toLocalDate.`with`(
        java.time.temporal.TemporalAdjusters.previousOrSame(java.time.DayOfWeek.MONDAY))
    streamingEvents.select(col("user_id").cast("long"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp)],
         state: GroupState[(String, Long)]) => {
          var st = state.getOption.orNull
          val out = Seq.newBuilder[RetentionAdvance]
          rows.toSeq.sortBy(t => (t._2.getTime, t._2.getNanos)).foreach { case (_, ts) =>
            val wk = mondayOf(ts)
            if (st == null) {
              st = (wk.toString, 0L)
              out += RetentionAdvance(user, st._1, 0L)
            } else {
              val off = java.time.temporal.ChronoUnit.DAYS.between(
                java.time.LocalDate.parse(st._1), wk) / 7
              if (off != st._2) {
                st = (st._1, off)
                out += RetentionAdvance(user, st._1, off)
              }
            }
          }
          if (st != null) state.update(st)
          out.result().iterator
        })
  }

  def q54Retention(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
    val first = e.groupBy(col("user_id")).agg(min(col("wk")).as("cohort"))
    e.join(first, "user_id")
      .select(col("user_id"), col("cohort"),
        expr("datediff(wk, cohort) div 7").as("week_offset"))
      .distinct()
      .groupBy(col("cohort"), col("week_offset"))
      .agg(count(lit(1)).as("users"))
      .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"), col("users"))
  }
}
