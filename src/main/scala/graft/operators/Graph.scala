package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over relationship tables — the iterative-algorithm
  * family (Pregel-style message passing expressed as join + aggregate
  * rounds) that complements the single-pass connected-components labeling
  * in [[Dedup.qDedupClusters]].
  *
  * Scale design (the part that has to survive 1000 executors / 100 TB of
  * edges): each PageRank iteration is exactly ONE shuffle of the
  * node-grain rank frame into the edge partitioning plus ONE map-side-
  * combinable aggregation of contributions. The edge list — the only
  * data-sized frame — is hash-partitioned by `src` ONCE and persisted, so
  * every iteration's `edges ⋈ ranks` reuses that layout and only the small
  * node-grain side moves. Nothing doc/edge-sized ever crosses the network
  * more than once per iteration, and the per-iteration lineage is cut by
  * the persisted edge table (3 rounds here; a deep-iteration caller would
  * checkpoint every ~10 rounds).
  *
  * Determinism (the part that makes an iterative float algorithm
  * oracle-checkable): ranks are integer micro-units ([[PrScale]] = 1e12),
  * every division is integral (`div` in Spark, `//` in DuckDB — identical
  * on non-negative operands), and sums run over longs, so the fixpoint
  * arithmetic is bit-exact and order-invariant across engines — no float
  * accumulation whose reduction order could differ. The damping update is
  * `(15·r0) div 100 + (85·inflow) div 100` applied in the SAME operation
  * order on both sides.
  */
object Graph {

  /** Rank mass scale: 1 rank unit = 1e-12 of the total graph mass. */
  val PrScale = 1000000000000L

  /** Fixed iteration count — mirrored by the unrolled CTE chain in the
    * DuckDB oracle ([[graft.SparkEntry.oracleSql]] `pagerank`). */
  val PrIters = 3

  /** PageRank over the customer–supplier order graph: an edge links a
    * customer to every supplier that ever shipped them a line item
    * (orders ⋈ lineitem, distinct). Node ids are namespaced into one key
    * space (customer → 2k, supplier → 2k+1). The graph is treated as
    * undirected (symmetric edges), which also guarantees no dangling
    * nodes: every node in the edge list has out-degree ≥ 1, so no
    * lost-mass redistribution term is needed. */
  def qPageRank(s: SparkSession, d: String): DataFrame = {
    val ol = orders(s, d)
      .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    pageRank(ol, PrIters)
  }

  /** Integer-exact PageRank (damping 0.85) over an undirected edge list
    * `(src, dst)`; emits `(node, pr)` with pr in [[PrScale]] micro-units.
    * The only driver-side value is the scalar node count N (one number,
    * the [[Layout]]-min/max precedent) — needed because the per-node base
    * mass (1−d)/N is a constant of the recurrence, not data. */
  def pageRank(undirected: DataFrame, iters: Int): DataFrame = {
    val s = undirected.sparkSession
    val sym = undirected.select(col("src"), col("dst"))
    // symmetrize, then fix the edge partitioning every iteration reuses
    val edges = sym
      .union(sym.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(col("src"))
      .persist()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .select(col("src").as("node"), col("outdeg"))
      .persist()
    val n = deg.count() // bounded driver scalar: node count
    require(n > 0, "pageRank: empty edge list")
    val r0 = PrScale / n
    val base = (15L * r0) / 100L
    var ranks = deg.select(col("node"), col("outdeg"), lit(r0).as("pr"))
    for (_ <- 1 to iters) {
      val inflow = edges
        .join(ranks, edges("src") === ranks("node"))
        .select(col("dst"), expr("pr div outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("inflow"))
      // re-alias deg's columns: ranks descends from deg, so joining deg
      // again without fresh attribute ids is an ambiguous self-join
      ranks = inflow
        .join(deg.select(col("node").as("dnode"), col("outdeg").as("doutdeg")),
          col("dst") === col("dnode"))
        .select(col("dnode").as("node"), col("doutdeg").as("outdeg"),
          (lit(base) + expr("(85 * inflow) div 100")).as("pr"))
    }
    ranks.select(col("node"), col("pr"))
  }
}
