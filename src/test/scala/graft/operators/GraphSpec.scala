package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamFixture.spark

/** PageRank invariants the oracle's value-compare can't express: the
  * hand-computed recurrence on a tiny graph, mass conservation under
  * integer truncation, and the degree-ordering sanity of the result. */
class GraphSpec extends AnyFunSuite {

  val d = "/root/testdata/sf0.001"

  private def path3(iters: Int) = {
    import spark.implicits._
    Graph.pageRank(Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("pagerank reproduces the hand-computed integer recurrence on a 3-node path") {
    // undirected path 1-2-3: deg = (1,2,1), N = 3
    // r0 = 1e12/3 = 333333333333; base = (15*r0)/100 = 49999999999
    // inflow(1) = inflow(3) = r0/2 = 166666666666; inflow(2) = 2*r0
    // pr1(ends) = base + (85*166666666666)/100 = 49999999999 + 141666666666
    // pr1(mid)  = base + (85*666666666666)/100 = 49999999999 + 566666666666
    val got = path3(1)
    assert(got(1L) == 191666666665L)
    assert(got(3L) == 191666666665L)
    assert(got(2L) == 616666666665L)
  }

  test("pagerank conserves mass up to integer truncation and keeps all nodes") {
    val out = Graph.qPageRank(spark, d).collect()
    val nodes = out.map(_.getLong(0))
    assert(nodes.distinct.length == nodes.length, "one row per node")
    out.foreach(r => assert(r.getLong(1) > 0, s"rank must stay positive: $r"))
    // truncation budget: r0 loses < N at init; each round, a node's outflow
    // pr - outdeg*(pr div outdeg) loses < outdeg (so < E over the graph),
    // and the two div-100 damping terms lose < 2 per node. Mass only
    // drifts DOWN from PrScale, bounded by N + iters*(E + 2N).
    val total = out.map(_.getLong(1)).sum
    val n = out.length.toLong
    val ol = graft.Tables.orders(spark, d)
      .join(graft.Tables.lineitem(spark, d), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_suppkey")).distinct().count()
    val e = 2L * ol // symmetrized edge count
    assert(total <= Graph.PrScale)
    assert(total >= Graph.PrScale - n - Graph.PrIters * (e + 2L * n),
      s"lost too much mass: $total of ${Graph.PrScale} over $n nodes, $e edges")
  }

  test("pagerank on a star graph ranks the hub above every leaf") {
    import spark.implicits._
    val star = (2L to 9L).map(k => (1L, k)).toDF("src", "dst")
    val got = Graph.pageRank(star, Graph.PrIters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hub = got(1L)
    (2L to 9L).foreach(k => assert(hub > got(k), s"hub must outrank leaf $k"))
    // leaves are symmetric, so their ranks must be identical
    assert((2L to 9L).map(got).distinct.length == 1)
  }

  test("corpus_divergence: identical sources diverge by 0, disjoint ones approach ln 2") {
    import spark.implicits._
    // counts must dominate the +1 Laplace prior or smoothing pulls every
    // distribution toward uniform and JS collapses — hence the repetition
    def rep(w: String) = Array.fill(40)(w).mkString(" ")
    val same = Seq(
      (1L, rep("alpha") + " " + rep("beta"), "A"),
      (2L, rep("alpha") + " " + rep("beta"), "B"),
      (3L, rep("zeta") + " " + rep("eta"), "C"))
      .toDF("doc_id", "text", "source")
    val out = TextOps.corpusDivergence(same)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(3))).toMap
    assert(out.keySet == Set(("A", "B"), ("A", "C"), ("B", "C")))
    assert(out(("A", "B")) == 0.0, "identical unigram distributions must give JS 0")
    // A and C share no vocabulary: JS must sit near its ln 2 ceiling (the
    // Laplace prior keeps it strictly below) and strictly above the A-B pair
    assert(out(("A", "C")) > 0.4 && out(("A", "C")) <= math.log(2.0) + 1e-9)
    assert(out(("B", "C")) == out(("A", "C")), "A==B so both must diverge from C equally")
  }

  test("corpus_divergence on real data: full pair set, union-vocab spine, JS in [0, ln 2]") {
    val docs = graft.Tables.documents(spark, d)
    val nSrc = docs.select("source").distinct().count().toInt
    val vocab = docs
      .select(explode(TextOps.normWords(col("text"))).as("w")).distinct().count()
    val out = TextOps.qCorpusDivergence(spark, d).collect()
    assert(out.length == nSrc * (nSrc - 1) / 2, "one row per unordered source pair")
    out.foreach { r =>
      assert(r.getString(0) < r.getString(1), "pairs are emitted a < b once")
      assert(r.getLong(2) == vocab, "every pair sums over the union vocab spine")
      val js = r.getDouble(3)
      assert(js >= 0.0 && js <= math.log(2.0) + 1e-9, s"JS out of range: $r")
    }
  }
}
