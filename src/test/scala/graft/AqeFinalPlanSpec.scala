package graft

import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.{LocalTableScanExec, RangeExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamFixture.spark

/** AQE FINAL-plan lint for the most expensive entries (r11 VERDICT task
  * 7). [[PlanLintSpec]] gates the PREPARED plan with AQE off — the
  * structural shuffle budget — but what actually runs is the adaptive
  * re-plan (skew-join splits, coalesced readers, runtime join demotion).
  * This suite EXECUTES the bench's top-10 registered entries and asserts
  * on the `isFinalPlan=true` tree: no Cartesian product materialized at
  * runtime, and no structural single-partition exchange over an unbounded
  * child survived adaptive planning. (A 1-partition AQEShuffleRead is
  * fine — that is AQE *observing* the data is tiny; a SinglePartition
  * ShuffleExchange is the plan *requiring* one task at any size.)
  *
  * The top-10 set is the bench.json ranking at r11 (sf0.1, min-of-3),
  * restricted to registered entries — the entries where a bad final plan
  * would cost real wall-clock at 100 TB. */
class AqeFinalPlanSpec extends AnyFunSuite {

  val d = "/root/testdata/sf0.01"

  /** bench.json top-10 registered entries (r11 ranking, most expensive
    * first). curation_state_build outranks some of these but is a bench
    * pipeline stage, not a registered entry. */
  val top10: Seq[String] = Seq(
    "prefix_jaccard", "dedup_clusters", "corpus_curate_scale", "pagerank",
    "bpe_tokenize", "triplet_mine_scale", "embedding_dedup_blocked",
    "embedding_dedup", "embedding_dedup_2level", "corpus_curate")

  /** Same declared exception as PlanLintSpec: corpus_curate composes the
    * exact ntile tercile by design; its scale twin (corpus_curate_scale,
    * also in the top-10) uses frozen sketch cuts and must stay clean. */
  val singlePartitionAllowlist: Set[String] = Set("corpus_curate")

  /** Full traversal of an executed adaptive tree: descends into
    * AdaptiveSparkPlanExec's final plan, materialized query stages, and
    * reused exchanges (all leaf-ish wrappers `collect` won't cross). */
  def walk(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: walk(a.executedPlan)
    case q: QueryStageExec => p +: walk(q.plan)
    case r: ReusedExchangeExec => p +: walk(r.child)
    case _ => p +: p.children.flatMap(walk)
  }

  /** PlanLintSpec's boundedness check, over the adaptive traversal. */
  def bounded(p: SparkPlan): Boolean = walk(p).exists {
    case agg: BaseAggregateExec =>
      agg.groupingExpressions.isEmpty || agg.groupingExpressions.forall {
        case a: org.apache.spark.sql.catalyst.expressions.Alias => a.child.foldable
        case e => e.foldable
      }
    case _: org.apache.spark.sql.execution.GlobalLimitExec |
         _: org.apache.spark.sql.execution.LocalLimitExec |
         _: org.apache.spark.sql.execution.CollectLimitExec |
         _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => true
    case _: LocalTableScanExec => true
    case r: RangeExec => r.numElements <= BigInt(1000000)
    case _ => false
  }

  test("top-10 entries' EXECUTED (isFinalPlan) trees: no Cartesian product, " +
    "no structural single-partition exchange over unbounded input") {
    assume(spark.conf.get("spark.sql.adaptive.enabled") == "true",
      "AQE must be on for a final-plan lint")
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    top10.foreach { name =>
      val df = SparkEntry.queries(name)(spark, d)
      df.queryExecution.toRdd.count() // actually run it → AQE final plan
      val root = df.queryExecution.executedPlan
      root match {
        case a: AdaptiveSparkPlanExec =>
          if (!a.toString.contains("isFinalPlan=true"))
            failures += s"$name: adaptive plan not finalized after execution"
          walk(a).foreach {
            case _: CartesianProductExec =>
              failures += s"$name: CartesianProductExec in FINAL plan"
            case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition =>
              if (!bounded(e.child) && !singlePartitionAllowlist.contains(name))
                failures += s"$name: SinglePartition exchange over unbounded child post-AQE"
            case _ => ()
          }
        case other =>
          // iterative operators (pagerank, dedup_clusters) may return a
          // plan whose root is a non-adaptive wrapper over cached stages —
          // lint whatever tree executed
          walk(other).foreach {
            case _: CartesianProductExec =>
              failures += s"$name: CartesianProductExec in executed plan"
            case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition =>
              if (!bounded(e.child) && !singlePartitionAllowlist.contains(name))
                failures += s"$name: SinglePartition exchange over unbounded child"
            case _ => ()
          }
      }
      spark.catalog.clearCache()
    }
    assert(failures.isEmpty, "AQE final-plan lint failures:\n" + failures.mkString("\n"))
  }

  test("top-10 set stays registered") {
    val missing = top10.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"top-10 lint names unregistered entries: $missing")
  }
}
