package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Same-JVM cost probe for dedup_clusters_incremental's maintenance
  * kernel (r13, VERDICT r12 task 5 "SCALEPROBE note showing cost ∝
  * batch, not corpus"): times (a) the full-graph CC recompute and (b)
  * [[graft.operators.Dedup.maintainClusters]] folding only the batch
  * edges into an already-frozen prior labeling — the state read is
  * localCheckpoint'd OUTSIDE the timer, exactly the production shape
  * where prior labels are a frozen table. min-of-2 each, back-to-back in
  * one JVM so the co-tenant window cancels.
  *
  *   runMain graft.tools.CcMaintProbe <dataDir>
  */
object CcMaintProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup

    val pairs = Dedup.qNgramJaccard(spark, d)
      .select(col("doc_a"), col("doc_b")).localCheckpoint()
    val nPairs = pairs.count()
    val priorPairs = pairs
      .filter(col("doc_a") % 5 =!= 2 && col("doc_b") % 5 =!= 2).localCheckpoint()
    val delta = pairs
      .filter(col("doc_a") % 5 === 2 || col("doc_b") % 5 === 2).localCheckpoint()
    // frozen prior state, built OUTSIDE the timers
    val prior = Dedup.clusterPairs(priorPairs)
      .select(col("doc_id"), col("cluster_id")).localCheckpoint()
    System.err.println(s"[ccm] pairs=$nPairs prior_edges=${priorPairs.count()} " +
      s"delta_edges=${delta.count()} prior_labels=${prior.count()}")

    def time(body: => Unit): Double = (1 to 2).map { _ =>
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }.min

    val tFull = time {
      Dedup.clusterPairs(pairs).queryExecution.toRdd.count()
    }
    val tMaint = time {
      Dedup.maintainClusters(prior, delta).queryExecution.toRdd.count()
    }
    System.err.println(
      f"[ccm] full_recompute=$tFull%.2fs maintenance=$tMaint%.2fs ratio=${tMaint / tFull}%.2f")

    // ---- synthetic-scale regime: the fixture graph is a few hundred
    // edges, where BOTH paths are fixed-job-latency-bound and maintenance
    // (more joins) measures slower. The data-volume claim needs a corpus
    // where the edge list dominates: N disjoint 2-cliques (the measured
    // shape of real dup components) + an M-edge batch that merges a 1/100
    // sample of adjacent cliques. Prior labels are constructed directly
    // (they ARE the frozen state; building them is not maintenance cost).
    val N = sys.env.getOrElse("CCM_N", "1000000").toLong // prior 2-cliques
    val M = sys.env.getOrElse("CCM_M", "10000").toLong   // batch edges
    val step = N / M
    val synthPrior = spark.range(N)
      .select((col("id") * 2).as("doc_a"), (col("id") * 2 + 1).as("doc_b"))
      .localCheckpoint()
    val synthDelta = spark.range(M)
      .select((col("id") * step * 2).as("doc_a"),
        (col("id") * step * 2 + 2).as("doc_b"))
      .localCheckpoint()
    val synthLabels = spark.range(2 * N)
      .select(col("id").as("doc_id"), (col("id") - col("id") % 2).as("cluster_id"))
      .localCheckpoint()
    val tFullS = time {
      Dedup.clusterPairs(synthPrior.union(synthDelta)).queryExecution.toRdd.count()
    }
    val tMaintS = time {
      Dedup.maintainClusters(synthLabels, synthDelta).queryExecution.toRdd.count()
    }
    System.err.println(
      f"[ccm] synth N=$N M=$M full=$tFullS%.2fs maintenance=$tMaintS%.2fs " +
        f"speedup=${tFullS / tMaintS}%.1fx")

    if (sys.env.contains("CCM_DEBUG")) {
      def t1(label: String)(body: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = body
        System.err.println(f"[ccm]   $label%-14s ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
      }
      val prior2 = synthLabels
      val delta2 = synthDelta
      val deltaV = delta2.select(col("doc_a").as("doc_id"))
        .union(delta2.select(col("doc_b").as("doc_id"))).distinct()
      t1("deltaV") { deltaV.count() }
      val affected = prior2.join(deltaV, "doc_id")
        .select(col("cluster_id")).distinct().localCheckpoint()
      t1("affected") { affected.count() }
      val affMembers = prior2.join(broadcast(affected), "cluster_id")
      t1("affMembers") { affMembers.count() }
      val reduced = delta2.select(col("doc_a"), col("doc_b"))
        .union(affMembers.select(col("doc_id").as("doc_a"),
          col("cluster_id").as("doc_b")))
        .localCheckpoint()
      t1("reduced") { reduced.count() }
      var relabeled: org.apache.spark.sql.DataFrame = null
      t1("relabeledCC") {
        relabeled = Dedup.clusterPairs(reduced).select(col("doc_id"), col("cluster_id"))
          .localCheckpoint()
        relabeled.count() }
      val untouched = prior2.join(broadcast(affected), Seq("cluster_id"), "left_anti")
        .select(col("doc_id"), col("cluster_id"))
      t1("untouched") { untouched.count() }
      val labels = untouched.union(relabeled)
      val sizes = labels.groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
      t1("final") {
        labels.join(sizes, "cluster_id")
          .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
          .queryExecution.toRdd.count() }
    }
    spark.stop()
  }
}
