package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Curation, CurationState, Pipeline}

/** One-off profiler for the curate_incremental SERVE path: times each gate
  * in isolation against a prebuilt artifact (diagnostic, not shipped). */
object ServeProfile {
  def main(args: Array[String]): Unit = {
    val d = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, d)
    val state = docs.filter(col("doc_id") % 2 === 0)
    val fresh = docs.filter(col("doc_id") % 2 === 1)
    val path = java.nio.file.Files.createTempDirectory("serveprof").toString
    CurationState.write(CurationState.compute(state), path)
    def time(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      println(f"[profile] $name%-22s ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.catalog.clearCache()
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      val cs = CurationState.load(spark, path)
      time("full_serve") {
        Pipeline.curateIncrementalFromState(cs, fresh).queryExecution.toRdd.count() }
      spark.catalog.clearCache()
      val toks = Curation.tokens(fresh).persist()
      time("tokens_fresh") { toks.queryExecution.toRdd.count() }
      time("keepRep") {
        CurationState.contentFp(fresh).groupBy(col("fp")).agg(min(col("doc_id")))
          .join(cs.fp, Seq("fp"), "left_anti").queryExecution.toRdd.count() }
      time("repetition") {
        Curation.repetitionSignalsFrom(toks).queryExecution.toRdd.count() }
      time("contamination") {
        val fg = Curation.contamGrams(toks)
        Curation.contaminationAgainst(
          cs.benchGrams.unionByName(fg.filter(col("source") === Curation.BenchmarkSource).select("g")).distinct(),
          fg.filter(col("source") =!= Curation.BenchmarkSource).select("doc_id","g"))
          .queryExecution.toRdd.count() }
      time("lm_ppl") {
        CurationState.lmScores(CurationState.bigramsOf(toks), cs.c1, cs.c2, cs.stats)
          .crossJoin(broadcast(cs.bounds)).queryExecution.toRdd.count() }
      time("mix") {
        Pipeline.domainMixFromCounts(cs.srcCounts, fresh).queryExecution.toRdd.count() }
      toks.unpersist(); spark.catalog.clearCache()
    }
    spark.stop()
  }
}
