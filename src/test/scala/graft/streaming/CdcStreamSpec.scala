package graft.streaming

import java.nio.file.Files
import java.util.UUID

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** Streaming CDC ingest: a changelog stream drained through the
  * idempotent log sink must serve, via merge-on-read, exactly the
  * snapshot the batch merge_apply computes — and mid-stream the served
  * snapshot reflects exactly the changes ingested so far. */
class CdcStreamSpec extends AnyFunSuite {

  test("streamed changelog serves the batch-merged snapshot; retry is idempotent") {
    val spark = StreamFixture.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val d = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, d)
    val base = Relational.mergeBase(docs)
    val changelog = Relational.simulatedChangelog(docs)
      .as[(Long, String, String, Long, String)].collect().toSeq
    // replay by ascending version so the ordered chunks are a plausible
    // CDC arrival order (merge-on-read is order-insensitive anyway)
    val (b1, b2) = changelog.sortBy(_._4).splitAt(changelog.length / 2)

    def snapshot(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getLong(3))).toMap

    val logPath = Files.createTempDirectory("graft-cdclog").toString + "/log"
    val input = MemoryStream[(Long, String, String, Long, String)]
    val query = input.toDF().toDF("doc_id", "source", "fp", "version", "op")
      .writeStream
      .outputMode("update")
      .queryName("cdc_" + UUID.randomUUID().toString.replace("-", ""))
      .option("checkpointLocation", Files.createTempDirectory("graft-ckpt").toString)
      .foreachBatch(Relational.cdcLogSink(logPath) _)
      .start()
    try {
      input.addData(b1: _*)
      query.processAllAvailable()
      // mid-stream: served == merge of exactly the changes seen so far
      val mid = snapshot(Relational.mergeServeFromLog(spark, base, logPath))
      val midExpected = snapshot(Relational.mergeApply(base,
        b1.toDF("doc_id", "source", "fp", "version", "op")))
      assert(mid == midExpected, "mid-stream snapshot must reflect ingested changes only")

      input.addData(b2: _*)
      query.processAllAvailable()
      val fin = snapshot(Relational.mergeServeFromLog(spark, base, logPath))
      val direct = snapshot(Relational.qMergeApply(spark, d))
      assert(fin == direct, "final served snapshot must equal the batch merge")

      // retried last micro-batch overwrites its own directory
      val lastBatch = spark.read.parquet(logPath).selectExpr("max(batch)")
        .collect()(0).getInt(0)
      Relational.cdcLogSink(logPath)(
        b2.toDF("doc_id", "source", "fp", "version", "op"), lastBatch.toLong)
      val reFin = snapshot(Relational.mergeServeFromLog(spark, base, logPath))
      assert(reFin == direct, "retried micro-batch must be idempotent")
    } finally query.stop()
  }
}
