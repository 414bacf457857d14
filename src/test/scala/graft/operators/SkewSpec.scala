package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew handling: at 100 TB a hot join key turns one shuffle partition into
  * the whole job's critical path. The engine's answer is AQE's skew join
  * (runtime partition splitting) — this spec proves it ENGAGES under our
  * session config, not just that the flag exists. */
class SkewSpec extends AnyFunSuite {

  test("AQE splits a skewed sort-merge join partition (skew=true in the final plan)") {
    val spark = graft.streaming.StreamFixture.spark
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      // 200k rows, half on the single hot key 0. Two subtleties this test
      // documents: (a) payloads must be incompressible (md5 strings) and
      // survive column pruning (max(payload) below), else LZ4 flattens the
      // BYTE skew that AQE's detector measures — a constant hot key
      // compresses to nothing; (b) keep the post-join agg global so the
      // split can't be rejected for re-shuffling.
      val left = spark.range(200000)
        .select(when($"id" < 100000, 0L).otherwise($"id").as("k"),
          concat(md5($"id".cast("string")), md5(($"id" + 1).cast("string")),
            md5(($"id" + 2).cast("string"))).as("payload"))
      val right = spark.range(2000).select($"id".as("k"), lit("dim").as("tag"))
      val joined = left.join(right, "k").agg(count(lit(1)).as("n"), max($"payload").as("mx"))

      val Seq(row) = joined.collect().toSeq
      assert(row.getLong(0) == 100000L) // exactly the hot-key matches survive

      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE skew join did not engage:\n$finalPlan")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }
}
