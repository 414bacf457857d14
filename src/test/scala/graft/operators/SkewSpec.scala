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

  test("surprisal joins spread a Zipf hot token: salted count joins, exact results") {
    // VERDICT r6 task 6: unigramSurprisal / bigramScores join tokens to
    // vocab and bigram counts BY WORD — under a Zipf corpus the hot
    // token's shuffle partition is the critical path. AQE's skew rule
    // CANNOT fix this shape (the count side is aggregated between its
    // shuffle and the join, so OptimizeSkewedJoin's pattern never
    // matches), so the operators salt the lookup instead
    // (Curation.saltedCountJoin): the hot key spreads across
    // CountJoinSalt partitions structurally. This pins (a) the salted
    // shuffle shape in the plan, (b) the structural spread of the hot
    // key, (c) exact results on a 90%-one-token corpus.
    val spark = graft.streaming.StreamFixture.spark
    import spark.implicits._
    val conf = spark.conf
    val saved = conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle-join shape these tables take at 100 TB vocab
      // sizes (a broadcast-able vocab has no skew problem to begin with)
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      // 2000 docs × 100 tokens, 90 of each doc's tokens are "the" (the
      // hot key: 180k of 200k rows); the remaining 10 are unique per doc,
      // so the vocab side is real (20001 words), not broadcast-trivial
      val docs = spark.range(2000).select($"id".as("doc_id"),
        concat_ws(" ",
          concat_ws(" ", Seq.fill(90)(lit("the")): _*),
          concat_ws(" ", (0 until 10).map(i =>
            concat(lit(s"w${i}_"), $"id".cast("string"))): _*)).as("text"),
        lit("src").as("source"))

      val uni = Curation.unigramSurprisal(docs)
      val rows = uni.collect()
      assert(rows.length == 2000)
      // exact LM math survives the salting: every doc scores identically
      val expected = BigDecimal(
        (90 * -math.log(180000.0 / 200000) + 10 * -math.log(1.0 / 200000)) / 100)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      rows.foreach { r =>
        assert(r.getLong(1) == 100L)
        assert(r.getDouble(2) == expected, s"doc ${r.getLong(0)}: ${r.getDouble(2)}")
      }
      // (a) the token-side exchange keys on (w, salt), not bare w
      val uniPlan = uni.queryExecution.executedPlan.toString
      assert("hashpartitioning\\(w#\\d+, salt#".r.findFirstIn(uniPlan).isDefined,
        s"vocab join is not salted:\n$uniPlan")
      // (b) structural spread: the hot word's token rows land on
      // CountJoinSalt distinct join keys, ≈1/S of the hot mass each
      val toks = docs.select($"doc_id",
        explode(graft.operators.TextOps.normWords($"text")).as("w"))
      val spread = toks.filter($"w" === "the")
        .groupBy(pmod(hash($"doc_id"), lit(Curation.CountJoinSalt)).as("salt"))
        .count().collect().map(r => r.getLong(1))
      assert(spread.length == Curation.CountJoinSalt, s"salt buckets: ${spread.length}")
      val perBucket = 180000.0 / Curation.CountJoinSalt
      assert(spread.forall(n => n < perBucket * 1.5),
        s"hot key not spread: ${spread.toSeq.sorted.reverse}")

      // (c) the bigram LM's (w1,w2)/w1/w2 lookups carry the same hot
      // mass — ("the","the") is 89 of every doc's 99 bigrams — and are
      // salted the same way
      val bg = Curation.bigramScores(Curation.tokens(docs))
      val bgRows = bg.collect()
      assert(bgRows.length == 2000)
      assert(bgRows.forall(_.getLong(1) == 99L)) // n_bigrams per doc
      val bgPlan = bg.queryExecution.executedPlan.toString
      assert("hashpartitioning\\(w1#\\d+, w2#\\d+, salt#".r.findFirstIn(bgPlan).isDefined,
        s"bigram count join is not salted:\n$bgPlan")
      assert("hashpartitioning\\(w2#\\d+, salt#".r.findFirstIn(bgPlan).isDefined,
        s"unigram backoff join is not salted:\n$bgPlan")
    } finally saved.fold(conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
      conf.set("spark.sql.autoBroadcastJoinThreshold", _))
  }

  test("boilerplate_strip on a 90%-one-segment corpus: hot key stays correct, nothing quadratic") {
    // the pathological input this op exists FOR: a single boilerplate
    // segment in (nearly) every document. The seg_text df count is a
    // partial-agg (map-side combined — the hot key never concentrates raw
    // rows), and the mark join fans out 1:1 (hot table holds ONE row per
    // seg_text), so correctness and plan shape must both survive.
    val spark = graft.streaming.StreamFixture.spark
    import spark.implicits._
    val boiler = (1 to 10).map(i => s"hot$i").mkString(" ")
    val docs = (1L to 500L).map { id =>
      val own = (1 to 10).map(i => s"d${id}w$i").mkString(" ")
      if (id <= 450) (id, s"$boiler $own", "s") else (id, own, "s")
    }.toDF("doc_id", "text", "source")
    val out = Curation.boilerplateStrip(docs).collect()
      .map(r => (r.getLong(0), (r.getLong(2), r.getString(3)))).toMap
    assert(out.size == 500)
    (1L to 450L).foreach { id =>
      assert(out(id)._1 == 1L, s"doc $id must lose exactly the hot segment")
      assert(!out(id)._2.contains("hot1"), s"doc $id still carries boilerplate")
    }
    (451L to 500L).foreach(id => assert(out(id)._1 == 0L))
    // per-doc unique segments all survive: no over-strip under the hot key
    assert(out.values.forall(_._2.nonEmpty))
  }
}
