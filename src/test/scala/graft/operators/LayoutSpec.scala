package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order clustering evidence: after a Z-order rewrite, file-level
  * min/max stats prune range predicates on BOTH clustered dimensions; a
  * single-column sort prunes only its own. This is the layout face of
  * predicate pushdown — the stats these tests read are exactly what the
  * parquet reader's footer check and a catalog file index skip with. */
class LayoutSpec extends AnyFunSuite {

  private lazy val spark = graft.streaming.StreamFixture.spark
  private val d = "/root/testdata/sf0.01"

  test("z-order makes files prunable on both dimensions; single sort on one") {
    val li = graft.Tables.lineitem(spark, d)
      .select(col("l_partkey").cast("long").as("pk"),
        col("l_suppkey").cast("long").as("sk"))

    val base = Files.createTempDirectory("graft-layout").toString
    val zPath = s"$base/z"
    val sPath = s"$base/s"
    // a power of 4 splits the top z-bits evenly between the two dims (an
    // odd power of 2 gives one dim an extra strip level and skews pruning)
    val nFiles = 64
    Layout.writeZOrdered(li, "pk", "sk", zPath, nFiles)
    Layout.writeSorted(li, "pk", sPath, nFiles)

    def stats(path: String) = Layout.fileStats(spark.read.parquet(path), "pk", "sk")
      .collect()
      .map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    val zStats = stats(zPath)
    val sStats = stats(sPath)
    assert(zStats.length == nFiles && sStats.length == nFiles)

    // a 10%-of-range predicate on each dimension
    val Array(bounds) = li.agg(
      min("pk").cast("double"), max("pk").cast("double"),
      min("sk").cast("double"), max("sk").cast("double")).collect()
    def tenPct(lo: Double, hi: Double) = {
      val c = lo + (hi - lo) * 0.45
      (c, c + (hi - lo) * 0.1)
    }
    val (pLo, pHi) = tenPct(bounds.getDouble(0), bounds.getDouble(1))
    val (sLo, sHi) = tenPct(bounds.getDouble(2), bounds.getDouble(3))

    val zOnPk = Layout.prunableFraction(zStats.map(s => (s._1, s._2)), pLo, pHi)
    val zOnSk = Layout.prunableFraction(zStats.map(s => (s._3, s._4)), sLo, sHi)
    val sOnPk = Layout.prunableFraction(sStats.map(s => (s._1, s._2)), pLo, pHi)
    val sOnSk = Layout.prunableFraction(sStats.map(s => (s._3, s._4)), sLo, sHi)
    info(f"prunable fraction: z-order pk=$zOnPk%.2f sk=$zOnSk%.2f; pk-sort pk=$sOnPk%.2f sk=$sOnSk%.2f")

    // the single sort is the best case for ITS column and useless for the
    // other; z-order must prune a majority of files on BOTH
    assert(sOnPk >= 0.8, s"pk-sorted layout should prune its own dim: $sOnPk")
    assert(sOnSk <= 0.1, s"pk-sorted layout cannot prune the other dim: $sOnSk")
    assert(zOnPk >= 0.5, s"z-order must prune pk ranges: $zOnPk")
    assert(zOnSk >= 0.5, s"z-order must prune sk ranges: $zOnSk")

    // and the pruning is SOUND: reading only non-prunable files returns
    // exactly the full filtered result
    val full = spark.read.parquet(zPath)
      .filter(col("sk") >= sLo && col("sk") <= sHi).count()
    val kept = Layout.fileStats(spark.read.parquet(zPath), "pk", "sk").collect()
      .filter(r => !(r.getDouble(3) > sHi || r.getDouble(4) < sLo))
      .map(_.getString(0))
    val prunedRead = spark.read.parquet(kept: _*)
      .filter(col("sk") >= sLo && col("sk") <= sHi).count()
    assert(prunedRead == full, s"pruned read lost rows: $prunedRead vs $full")
  }

  test("z-order rewrite of an EMPTY frame writes a schema-preserving " +
    "empty layout instead of crashing on null bounds") {
    val li = graft.Tables.lineitem(spark, d)
      .select(col("l_partkey").cast("long").as("pk"),
        col("l_suppkey").cast("long").as("sk"))
      .filter(col("pk") < 0) // an all-filtered incremental batch
    val path = Files.createTempDirectory("graft-layout-empty").toString + "/z"
    Layout.writeZOrdered(li, "pk", "sk", path, nFiles = 8)
    val back = spark.read.parquet(path)
    assert(back.count() == 0)
    assert(back.columns.toSeq == Seq("pk", "sk"),
      "empty layout must keep the input schema")
  }

  test("equi-depth bucketed layout: equal-mass directories, plan-level pruning, sound range reads") {
    val li = graft.Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_extendedprice").cast("double").as("price"))
    val path = Files.createTempDirectory("graft-edb").toString + "/li"
    Layout.writeEquidepthBucketed(li, "price", path, nBuckets = 10)

    // equal-population: every bucket directory within 2% of total/10
    val perBucket = spark.read.parquet(path).groupBy("price_bucket").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = li.count()
    assert(perBucket.keySet == (0 to 9).toSet, s"buckets: ${perBucket.keySet}")
    perBucket.foreach { case (b, n) =>
      assert(math.abs(n - total / 10.0) <= total * 0.02, s"bucket $b holds $n of $total")
    }

    // a range spanning roughly deciles 4-5 must prune the other eight
    // directories AT THE PLAN (PartitionFilters), not just at row filter
    val Array(bounds) = li.agg(
      expr("percentile(price, 0.42)"), expr("percentile(price, 0.58)")).collect()
    val (lo, hi) = (bounds.getDouble(0), bounds.getDouble(1))
    val rr = Layout.readValueRange(spark, path, "price", lo, hi)
    val plan = rr.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("price_bucket"),
      s"bucket predicate must reach PartitionFilters:\n$plan")
    // the rewritten read touches only the buckets the range can occupy
    val filesRead = rr.select(input_file_name().as("f")).distinct().count()
    val filesAll = spark.read.parquet(path)
      .select(input_file_name().as("f")).distinct().count()
    assert(filesRead * 4 <= filesAll,
      s"range read should touch ≤1/4 of files: $filesRead of $filesAll")
    // soundness: rewritten read == direct filter over the full table
    val expected = li.filter(col("price") >= lo && col("price") <= hi).count()
    assert(rr.count() == expected && expected > 0,
      s"pruned read returned ${rr.count()} rows, expected $expected")
  }

  test("writeShuffled lays files out as contiguous, internally-ordered position ranges") {
    val docs = graft.Tables.documents(spark, d)
    val path = Files.createTempDirectory("graft-shuffled").toString + "/docs"
    val nFiles = 8
    Layout.writeShuffled(docs, "doc_id", path, nFiles)

    val back = spark.read.parquet(path)
    assert(back.count() == docs.count(), "rewrite must preserve every row")
    // per-file position ranges: internally dense+ordered files, and file
    // ranges tile [0, N) without overlap — the sequential-reader contract
    val ranges = back
      .groupBy(input_file_name().as("file"))
      .agg(min("shuffle_pos").as("lo"), max("shuffle_pos").as("hi"),
        count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(ranges.length == nFiles)
    ranges.foreach { case (lo, hi, n) =>
      assert(hi - lo + 1 == n, s"file range [$lo,$hi] is not dense for $n rows")
    }
    ranges.sliding(2).foreach { case Array((_, hi, _), (lo2, _, _)) =>
      assert(lo2 == hi + 1, s"file ranges must tile contiguously: $hi then $lo2")
    }
    assert(ranges.head._1 == 0 && ranges.last._2 == docs.count() - 1)
    // and the order IS the reproducible global shuffle order
    val expect = Sampling.globalShuffle(docs, "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    back.select("doc_id", "shuffle_pos").collect()
      .foreach(r => assert(expect(r.getLong(0)) == r.getLong(1)))
  }

  test("compaction collapses a many-small-files corpus, preserving content and clustering") {
    val docs = graft.Tables.documents(spark, d).select("doc_id", "text", "source")
    val base = Files.createTempDirectory("graft-compact").toString
    val fragmented = s"$base/frag"
    docs.repartition(64).write.parquet(fragmented) // a streaming sink's litter
    assert(spark.read.parquet(fragmented).inputFiles.length == 64)

    // pick a target that lands at a handful of files
    val fs = new org.apache.hadoop.fs.Path(fragmented)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val total = spark.read.parquet(fragmented).inputFiles.map(f =>
      fs.getFileStatus(new org.apache.hadoop.fs.Path(new java.net.URI(f))).getLen).sum
    val target = total / 4

    val compacted = s"$base/out"
    val (before, after) = Layout.compact(spark, fragmented, compacted, target)
    assert(before == 64)
    assert(after <= 5, s"expected ~4-5 files, planned $after")
    val written = spark.read.parquet(compacted)
    assert(written.inputFiles.length == after)
    assert(written.collect().map(_.toSeq).toSet == docs.collect().map(_.toSeq).toSet,
      "compaction must preserve content exactly")

    // ordered compaction: an existing clustering survives the rewrite
    val ordered = s"$base/ordered"
    Layout.compact(spark, fragmented, ordered, target, orderCol = Some("doc_id"))
    val ranges = spark.read.parquet(ordered)
      .groupBy(input_file_name().as("f"))
      .agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    ranges.sliding(2).foreach { case Array((_, hi), (lo2, _)) =>
      assert(lo2 > hi, s"file ranges overlap after ordered compaction: $hi vs $lo2")
    case _ => ()
    }
  }

  test("interleave16 is the exact Morton interleave; bucket16 clamps to [0, 65535]") {
    val row = spark.range(1).select(
      Layout.interleave16(lit(0xFFFF), lit(0)).as("a"),
      Layout.interleave16(lit(0), lit(0xFFFF)).as("b"),
      Layout.interleave16(lit(0xFFFF), lit(0xFFFF)).as("c"),
      Layout.interleave16(lit(1), lit(2)).as("d"),
      Layout.bucket16(lit(0.0), 0.0, 10.0).as("lo"),
      Layout.bucket16(lit(10.0), 0.0, 10.0).as("hi"),
      Layout.bucket16(lit(-3.0), 0.0, 10.0).as("under"),
      Layout.bucket16(lit(99.0), 0.0, 10.0).as("over"),
      Layout.bucket16(lit(5.0), 0.0, 10.0).as("mid")).collect()(0)
    assert(row.getLong(0) == 0x55555555L) // a fills the even bit lanes
    assert(row.getLong(1) == 0xAAAAAAAAL) // b the odd ones
    assert(row.getLong(2) == 0xFFFFFFFFL)
    assert(row.getLong(3) == (1L | (1L << 3))) // 1 -> bit0, 2 -> bit1 shifted odd
    assert(row.getLong(4) == 0L && row.getLong(5) == 65535L)
    assert(row.getLong(6) == 0L && row.getLong(7) == 65535L) // clamped
    assert(row.getLong(8) == 32768L)
  }

  /** Bit-by-bit reference Morton interleave (the definition, not the
    * magic-mask cascade the production code uses). */
  private def mortonRef(a: Long, b: Long): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }

  test("zorder_key: integer min-max buckets are tight and zkey equals the bit-by-bit Morton definition") {
    val rows = Layout.qZorderKey(spark, d).collect()
    assert(rows.nonEmpty)
    val bx = rows.map(_.getLong(1))
    val by = rows.map(_.getLong(2))
    // bucketInt16 maps lo -> 0 and hi -> 65536 - ceil(65536/span): with the
    // sf0.01 spans (thousands of custkeys / ~2400 days) both ends are tight
    assert(bx.min == 0L && by.min == 0L)
    assert(bx.max > 60000L && bx.max < 65536L)
    assert(by.max > 60000L && by.max < 65536L)
    rows.foreach { r =>
      assert(r.getLong(3) == mortonRef(r.getLong(1), r.getLong(2)),
        s"zkey mismatch for order ${r.getLong(0)}")
    }
  }

  test("zorder_key has no driver collect: the bounds agg is a broadcast cross join in-plan") {
    val plan = Layout.qZorderKey(spark, d).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"expected in-plan broadcast of the 1-row bounds agg:\n$plan")
  }
}
