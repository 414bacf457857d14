package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RTBF deletion for the CMS serving sketch (r15): CMS is linear, so
  * subtracting the purged docs' own sketch must reproduce the sketch
  * rebuilt from the live corpus BIT-IDENTICALLY — not approximately.
  * That exactness is the whole point: the frozen serving sketch
  * (cms_sketch_build / cms_lookup) can honor a purge without any corpus
  * rescan, and every estimate served afterwards is indistinguishable
  * from a full rebuild's. */
class CmsPurgeSpec extends AnyFunSuite {

  test("purged sketch == sketch rebuilt from the live corpus, cell for cell") {
    val spark = graft.streaming.StreamFixture.spark
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val tokens = TextOps.tokenTable(docs).persist()
    try {
      val purgedTokens = tokens.filter(col("doc_id") % 4 === 1)
      val liveTokens = tokens.filter(col("doc_id") % 4 =!= 1)

      def cells(df: org.apache.spark.sql.DataFrame): Set[(Int, Long, Long)] =
        df.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet

      val full = TextOps.cmsMergedSketch(tokens)
      val purged = cells(TextOps.cmsPurgeSketch(full, purgedTokens))
      val rebuilt = cells(TextOps.cmsMergedSketch(liveTokens))
      assert(purged == rebuilt,
        "linear deletion diverged from the live-corpus rebuild\n" +
          s"purged-only: ${(purged -- rebuilt).take(3)}\n" +
          s"rebuilt-only: ${(rebuilt -- purged).take(3)}")

      // teeth: the purge actually moved mass — per-row totals drop by
      // exactly the purged token count (CMS rows each sum the full stream,
      // so the deleted mass is deterministic, not collision-dependent)
      val fullCells = cells(full)
      assert(purged != fullCells, "purge changed nothing — fixture broken")
      val purgedTokenCount = purgedTokens.count()
      assert(purgedTokenCount > 0, "fixture must purge a nonempty token set")
      val rowDrop = fullCells.groupBy(_._1).view
        .mapValues(_.toSeq.map(_._3).sum).toMap.map { case (r, tot) =>
          tot - purged.filter(_._1 == r).toSeq.map(_._3).sum }
      assert(rowDrop.forall(_ == purgedTokenCount),
        s"each CMS row must lose exactly the purged token mass " +
          s"($purgedTokenCount): lost $rowDrop")
    } finally { tokens.unpersist(); () }
  }

  test("purging EVERY token empties the sketch (absent-means-zero) and " +
    "the serving lookup reads exact 0 for every probe term") {
    // The total-victim RTBF edge, completing the family sweep (HLL cell,
    // overlap source, BM25 corpus, CC cluster): subtracting the full
    // stream's own sketch cancels every cell, the =!= 0 filter drops
    // them all, and the lookup path's left-join + coalesce serves 0 —
    // never null, never negative.
    val spark = graft.streaming.StreamFixture.spark
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val tokens = TextOps.tokenTable(docs).persist()
    try {
      val wiped = TextOps.cmsPurgeSketch(TextOps.cmsMergedSketch(tokens), tokens)
      assert(wiped.count() == 0,
        "an all-token purge must cancel every cell of the linear sketch")
      val served = TextOps.cmsLookupFrom(wiped, tokens.limit(0))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(served.nonEmpty && served.values.forall(_ == 0L),
        s"an emptied sketch must serve 0 for every probe term: $served")
    } finally { tokens.unpersist(); () }
  }
}
