package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, functions => F}

/** K-Minimum-Values distinct sketch as a typed `Aggregator` — the
  * mergeable set sketch behind [[graft.operators.Overlap]]'s cross-source
  * corpus-overlap estimation (Beyer et al., "On Synopses for Distinct-
  * Value Estimation Under Multiset Operations", SIGMOD'07 — public
  * literature; DataSketches' ThetaSketch is the production cousin).
  *
  * Why KMV and not Spark's HLL: `hll_sketch_agg` unions, but a union-only
  * sketch cannot estimate INTERSECTIONS, and "how much does crawl N
  * overlap crawl N−1" is an intersection question. KMV supports both: the
  * k smallest hash values of a set are a uniform sample of its distinct
  * hashes, so (a) the k-th smallest value estimates cardinality —
  * E[distinct] ≈ (k−1)/U₍k₎ with U₍k₎ the k-th value as a (0,1)
  * fraction — and (b) for two sketches, the k smallest of their union is
  * exactly KMV(A ∪ B), and the fraction of those present in BOTH input
  * sketches is an unbiased Jaccard estimator (standard error ~1/√k).
  *
  * Scale contract: the buffer is a sorted-distinct `Seq[Long]` capped at
  * k — per-group state is k × 8 bytes NO MATTER how many rows stream
  * through, reduce is an O(1) bar-check + O(k) insert, and merge is one
  * bounded sorted-merge. A 100 TB corpus's per-source sketch is 4 KiB at
  * k=512; the pairwise-overlap step downstream touches only sketches.
  * Hash order is UNSIGNED (sign-bit flip) so the (0,1)-fraction mapping
  * of xxhash64's full 64-bit range is monotone.
  *
  * Determinism: the sketch of a set is a pure function of the set (the k
  * smallest distinct values), independent of row order and partitioning —
  * merge-invariance is pinned exactly in OverlapSpec, not approximately.
  */
class KMinValues(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {

  @inline private def flip(x: Long): Long = x ^ Long.MinValue // unsigned order

  override def zero: Seq[Long] = Vector.empty

  override def reduce(b: Seq[Long], a: Long): Seq[Long] = {
    val fa = flip(a)
    if (b.size == k && fa >= flip(b.last)) b // at/above the bar: O(1) reject
    else {
      val i = b.indexWhere(x => fa <= flip(x))
      if (i >= 0 && b(i) == a) b // already present (sketches are sets)
      else {
        val at = if (i == -1) b.size else i
        ((b.take(at) :+ a) ++ b.drop(at)).take(k)
      }
    }
  }

  override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] =
    (x ++ y).distinct.sortBy(flip).take(k)

  override def finish(b: Seq[Long]): Seq[Long] = b

  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}

object KMinValues {
  /** Sketch size: std-error ≈ 1/√k ≈ 4.4% on both cardinality and
    * Jaccard; 4 KiB per group. */
  val DefaultK = 512

  def kmv(k: Int = DefaultK) = F.udaf(new KMinValues(k), ExpressionEncoder[Long]())

  /** Cardinality estimate from a sketch: exact when the set was smaller
    * than k (every value was kept), else (k−1)/U₍k₎. */
  def estimate(sketch: Seq[Long], k: Int = DefaultK): Double =
    if (sketch.size < k) sketch.size.toDouble
    else (k - 1) / fraction(sketch.last)

  /** A hash as a (0,1) fraction of the unsigned 64-bit range. */
  def fraction(h: Long): Double =
    ((h ^ Long.MinValue).toDouble - Long.MinValue.toDouble) / 1.8446744073709552e19
}
