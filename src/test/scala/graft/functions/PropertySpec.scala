package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the custom kernels whose contracts are algebraic:
  * randomized (seeded, deterministic) inputs catch the edges the
  * example-based specs didn't think of — duplicates, ties, empty input,
  * single element, full-buffer boundaries, arbitrary reduce/merge splits. */
class PropertySpec extends AnyFunSuite {

  private val ord = Ordering.by((r: RankedItem) => (-r.value, r.key))

  test("TopKByValue agrees with sort-based top-k on any input, duplicates included") {
    val rnd = new scala.util.Random(20260813)
    for (trial <- 1 to 300) {
      val n = rnd.nextInt(40)
      // coarse grids force value ties AND exact duplicate (value, key) rows
      val items = List.fill(n)(RankedItem(rnd.nextInt(20) / 2.0, rnd.nextInt(10).toLong))
      val k = 1 + rnd.nextInt(8)
      val agg = new TopKByValue(k)
      // arbitrary arrival order + a random merge split (partial aggregation)
      val (l, r) = items.splitAt(if (n == 0) 0 else rnd.nextInt(n + 1))
      val got = agg.finish(agg.merge(
        l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce)))
      val expected = items.sorted(ord).take(k)
      assert(got == expected,
        s"trial $trial k=$k: got=$got expected=$expected items=$items")
    }
  }

  test("TopKByValue buffer never exceeds k and stays sorted after every reduce") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val items = List.fill(rnd.nextInt(30))(
        RankedItem(rnd.nextDouble() * 200 - 100, rnd.nextInt(20).toLong))
      val k = 1 + rnd.nextInt(5)
      val agg = new TopKByValue(k)
      items.foldLeft(agg.zero) { (buf, it) =>
        val next = agg.reduce(buf, it)
        assert(next.size <= k)
        assert(next == next.sorted(ord), s"buffer unsorted: $next")
        next
      }
    }
  }

  // ------------------------------------------------------------- KMV
  // The overlap serving state is correct under ANY micro-batch split
  // exactly because the KMV sketch is a pure function of the input SET
  // and its merge is a semilattice (commutative, associative,
  // idempotent). These properties are the whole proof obligation — pin
  // them on randomized inputs with heavy duplication and k-boundary
  // sizes, not just the example-based OverlapSpec rows.

  private def kmvFlip(x: Long): Long = x ^ Long.MinValue

  private def kmvRef(xs: Seq[Long], k: Int): Seq[Long] =
    xs.distinct.sortBy(kmvFlip).take(k) // the spec: k smallest distinct, unsigned order

  test("KMinValues: reduce-fold over any order/split == k smallest distinct " +
    "of the set (partition invariance)") {
    val rnd = new scala.util.Random(20260816)
    for (trial <- 1 to 300) {
      val k = 1 + rnd.nextInt(12)
      val n = rnd.nextInt(60)
      // small value grid forces duplicates; full-range values cross the
      // signed/unsigned boundary the flip must order correctly
      val xs = List.fill(n)(
        if (rnd.nextBoolean()) rnd.nextInt(15).toLong else rnd.nextLong())
      val agg = new KMinValues(k)
      val shuffled = rnd.shuffle(xs)
      val (l, r) = shuffled.splitAt(if (n == 0) 0 else rnd.nextInt(n + 1))
      val got = agg.finish(agg.merge(
        l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce)))
      assert(got == kmvRef(xs, k),
        s"trial $trial k=$k: got=$got expected=${kmvRef(xs, k)} xs=$xs")
    }
  }

  test("KMinValues: merge is commutative, associative, idempotent, k-bounded") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val k = 1 + rnd.nextInt(8)
      val agg = new KMinValues(k)
      def sk(): Seq[Long] =
        List.fill(rnd.nextInt(30))(rnd.nextInt(25).toLong)
          .foldLeft(agg.zero)(agg.reduce)
      val (a, b, c) = (sk(), sk(), sk())
      assert(agg.merge(a, b) == agg.merge(b, a), "merge not commutative")
      assert(agg.merge(agg.merge(a, b), c) == agg.merge(a, agg.merge(b, c)),
        "merge not associative")
      assert(agg.merge(a, a) == a, "merge not idempotent")
      assert(agg.merge(a, b).size <= k, "merge exceeded k")
    }
  }

  test("KMinValues: estimate is exact below k and within 5/sqrt(k) above") {
    val rnd = new scala.util.Random(99)
    // below k: every distinct value is kept, the estimate is the count
    for (_ <- 1 to 50) {
      val k = 8 + rnd.nextInt(40)
      val agg = new KMinValues(k)
      val xs = List.fill(rnd.nextInt(k))(rnd.nextLong()).distinct
      val s = xs.foldLeft(agg.zero)(agg.reduce)
      assert(KMinValues.estimate(s, k) == xs.size.toDouble)
    }
    // above k: (k-1)/U_k lands within ~5 standard errors on random hashes
    val k = 256
    val agg = new KMinValues(k)
    val n = 20000
    val s = Seq.fill(n)(rnd.nextLong()).foldLeft(agg.zero)(agg.reduce)
    val est = KMinValues.estimate(s, k)
    assert(math.abs(est - n) / n < 5.0 / math.sqrt(k),
      s"estimate $est for $n distinct outside 5/sqrt(k)")
  }
}
