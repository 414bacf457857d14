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
}
