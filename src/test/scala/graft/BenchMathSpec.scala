package graft

import org.scalatest.funsuite.AnyFunSuite

/** The windowed-normalization arithmetic (round 12, VERDICT r11 #1) is
  * load-bearing for every cross-round performance comparison, so its
  * selection rule is pinned here rather than living untested inside the
  * Bench main.
  */
class BenchMathSpec extends AnyFunSuite {
  private val w = Seq((0, 2.0), (50, 4.0), (100, 1.0))

  test("query midpoints pick the nearest window boundary") {
    // i + 0.5 vs boundaries {0, 50, 100}: nearest wins.
    assert(BenchMath.nearestWindowFactor(w, 0) == 2.0)    // 0.5 -> 0
    assert(BenchMath.nearestWindowFactor(w, 24) == 2.0)   // 24.5 -> 0
    assert(BenchMath.nearestWindowFactor(w, 25) == 4.0)   // 25.5 -> 50
    assert(BenchMath.nearestWindowFactor(w, 49) == 4.0)   // 49.5 -> 50
    assert(BenchMath.nearestWindowFactor(w, 74) == 4.0)   // 74.5 -> 50
    assert(BenchMath.nearestWindowFactor(w, 75) == 1.0)   // 75.5 -> 100
    assert(BenchMath.nearestWindowFactor(w, 200) == 1.0)  // past the end
  }

  test("exact ties break to the earlier window") {
    // adjacent-boundary windows (windowEvery=1): i=5 sits at 5.5,
    // equidistant (0.5) from 5 and 6 — the window that existed when
    // the query started wins.
    val tight = Seq((5, 3.0), (6, 7.0))
    assert(BenchMath.nearestWindowFactor(tight, 5) == 3.0)
  }

  test("windowed total divides each wall by its own window, skips failures") {
    // walls at indices 0..2 with windows {0 -> 2.0, 2 -> 4.0}:
    // index 0 (0.5) -> w0, index 1 (1.5) -> earlier on tie? |0-1.5|=1.5,
    // |2-1.5|=0.5 -> w2; index 2 (2.5) -> w2. A failed wall (-1)
    // contributes zero instead of poisoning the total.
    val win = Seq((0, 2.0), (2, 4.0))
    val total = BenchMath.windowedNormalizedTotal(win, Seq(4.0, -1.0, 8.0))
    assert(math.abs(total - (4.0 / 2.0 + 0.0 + 8.0 / 4.0)) < 1e-12)
  }

  test("a single window reduces to plain division") {
    val one = Seq((0, 2.5))
    val total = BenchMath.windowedNormalizedTotal(one, Seq(5.0, 10.0))
    assert(math.abs(total - 6.0) < 1e-12)
  }
}
