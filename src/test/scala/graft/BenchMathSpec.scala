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

  test("wall-storm fires on the q85 replay, stays quiet on steady state") {
    // The r13 q85 incident verbatim: storm wall 5.31 s vs committed
    // reference 1.636 s on a quiet host (VERDICT r13 #4).
    assert(BenchMath.wallStorm(5.31, Some(1.636), 1.0))
    // Steady-state q85 walls (1.6-2.3 s) must not fire.
    assert(!BenchMath.wallStorm(2.3, Some(1.636), 1.0))
    // A loaded host raises the threshold via the current window factor
    // (the load is already visible in the controls; re-sampling a
    // co-tenant window buys nothing).
    assert(!BenchMath.wallStorm(5.31, Some(1.636), 4.28))
    // Sub-second references are below the guard's floor: multiplicative
    // jitter on cheap queries must not burn the retry budget.
    assert(!BenchMath.wallStorm(0.9, Some(0.12), 1.0))
    // Absolute floor: >2.5x but less than 1 s above the reference.
    assert(!BenchMath.wallStorm(1.45, Some(0.5), 1.0))
    // No reference (a brand-new query): inactive.
    assert(!BenchMath.wallStorm(99.0, None, 1.0))
  }

  test("wall-storm adds zero re-samples across committed normal passes") {
    // The r13 'done' bar: the guard fires on the q85 pattern AND a
    // normal pass adds zero re-samples. Cross-compare the committed
    // round artifacts as (reference -> measured) pairs at hfNow = 1 —
    // every wall in each normal pass must sit inside the guard's band.
    def walls(p: String) = BenchMath.parseQueryWalls(
      java.nio.file.Files.readString(java.nio.file.Paths.get(p)))
    val pairs = Seq(
      "BENCH_local_r12.json" -> "BENCH_local_r13.json",
      "BENCH_local_r13_close.json" -> "BENCH_local_r13.json",
      "BENCH_local_r12_final.json" -> "BENCH_local_r13_close.json")
    for ((refP, curP) <- pairs) {
      val ref = walls(refP)
      val cur = walls(curP)
      assert(ref.nonEmpty && cur.nonEmpty, s"unparsable artifact $refP/$curP")
      val fires = cur.collect {
        case (q, w) if BenchMath.wallStorm(w, ref.get(q), 1.0) => q
      }
      assert(fires.isEmpty,
        s"normal pass $refP -> $curP would re-sample: $fires")
    }
  }

  test("artifact wall parse reads the queries object only") {
    val line = """{"metric":"total","value":9.1,"unit":"sec","n_queries":2,""" +
      """"queries":{"q1_agg":1.250,"q2_x":-1},"controls":{"cal":0.35}}"""
    val w = BenchMath.parseQueryWalls(line)
    assert(w == Map("q1_agg" -> 1.25, "q2_x" -> -1.0))
    assert(BenchMath.parseQueryWalls("{}").isEmpty)
    assert(BenchMath.parseQueryWalls("""{"queries":{}}""").isEmpty)
  }
}
