package graft

/** Pure arithmetic of the bench's windowed host-factor normalization
  * (round 12, VERDICT r11 #1) — extracted from Bench so the selection
  * rule is spec-testable instead of living only inside a main.
  *
  * Windows are (afterQuery, hostFactor) pairs: the calibration pair ran
  * AFTER `afterQuery` queries of the timed pass had completed (window 0
  * is the pre-pass measurement, the final window follows the last
  * query). Query index i executes between boundaries i and i+1, so its
  * midpoint i+0.5 picks the nearest window; ties break to the earlier
  * window (the measurement that existed when the query started).
  */
object BenchMath {

  /** Host factor of the window nearest to query index `i`. */
  def nearestWindowFactor(windows: Seq[(Int, Double)], i: Int): Double = {
    require(windows.nonEmpty, "no control windows")
    windows.minBy { case (afterQ, _) => math.abs(afterQ - (i + 0.5)) }._2
  }

  /** Sum of per-query walls, each divided by its nearest window's
    * factor; failed queries (wall < 0) contribute zero.
    */
  def windowedNormalizedTotal(windows: Seq[(Int, Double)],
                              walls: Seq[Double]): Double =
    walls.zipWithIndex.map { case (w, i) =>
      if (w > 0) w / nearestWindowFactor(windows, i) else 0.0
    }.sum
}
