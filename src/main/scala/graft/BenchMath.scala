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

  /** Wall-storm predicate (VERDICT r13 #4): q85's r13 storm inflated
    * the wall of BOTH timed samples while in-bench jit stayed LOW
    * (0.17 s), so neither the >2x sample-divergence rule nor the
    * jit_sec ~ wall rule could fire. Second trigger: the best sample
    * sits far above the query's committed-artifact reference wall
    * scaled by the CURRENT control window's host factor — fire when it
    * exceeds 2.5x the scaled reference AND tops it by more than 1 s
    * absolute (so sub-second multiplicative jitter can't trip it), for
    * references >= 0.5 s (below that the 2.5x band is inside normal
    * noise). Scaling by hfNow keeps a loaded host from mass-triggering:
    * co-tenancy raises the control windows, raising every threshold
    * with it. Measured on the four committed r12/r13 artifact pairs:
    * zero cross-round fires at hfNow = 1; the r13 q85 storm
    * (5.31 s vs ref 1.636) fires.
    */
  def wallStorm(bestWall: Double, refWall: Option[Double],
                hfNow: Double): Boolean =
    refWall.exists { r =>
      val scaled = r * math.max(1.0, hfNow)
      r >= 0.5 && bestWall > 2.5 * scaled && bestWall - scaled > 1.0
    }

  /** Extract the per-query walls from a bench artifact's full JSON
    * line. A regex-grade parse is sound here: the artifact is
    * machine-written by Bench itself — flat, number-valued, exactly one
    * `"queries":{...}` object — and no JSON library is on the
    * classpath. Returns empty on anything unexpected (the guard then
    * simply stays inactive for queries without a reference).
    */
  def parseQueryWalls(json: String): Map[String, Double] = {
    val key = "\"queries\":{"
    val qIdx = json.indexOf(key)
    if (qIdx < 0) Map.empty
    else {
      val start = qIdx + key.length
      val end = json.indexOf("}", start)
      if (end < 0) Map.empty
      else "\"([^\"]+)\":(-?[0-9.]+)".r
        .findAllMatchIn(json.substring(start, end))
        .flatMap(m => m.group(2).toDoubleOption.map(m.group(1) -> _))
        .toMap
    }
  }
}
