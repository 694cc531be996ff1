package graft

/** Semantic laws for the round-8 additions (q267-q272) — the DuckDB
  * oracles pin exact values; these pin cross-operator and structural
  * contracts that must hold on ANY corpus.
  */
class Round8LawSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q271 recursive median equals q257's one-level two-pass median") {
    // same statistic, different bucket recursion depth — the recursion
    // must be exact, not approximate
    val rec = run("q271_recursive_median")
      .select("median_cents").as[Long].head()
    val one = run("q257_two_pass_median")
      .select("median_cents").as[Long].head()
    assert(rec == one, s"recursive=$rec one-level=$one")
  }

  test("q268 BFS: one seed at distance 0, every level non-empty prefix") {
    val rows = run("q268_bfs_hops")
      .select("dist", "n_nodes").as[(Int, Long)].collect().sortBy(_._1)
    assert(rows.head == ((0, 1L)), s"seed level: ${rows.head}")
    // BFS levels form a contiguous prefix: an empty frontier can never
    // repopulate, so dist values must be 0..k with no gap
    assert(rows.map(_._1).toSeq == (0 until rows.length), rows.toSeq)
    assert(rows.forall(_._2 > 0), rows.toSeq)
  }

  test("q269 triples are ordered cliques over the >=3-shingle pair graph") {
    val t = run("q269_similar_triples")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(t.nonEmpty, "degenerate corpus: no triples at sf0.001")
    t.foreach { case (d1, d2, d3, i12, i13, i23) =>
      assert(d1 < d2 && d2 < d3, s"not canonical: ($d1,$d2,$d3)")
      assert(i12 >= 3 && i13 >= 3 && i23 >= 3,
        s"non-clique edge in ($d1,$d2,$d3): $i12,$i13,$i23")
    }
  }

  test("q272 skyline members are mutually non-dominated") {
    val sky = run("q272_skyline_parts")
      .select("p_retailprice", "p_size").as[(Double, Int)].collect()
    assert(sky.nonEmpty)
    for (a <- sky; b <- sky if a != b)
      assert(!(a._1 <= b._1 && a._2 <= b._2 &&
        (a._1 < b._1 || a._2 < b._2)), s"$a dominates $b inside skyline")
  }

  test("q273 rollup levels are mutually consistent (additivity)") {
    val rows = run("q273_rollup_report")
      .select("lvl", "r_name", "rev").as[(Int, String, Long)].collect()
    val grand = rows.filter(_._1 == 3).map(_._3)
    assert(grand.length == 1)
    // each level re-adds to the grand total
    assert(rows.filter(_._1 == 0).map(_._3).sum == grand.head)
    assert(rows.filter(_._1 == 1).map(_._3).sum == grand.head)
    // nation rows within a region add to that region's subtotal
    val regionSub = rows.filter(_._1 == 1).map(r => r._2 -> r._3).toMap
    rows.filter(_._1 == 0).groupBy(_._2).foreach { case (rn, ns) =>
      assert(ns.map(_._3).sum == regionSub(rn), rn)
    }
  }

  test("q270 lambda view reconciles batch+speed against raw everywhere") {
    val rows = run("q270_lambda_view")
      .select("batch_events", "speed_events", "total", "raw_total",
        "consistent")
      .as[(Long, Long, Long, Long, Int)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (b, s2, t, r, c) =>
      assert(b + s2 == t && t == r && c == 1, ((b, s2, t, r, c)).toString)
    }
  }
}
