package graft

import org.apache.spark.sql.functions._

/** Behavioral laws for q173 (KMV intersection) and q174 (association
  * rules): sketch-algebra bounds and market-basket accounting.
  */
class SketchAlgebraSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q173 covers every audience pair; sketch algebra bounds hold") {
    val rows = run("q173_kmv_intersect")
      .select("ta", "tb", "n_sketch", "m_common", "union_est", "inter_est",
        "exact_inter")
      .as[(String, String, Long, Long, Double, Double, Long)].collect()
    val types = graft.ops.TestData.table(spark, sf, "events")
      .select("event_type").distinct().count()
    assert(rows.length == types * (types - 1) / 2, "all unordered pairs")
    rows.foreach { case (ta, tb, n, m, uEst, iEst, exact) =>
      assert(ta < tb, "canonical pair order")
      assert(m <= n, "common members are a subset of the union sketch")
      assert(iEst <= uEst + 1e-9, "intersection cannot exceed union")
      if (n < 64) {
        // union sketch is complete => both inputs complete => exact
        assert(math.abs(iEst - exact) < 1e-9, s"$ta/$tb: $iEst vs $exact")
      }
    }
  }

  test("q174 rules: dense ranks, probability bounds, recounted support") {
    val rows = run("q174_assoc_rules")
      .select("rank", "u", "v", "pair_orders", "cnt_u", "cnt_v", "support",
        "conf_u_v", "conf_v_u", "lift")
      .as[(Int, Long, Long, Long, Long, Long, Double, Double, Double, Double)]
      .collect().sortBy(_._1)
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.map(_._1).toSeq == (1 to rows.length))
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._10 >= b._10, "lift non-increasing")
      case _ =>
    }
    rows.foreach { r =>
      assert(r._4 >= 2, "support threshold")
      assert(r._8 > 0 && r._8 <= 1.0 && r._9 > 0 && r._9 <= 1.0)
      assert(r._7 <= r._8 && r._7 <= r._9, "support <= both confidences")
    }
    // recount the top rule's pair support straight off lineitem
    val top = rows.head
    val li = graft.ops.TestData.table(spark, sf, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val recount = li.where(col("p") === top._2).select("o")
      .join(li.where(col("p") === top._3).select("o"), "o").count()
    assert(recount == top._4, s"pair (${top._2},${top._3}): $recount vs ${top._4}")
  }
}
