package graft

import org.apache.spark.sql.functions._

/** Behavioral laws for the audit/accounting batch (q181-q185). */
class AuditOpsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q181 ABC classes: partition parts, A-heavy revenue ordering") {
    val rows = run("q181_abc_classes")
      .select("abc_class", "n_parts", "class_rev")
      .as[(String, Long, Double)].collect().sortBy(_._1)
    val nParts = graft.ops.TestData.table(spark, sf, "lineitem")
      .select("l_partkey").distinct().count()
    assert(rows.map(_._2).sum == nParts, "classes partition the parts")
    assert(rows.map(_._1).toSet.subsetOf(Set("A", "B", "C")))
    // class A holds >= 80% of revenue by construction; per-part average
    // revenue must be non-increasing A -> B -> C
    val perPart = rows.map(r => r._1 -> r._3 / r._2).toMap
    perPart.get("A").zip(perPart.get("B")).foreach { case (a, b) =>
      assert(a >= b, "A parts out-earn B parts on average")
    }
    perPart.get("B").zip(perPart.get("C")).foreach { case (b, c) =>
      assert(b >= c, "B parts out-earn C parts on average")
    }
  }

  test("q182 funnel latency: converters exist, percentiles ordered and bounded") {
    val r = run("q182_funnel_latency")
      .select("n_converted", "p50_s", "p90_s", "max_s")
      .as[(Long, Long, Long, Long)].collect().head
    // the 7-day horizon converts on this stream (1 h — q172's — does not)
    assert(r._1 > 0, "fixture must produce converted users")
    assert(r._2 >= 0 && r._2 <= r._3 && r._3 <= r._4, "p50 <= p90 <= max")
    assert(r._4 <= 7 * 86400, "conversion bounded by the 7-day horizon")
  }

  test("q183 FK audit: four edges, synthetic star is referentially clean") {
    val rows = run("q183_fk_audit")
      .select("fk_edge", "fact_rows", "orphan_rows", "orphan_bps")
      .as[(String, Long, Long, Long)].collect()
    assert(rows.map(_._1).sorted.toSeq == Seq("lineitem.orderkey",
      "lineitem.partkey", "lineitem.suppkey", "orders.custkey"))
    rows.foreach { case (e, n, o, bps) =>
      assert(n > 0, e)
      assert(o == 0 && bps == 0, s"$e: generator data must be orphan-free")
    }
  }

  test("q184 chi-square: marginals consistent, terms non-negative") {
    val rows = run("q184_chi2_independence")
      .select("job", "y", "observed", "row_tot", "col_tot", "expected",
        "chi_term")
      .as[(String, String, Long, Long, Long, Double, Double)].collect()
    val n = graft.ops.TestData.bankFrame(spark, sf).count()
    assert(rows.map(_._3).sum == n, "cells partition the population")
    rows.groupBy(_._1).foreach { case (job, g) =>
      assert(g.map(_._3).sum == g.head._4, s"$job row marginal")
    }
    rows.groupBy(_._2).foreach { case (y, g) =>
      assert(g.map(_._3).sum == g.head._5, s"$y col marginal")
    }
    // expected cells sum to N (within fp): sum_r sum_c rt*ct/N = N
    assert(math.abs(rows.map(_._6).sum - n) < 1e-6 * n)
    rows.foreach(r => assert(r._7 >= 0 && !r._7.isNaN))
  }

  test("q185 growth accounting: users conserved, first day all-new") {
    val rows = run("q185_new_returning")
      .select("day", "active_users", "new_users", "returning_users")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val ev = graft.ops.TestData.table(spark, sf, "events")
    assert(rows.map(_._3).sum == ev.select("user_id").distinct().count(),
      "every user is new exactly once")
    rows.foreach { case (d, a, nw, ret) =>
      assert(a == nw + ret && nw >= 0 && ret >= 0, s"day $d accounting")
    }
    assert(rows.head._2 == rows.head._3, "first day has no returning users")
  }
}
