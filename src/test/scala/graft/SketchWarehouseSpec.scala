package graft

import org.apache.spark.sql.functions._
import graft.ops.TestData

/** Behavioral invariants for the round-6 sketch / warehouse additions
  * (q126-q131). The DuckDB oracle pins exact values; these pin the
  * structural laws that must hold on ANY corpus: CMS one-sided error,
  * Bloom zero-false-negative, compaction conservation, triangle/degree
  * bounds, cohort self-retention, attribution mass conservation.
  */
class SketchWarehouseSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q126 CMS estimates are one-sided: est >= exact, never under") {
    val rows = run("q126_cms_heavy_hitters")
      .select("user_id", "exact_cnt", "cms_est", "overcount")
      .as[(Long, Long, Long, Long)].collect()
    // top-20, or every user when the corpus has fewer (sf0.001 has 15)
    val nUsers = TestData.table(spark, sf, "events")
      .select("user_id").distinct().count()
    assert(rows.length == math.min(20L, nUsers))
    rows.foreach { case (u, exact, est, over) =>
      assert(est >= exact, s"user $u: CMS underestimated $est < $exact")
      assert(over == est - exact, s"user $u: overcount inconsistent")
    }
    // top-20 selection: sorted by exact desc then id
    val sorted = rows.sortBy { case (u, e, _, _) => (-e, u) }
    assert(rows.toSeq == sorted.toSeq, "heavy-hitter order violated")
  }

  test("q127 Bloom filter has zero false negatives; flags consistent") {
    val rows = run("q127_bloom_decontam")
      .select("doc_id", "bloom_maybe", "exact_member", "false_positive")
      .as[(Long, Int, Int, Int)].collect()
    val nDocs = TestData.table(spark, sf, "documents").count()
    assert(rows.length == nDocs, "one verdict per corpus doc")
    rows.foreach { case (d, bloom, exact, fp) =>
      if (exact == 1)
        assert(bloom == 1, s"doc $d: false negative — impossible for Bloom")
      assert(fp == (if (bloom == 1 && exact == 0) 1 else 0),
        s"doc $d: false_positive flag inconsistent")
    }
    // the benchmark members themselves must all be flagged
    assert(rows.count(_._3 == 1) >= rows.count(r => r._1 % 97 == 0))
  }

  test("q128 compaction plan conserves docs and bytes, numbers files densely") {
    val rows = run("q128_compaction_plan")
      .select("lang", "source", "file_id", "n_docs", "bytes")
      .as[(String, String, Int, Long, Long)].collect()
    val truth = TestData.table(spark, sf, "documents")
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("b"))
      .as[(String, String, Long, Long)].collect()
      .map { case (l, s, n, b) => (l, s) -> ((n, b)) }.toMap
    val byGroup = rows.groupBy(r => (r._1, r._2))
    assert(byGroup.keySet == truth.keySet, "plan must cover every partition")
    byGroup.foreach { case (k, rs) =>
      val (n, b) = truth(k)
      assert(rs.map(_._4).sum == n, s"$k: docs not conserved")
      assert(rs.map(_._5).sum == b, s"$k: bytes not conserved")
      val ids = rs.map(_._3).toSeq.sorted
      assert(ids == (0 until ids.length),
        s"$k: file ids not dense from 0: $ids")
    }
  }

  test("q129 triangle participation bounded by degree choose 2") {
    val rows = run("q129_triangle_count")
      .select("part", "triangles", "deg")
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { case (p, t, d) =>
      assert(d >= 2, s"part $p in a triangle needs degree >= 2")
      assert(t <= d * (d - 1) / 2,
        s"part $p: $t triangles exceeds C($d,2) neighbor pairs")
    }
  }

  test("q130 every cohort fully retains itself at offset 0") {
    val rows = run("q130_cohort_retention")
      .select("cohort_ym", "month_offset", "n_active", "cohort_n",
        "retained_bps")
      .as[(Int, Int, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val cohorts = rows.map(_._1).distinct
    cohorts.foreach { c =>
      val zero = rows.filter(r => r._1 == c && r._2 == 0)
      assert(zero.length == 1, s"cohort $c missing its offset-0 row")
      assert(zero.head._3 == zero.head._4 && zero.head._5 == 10000L,
        s"cohort $c: members not all active in their first month")
    }
    rows.foreach { case (c, off, a, n, bps) =>
      assert(off >= 0 && off <= 11 && a <= n && bps <= 10000L,
        s"cohort $c offset $off: retention out of bounds")
    }
  }

  test("q131 both attribution models conserve conversion and value mass") {
    val rows = run("q131_attribution")
      .select("model", "channel", "conversions", "value_cents")
      .as[(String, String, Long, Long)].collect()
    val purchases = TestData.table(spark, sf, "events")
      .where(col("event_type") === "purchase").count()
    Seq("first_touch", "last_touch").foreach { m =>
      val mrows = rows.filter(_._1 == m)
      assert(mrows.map(_._3).sum == purchases,
        s"$m: conversions don't sum to purchase count")
      assert(mrows.forall(r => Set("click", "view", "none")(r._2)),
        s"$m: unexpected channel")
    }
    val ftVal = rows.filter(_._1 == "first_touch").map(_._4).sum
    val ltVal = rows.filter(_._1 == "last_touch").map(_._4).sum
    assert(ftVal == ltVal, "models must settle identical total value")
  }
}
