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

  test("q132 audit covers all nine checks with consistent ratios") {
    val rows = run("q132_dq_audit")
      .select("check_name", "n_rows", "n_violations", "violation_bps")
      .as[(String, Long, Long, Long)].collect()
    val expected = Set("lineitem_orderkey_fk", "lineitem_partkey_fk",
      "lineitem_suppkey_fk", "lineitem_quantity_positive",
      "lineitem_discount_range", "orders_custkey_fk",
      "orders_totalprice_positive", "customer_nationkey_fk",
      "supplier_nationkey_fk")
    assert(rows.map(_._1).toSet == expected, "check inventory drifted")
    rows.foreach { case (c, n, v, bps) =>
      assert(n > 0 && v >= 0 && v <= n, s"$c: counts inconsistent")
      assert(bps == v * 10000 / n, s"$c: bps not derived from counts")
    }
  }

  test("q133 skew profile: descending shares, max dominates average") {
    val rows = run("q133_skew_profile")
      .select("key", "cnt", "n_keys", "total_rows", "max_over_avg_x100",
        "share_bps")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.length == 10)
    assert(rows.map(_._2).toSeq == rows.map(_._2).sortBy(-_).toSeq)
    val (nKeys, total) = (rows.head._3, rows.head._4)
    rows.foreach { case (k, cnt, nk, t, moa, share) =>
      assert(nk == nKeys && t == total, s"key $k: stats rows disagree")
      assert(moa >= 100, s"key $k: max below average is impossible")
      assert(share == cnt * 10000 / total, s"key $k: share inconsistent")
    }
    // top key IS the max the ratio was computed from
    assert(rows.head._5 == rows.head._2 * 100 * nKeys / total)
  }

  test("q134 peak concurrency bounded by overlap count and carry-in") {
    val rows = run("q134_peak_concurrency")
      .select("hour_epoch", "n_overlapping", "base_active",
        "peak_concurrency")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (h, n, base, peak) =>
      assert(h % 3600 == 0, s"hour $h not on an hour boundary")
      assert(base >= 0 && base <= n, s"hour $h: carry-in exceeds overlap")
      assert(peak >= base && peak >= 1 && peak <= n,
        s"hour $h: peak $peak outside [$base, $n]")
    }
  }

  test("q135 trigram ranking is consistent and user-bounded") {
    val rows = run("q135_event_trigrams")
      .select("pattern", "occurrences", "n_users")
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.map(_._2).toSeq == rows.map(_._2).sortBy(-_).toSeq)
    rows.foreach { case (p, occ, users) =>
      assert(p.split(">").length == 3, s"pattern $p not a trigram")
      assert(occ >= users && users >= 1, s"$p: more users than occurrences")
    }
  }

  test("q136 z-order files conserve rows and cover compact rectangles") {
    val rows = run("q136_zorder_layout")
      .select("file_id", "n_rows", "px_min", "px_max", "sx_min", "sx_max",
        "rect_bps")
      .as[(Int, Long, Int, Int, Int, Int, Long)].collect()
    assert(rows.nonEmpty && rows.length <= 64)
    val lineitems = TestData.table(spark, sf, "lineitem").count()
    assert(rows.map(_._2).sum == lineitems, "rows not conserved")
    rows.foreach { case (f, n, pmin, pmax, smin, smax, bps) =>
      assert(pmin >= 0 && pmax <= 255 && smin >= 0 && smax <= 255, s"$f")
      assert(pmin <= pmax && smin <= smax, s"file $f: inverted span")
      assert(bps == (pmax - pmin + 1).toLong * (smax - smin + 1) * 10000 / 65536,
        s"file $f: rectangle area inconsistent")
      // each z-file of 1024 codes covers at most a 32x32 cell
      assert(pmax - pmin <= 31 || smax - smin <= 63,
        s"file $f: span ${pmax - pmin}x${smax - smin} too wide for one z-range")
    }
  }

  test("q137 postings: heads sorted, sizes bounded by df, checksums add up") {
    // posting_head is a comma-joined STRING (the driver's pandas gate
    // cannot compare array cells — HarnessCompatSpec pins the class);
    // the law decodes it back to longs and checks the same invariants.
    val rows = run("q137_inverted_index")
      .select("term", "df", "tf", "posting_checksum", "posting_head")
      .as[(String, Long, Long, Long, String)].collect()
      .map { case (t, df, tf, sum, head) =>
        (t, df, tf, sum, head.split(",").toSeq.map(_.toLong))
      }
    assert(rows.nonEmpty && rows.length <= 100)
    assert(rows.map(_._2).toSeq == rows.map(_._2).sortBy(-_).toSeq)
    rows.foreach { case (t, df, tf, sum, head) =>
      assert(tf >= df && df >= 1, s"$t: tf below df")
      assert(head.length == math.min(10L, df), s"$t: head size wrong")
      assert(head == head.sorted, s"$t: head unsorted")
      if (df <= 10) assert(head.sum == sum, s"$t: checksum != full posting")
      else assert(head.sum < sum, s"$t: checksum must exceed head sum")
    }
  }

  test("q138 overlap matrix is half-triangular with bounded containment") {
    val rows = run("q138_source_overlap")
      .select("src_a", "src_b", "shared_shingles", "n_a", "n_b",
        "containment_bps")
      .as[(String, String, Long, Long, Long, Long)].collect()
    val nSources = TestData.table(spark, sf, "documents")
      .select("source").distinct().count()
    assert(rows.nonEmpty &&
      rows.length <= nSources * (nSources - 1) / 2)
    assert(rows.map(r => (r._1, r._2)).distinct.length == rows.length,
      "a source pair appears twice")
    rows.foreach { case (a, b, shared, na, nb, bps) =>
      assert(a < b, s"($a,$b) not half-triangular")
      assert(shared >= 1 && shared <= math.min(na, nb),
        s"($a,$b): shared $shared outside [1, min($na,$nb)]")
      assert(bps == shared * 10000 / math.min(na, nb),
        s"($a,$b): containment not derived from counts")
    }
  }

  test("q140 histogram quantiles are ordered and count-conserving") {
    val rows = run("q140_hist_quantiles")
      .select("o_orderpriority", "n_orders", "n_buckets", "p50_lo",
        "p90_lo", "p99_lo")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    val exact = TestData.table(spark, sf, "orders")
      .groupBy("o_orderpriority").count()
      .as[(String, Long)].collect().toMap
    assert(rows.map(_._1).toSet == exact.keySet, "priority inventory")
    rows.foreach { case (p, n, nb, p50, p90, p99) =>
      assert(n == exact(p), s"$p: histogram lost rows")
      assert(nb >= 1, s"$p: no buckets")
      assert(p50 <= p90 && p90 <= p99, s"$p: quantiles out of order")
      assert(p50 % 10000 == 0 && p90 % 10000 == 0 && p99 % 10000 == 0,
        s"$p: a quantile is not a bucket lower bound")
    }
  }

  test("q146 zone maps never skip a file holding matches") {
    val rows = run("q146_zone_skip_stats")
      .select("p", "n_files_scanned", "n_rows_scanned", "files_skip_bps",
        "rows_skip_bps", "exact_rows")
      .as[(Int, Long, Long, Long, Long, Long)].collect()
    assert(rows.length == 16, "one row per probe")
    rows.foreach { case (p, nf, nr, fbps, rbps, exact) =>
      // the no-false-skip law: every matching row lives in a scanned file
      assert(nr >= exact, s"probe $p: scanned rows $nr < matches $exact")
      if (exact > 0) assert(nf >= 1, s"probe $p: matches but zero files")
      assert(fbps >= 0 && fbps <= 10000 && rbps >= 0 && rbps <= 10000,
        s"probe $p: skip bps out of range")
    }
    // z-order must actually help: point probes skip most files
    assert(rows.map(_._4).min >= 5000,
      "z-order layout failed to skip at least half the files per probe")
  }

  test("q152 peeling reached its fixpoint: the core is self-consistent") {
    val core = run("q152_kcore")
      .select("part", "core_deg").as[(Long, Long)].collect().toMap
    assert(core.nonEmpty, "fixture graph must have a 3-core")
    // recompute degrees over the subgraph induced by the reported core;
    // fixpoint <=> induced degrees equal the report and all are >= 3
    val li = TestData.table(spark, sf, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val pairs = li.alias("a").join(li.alias("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v")).distinct()
      .as[(Long, Long)].collect()
    val induced = pairs.filter(e => core.contains(e._1) && core.contains(e._2))
      .flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (v, g) => v -> g.length.toLong }
    assert(induced == core, "reported core degrees != induced degrees")
    assert(core.values.forall(_ >= 3), "a core vertex has degree < 3")
  }

  test("q153 EWMA is exactly the 16-term dyadic sum") {
    val rows = run("q153_ewma_activity")
      .select("user_id", "ts_s", "event_id", "cents", "ewma_x65536")
      .as[(Long, Long, Long, Long, Long)].collect()
    val total = TestData.table(spark, sf, "events").count()
    assert(rows.length == total, "one EWMA per event")
    rows.groupBy(_._1).foreach { case (u, g) =>
      val ordered = g.sortBy(r => (r._2, r._3))
      // independent integer replay of the truncated EWMA per user
      val xs = ordered.map(_._4)
      ordered.zipWithIndex.foreach { case (r, t) =>
        val expect = (0 until 16).map { i =>
          if (t - i >= 0) xs(t - i) * (1L << (15 - i)) else 0L
        }.sum
        assert(r._5 == expect, s"user $u event ${r._3}: ewma mismatch")
      }
    }
  }

  test("q154 quota audit: peak bounds violations, bps formula exact") {
    val rows = run("q154_rolling_quota")
      .select("user_id", "n_events", "peak_1h_rate", "n_over_quota",
        "over_quota_bps")
      .as[(Long, Long, Long, Long, Long)].collect()
    val total = TestData.table(spark, sf, "events").count()
    assert(rows.map(_._2).sum == total, "per-user counts must cover stream")
    assert(rows.exists(_._4 > 0), "fixture must surface some bursts")
    rows.foreach { case (u, n, peak, over, bps) =>
      assert(peak >= 1 && peak <= n, s"user $u: peak outside [1, n]")
      if (peak <= 1) assert(over == 0, s"user $u: violations without burst")
      else assert(over >= 1, s"user $u: burst peak but zero violations")
      assert(over <= n, s"user $u: more violations than events")
      assert(bps == over * 10000 / n, s"user $u: bps formula")
    }
  }

  test("q155 reshard plan: diagonal stays, motion share consistent") {
    val rows = run("q155_reshard_plan")
      .select("old_shard", "new_shard", "n_docs", "is_moved", "moved_bps")
      .as[(Int, Int, Long, Int, Long)].collect()
    val total = TestData.table(spark, sf, "documents").count()
    assert(rows.map(_._3).sum == total, "cells must partition the corpus")
    // h % 16 == h % 20 is possible (both congruences can hold), so the
    // stay set is exactly the old==new cells
    rows.foreach { case (o, n, _, m, _) =>
      assert(m == (if (o == n) 0 else 1), s"cell ($o,$n): is_moved wrong")
      assert(o >= 0 && o < 16 && n >= 0 && n < 20)
    }
    val moved = rows.filter(_._4 == 1).map(_._3).sum
    val bps = rows.head._5
    assert(rows.forall(_._5 == bps), "moved_bps must be corpus-constant")
    assert(bps == moved * 10000 / total, "moved share formula")
    assert(bps > 5000, "mod-reshard must move most docs (the point)")
  }

  test("q147 CMS join estimate is one-sided on every depth row") {
    val rows = run("q147_cms_join_size")
      .select("j", "est_join_rows", "exact_join_rows", "over_bps")
      .as[(Int, Long, Long, Long)].collect()
    assert(rows.map(_._1).sorted.toSeq == Seq(0, 1, 2, 3))
    val exacts = rows.map(_._3).distinct
    assert(exacts.length == 1, "exact join size must be depth-invariant")
    rows.foreach { case (j, est, exact, over) =>
      assert(est >= exact, s"depth $j: inner-product estimate under exact")
      assert(over == (est - exact) * 10000 / math.max(exact, 1L),
        s"depth $j: over_bps inconsistent")
    }
  }

  test("q202 gap-bitwidth histogram conserves postings and beats flat-64") {
    val rows = run("q202_posting_gap_bits")
      .select("bitwidth", "n_gaps", "bits", "bits_share_bps")
      .as[(Long, Long, Long, Long)].collect()
    val postings = TestData.table(spark, sf, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .where(col("t") =!= "").select("t", "doc_id").distinct().count()
    assert(rows.map(_._2).sum == postings, "every posting yields one gap")
    rows.foreach { r =>
      assert(r._1 >= 1 && r._3 == r._1 * r._2, s"bits accounting at $r")
    }
    val totalBits = rows.map(_._3).sum
    assert(totalBits < postings * 64,
      "delta-gap encoding must beat flat 64-bit postings")
    val shareSum = rows.map(_._4).sum
    assert(shareSum <= 10000 && shareSum > 10000 - rows.length,
      s"share accounting: $shareSum")
  }
}
