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

  test("q186 skyline: members are mutually non-dominating and cover the frontier") {
    val sky = run("q186_skyline_parts")
      .select("p_partkey", "price", "size")
      .as[(Long, Double, Int)].collect()
    assert(sky.nonEmpty)
    // no skyline member dominates another
    for (a <- sky; b <- sky if a._1 != b._1) {
      val dominates = a._2 <= b._2 && a._3 >= b._3 &&
        (a._2 < b._2 || a._3 > b._3)
      assert(!dominates, s"${a._1} dominates ${b._1}")
    }
    // brute-force check on the fixture: every non-member is dominated
    val all = graft.ops.TestData.table(spark, sf, "part")
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      .as[(Long, Double, Int)].collect()
    val skySet = sky.map(_._1).toSet
    all.filterNot(p => skySet(p._1)).foreach { p =>
      val dominated = all.exists(q => q._1 != p._1 && q._2 <= p._2 &&
        q._3 >= p._3 && (q._2 < p._2 || q._3 > p._3))
      assert(dominated, s"part ${p._1} excluded but not dominated")
    }
  }

  test("q187 weighted median: member value, mass split law") {
    val rows = run("q187_weighted_median")
      .select("n_name", "n_cust", "tot_w", "wmedian_bal")
      .as[(String, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val cust = graft.ops.TestData.table(spark, sf, "customer")
    val orders = graft.ops.TestData.table(spark, sf, "orders")
    val nation = graft.ops.TestData.table(spark, sf, "nation")
    val joined = cust.join(orders, col("c_custkey") === col("o_custkey"))
      .join(nation, col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name", "c_custkey").agg(
        first("c_acctbal").as("bal"), count(lit(1)).as("wt"))
      .as[(String, Long, Double, Long)].collect()
      .groupBy(_._1)
    rows.foreach { case (n, nCust, totW, med) =>
      val g = joined(n)
      assert(g.length == nCust && g.map(_._4).sum == totW, s"$n accounting")
      assert(g.exists(_._3 == med), s"$n median is a member value")
      // at least half the weight sits at or below the weighted median
      val below = g.filter(_._3 <= med).map(_._4).sum
      assert(2 * below >= totW, s"$n mass split")
    }
  }

  test("q188 streaks: conservation vs q185-style day counts") {
    val rows = run("q188_activity_streaks")
      .select("user_id", "active_days", "n_streaks", "longest_streak")
      .as[(Long, Long, Long, Long)].collect()
    val ud = graft.ops.TestData.table(spark, sf, "events")
      .select(col("user_id"),
        expr("unix_micros(date_trunc('day', ts)) div 86400000000").as("day"))
      .distinct().groupBy("user_id").count()
      .as[(Long, Long)].collect().toMap
    assert(rows.map(_._1).toSet == ud.keySet)
    rows.foreach { case (u, days, streaks, longest) =>
      assert(days == ud(u), s"user $u active days")
      assert(longest >= 1 && longest <= days && streaks >= 1 && streaks <= days)
      // pigeonhole: longest streak at least ceil(days / streaks)
      assert(longest * streaks >= days, s"user $u pigeonhole")
    }
  }

  test("q189 ship latency: line conservation, p50 within bounds") {
    val rows = run("q189_ship_latency")
      .select("priority", "n_lines", "mean_days", "p50_days", "max_days")
      .as[(String, Long, Double, Long, Long)].collect()
    val lines = graft.ops.TestData.table(spark, sf, "lineitem").count()
    assert(rows.map(_._2).sum == lines, "every lineitem has a latency")
    rows.foreach { case (p, n, mean, p50, mx) =>
      assert(n > 0 && p50 <= mx, p)
      assert(mean >= 0 && mean <= mx, s"$p mean in range")
      // lower median is never above the mean by more than the range
      assert(p50 >= 0, s"$p ship date at/after order date")
    }
  }

  test("q190 novelty: doc 0 fully novel, grams conserved, ratios in (0,1]") {
    val rows = run("q190_ngram_novelty")
      .select("doc_id", "n_grams", "n_novel", "novelty")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.head._1 == 0 && rows.head._4 == 1.0,
      "the first doc's grams are all first-seen")
    val distinctGrams = rows.map(_._3).sum
    // every distinct gram in the corpus is novel in exactly one doc
    val direct = graft.ops.TestData.table(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .where(size(col("w")) >= 3)
      .select(explode(expr(
        "transform(sequence(1, size(w) - 2), i -> concat_ws(' ', " +
          "element_at(w, i), element_at(w, i + 1), element_at(w, i + 2)))"))
        .as("gram"))
      .distinct().count()
    assert(distinctGrams == direct, "novel counts partition the gram space")
    rows.foreach { case (d, g, nv, r) =>
      assert(g > 0 && nv >= 0 && nv <= g, s"doc $d counts")
      assert(r >= 0.0 && r <= 1.0, s"doc $d ratio")
    }
  }

  test("q191 churn: churned is a subset of active, bps consistent") {
    val rows = run("q191_churned_customers")
      .select("n_name", "active_1997", "churned", "churn_bps")
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, a, c, bps) =>
      assert(c >= 0 && c <= a, s"$n subset")
      assert(bps == c * 10000 / a, s"$n bps")
    }
    // cross-check one nation by hand
    val orders = graft.ops.TestData.table(spark, sf, "orders")
    val a97 = orders.where(year(col("o_orderdate")) === 1997)
      .select("o_custkey").distinct()
    val a98 = orders.where(year(col("o_orderdate")) === 1998)
      .select("o_custkey").distinct()
    val churnTotal = a97.join(a98, Seq("o_custkey"), "left_anti").count()
    assert(rows.map(_._3).sum == churnTotal, "churn total")
  }

  test("q192 seasonal index: 12 months, weighted mean exactly 12/12") {
    val rows = run("q192_seasonal_index")
      .select("month", "n_orders", "revenue", "seasonal_index")
      .as[(Int, Long, Double, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1 to 12))
    // sum of month revenues' indices weighted by revenue share is 12
    val idxSum = rows.map(_._4).sum
    assert(math.abs(idxSum - 12.0) < 1e-9, s"index sum $idxSum")
    rows.foreach(r => assert(r._4 > 0 && !r._4.isNaN))
  }

  test("q194 HHI: bounds [1/n, 1], bps floor consistent") {
    val rows = run("q194_supplier_hhi")
      .select("n_name", "n_suppliers", "n_lines", "hhi", "hhi_bps")
      .as[(String, Long, Long, Double, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, ns, nl, hhi, bps) =>
      assert(hhi >= 1.0 / ns - 1e-12 && hhi <= 1.0, s"$n HHI range")
      assert(bps <= (hhi * 10000).round + 1 && bps >= 0, s"$n bps")
      assert(nl >= ns, s"$n at least one line per supplier")
    }
  }

  test("q195 Gini: range [0, 1), matches a direct mean-difference recompute") {
    val r = run("q195_gini_revenue")
      .select("n_customers", "total_cents", "gini")
      .as[(Long, Long, Double)].collect().head
    assert(r._3 >= 0.0 && r._3 < 1.0, s"gini ${r._3}")
    // direct O(n^2) recompute on the fixture: sum |xi - xj| / (2 n^2 mu)
    val cents = graft.ops.TestData.table(spark, sf, "orders")
      .groupBy("o_custkey")
      .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
        .as("c")).select("c").as[Long].collect()
    val n = cents.length.toLong
    val meanDiff = (for (a <- cents; b <- cents) yield math.abs(a - b)).map(BigInt(_)).sum
    val direct = meanDiff.toDouble / (2.0 * n * n * (cents.sum.toDouble / n))
    assert(math.abs(r._3 - direct) < 1e-9, s"${r._3} vs $direct")
  }

  test("q197 ACF: 7 lags, |acf| <= 1, matches a BigInt series replay") {
    val rows = run("q197_acf_daily")
      .select("lag", "n", "c", "a", "b", "acf")
      .as[(Long, Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1L to 7L), "exactly lags 1..7")
    rows.foreach(r => assert(math.abs(r._6) <= 1.0, s"|acf| > 1 at lag ${r._1}"))
    // independent replay: rebuild the gap-filled daily series locally
    // and recompute every moment in BigInt — the engine's windowed
    // moment algebra must match a direct definition-level computation
    val byDay = graft.ops.TestData.table(spark, sf, "orders")
      .select(to_date(col("o_orderdate")).as("d")).groupBy("d").count()
      .as[(java.sql.Date, Long)].collect()
      .map { case (d, c) => d.toLocalDate -> c }.toMap
    val (d0, d1) = (byDay.keys.min, byDay.keys.max)
    val series = Iterator.iterate(d0)(_.plusDays(1)).takeWhile(!_.isAfter(d1))
      .map(d => BigInt(byDay.getOrElse(d, 0L))).toVector
    val n = BigInt(series.length)
    val s = series.sum
    val qx = series.map(x => x * x).sum
    rows.foreach { case (lag, rn, rc, ra, rb, racf) =>
      val l = lag.toInt
      val head = series.dropRight(l)
      val tail = series.drop(l)
      assert(rn == n, "n mismatch")
      assert(BigInt(rc) == head.zip(tail).map { case (x, y) => x * y }.sum)
      assert(BigInt(ra) == head.sum && BigInt(rb) == tail.sum)
      val num = n * n * BigInt(rc) - n * s * (BigInt(ra) + BigInt(rb)) +
        (n - l) * s * s
      val den = n * (n * qx - s * s)
      assert(math.abs(racf - num.toDouble / den.toDouble) < 1e-15,
        s"acf mismatch at lag $l")
    }
  }

  test("q201 weekday residuals: 7 rows, day conservation, zero-sum trend") {
    val rows = run("q201_weekday_seasonality")
      .select("dow", "n_days", "resid7_sum", "mean_resid")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == (0L to 6L), "weekdays 0=Mon..6=Sun")
    // full-window days = calendar span minus 3 on each edge
    val span = graft.ops.TestData.table(spark, sf, "orders")
      .select(to_date(col("o_orderdate")).as("d"))
      .agg(datediff(max("d"), min("d"))).as[Int].collect().head + 1
    assert(rows.map(_._2).sum == span - 6, "day conservation")
    rows.foreach(r => assert(math.abs(r._4 - r._3.toDouble / (r._2 * 7)) < 1e-9))
    // the centered 7-day trend absorbs the weekly mean: residuals sum
    // to ~zero across weekdays (exactly zero up to calendar-edge terms)
    val total = rows.map(_._3).sum.toDouble
    val scale = rows.map(r => math.abs(r._3.toDouble)).sum.max(1.0)
    assert(math.abs(total) <= scale, s"trend left gross bias: $total")
  }

  test("q204 deletion impact: cascade counts match direct recomputation") {
    val rows = run("q204_deletion_impact")
      .select("table_name", "rows_total", "rows_affected", "share_bps")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(rows.keySet == Set("customer", "orders", "lineitem", "events"))
    val cust = graft.ops.TestData.table(spark, sf, "customer")
    val del = cust.where(pmod(col("c_custkey"), lit(97)) === 0)
      .select("c_custkey").as[Long].collect().toSet
    assert(rows("customer")._3 == del.size)
    val orders = graft.ops.TestData.table(spark, sf, "orders")
      .select("o_orderkey", "o_custkey").as[(Long, Long)].collect()
    val affOrders = orders.filter(o => del.contains(o._2)).map(_._1).toSet
    assert(rows("orders")._3 == affOrders.size)
    val liAff = graft.ops.TestData.table(spark, sf, "lineitem")
      .select("l_orderkey").as[Long].collect().count(affOrders.contains)
    assert(rows("lineitem")._3 == liAff)
    rows.values.foreach { r =>
      assert(r._3 <= r._2 && r._4 == r._3 * 10000 / r._2, s"accounting: $r")
    }
  }

  test("q207 correlations: bounded, exact moments match a BigInt replay") {
    val rows = run("q207_feature_corr")
      .select("f1", "f2", "n", "cov_num", "cov", "corr")
      .as[(String, String, Long, Long, Double, Double)].collect()
    assert(rows.length == 6 && rows.map(r => (r._1, r._2)).distinct.length == 6)
    val feats = graft.ops.TestData.table(spark, sf, "lineitem")
      .select(expr("CAST(l_quantity AS BIGINT)"),
        expr("CAST(floor(l_extendedprice / 100) AS BIGINT)"),
        expr("CAST(floor(l_discount * 10000 + 0.5) AS BIGINT)"),
        expr("CAST(floor(l_tax * 10000 + 0.5) AS BIGINT)"))
      .as[(Long, Long, Long, Long)].collect()
    val byName = Map[String, Seq[BigInt]](
      "qty" -> feats.map(f => BigInt(f._1)).toSeq,
      "price" -> feats.map(f => BigInt(f._2)).toSeq,
      "disc" -> feats.map(f => BigInt(f._3)).toSeq,
      "tax" -> feats.map(f => BigInt(f._4)).toSeq)
    val n = BigInt(feats.length)
    rows.foreach { case (f1, f2, rn, num, cov, corr) =>
      assert(rn == n, "n mismatch")
      val (xs, ys) = (byName(f1), byName(f2))
      val expect = n * xs.zip(ys).map { case (x, y) => x * y }.sum -
        xs.sum * ys.sum
      assert(BigInt(num) == expect, s"($f1,$f2) covariance numerator")
      assert(math.abs(cov - expect.toDouble / (n * n).toDouble) < 1e-9)
      assert(corr >= -1.0 - 1e-12 && corr <= 1.0 + 1e-12,
        s"($f1,$f2) corr $corr out of range")
    }
  }

  test("q209 LTV: cohorts partition customers, cumulative conserves revenue") {
    val rows = run("q209_cohort_ltv")
      .select("cohort", "month_index", "cohort_size", "rev_cents",
        "cum_rev_cents")
      .as[(String, Long, Long, Long, Long)].collect()
    val orders = graft.ops.TestData.table(spark, sf, "orders")
    // cohort sizes count each customer once
    val sizes = rows.groupBy(_._1).map { case (c, g) => (c, g.head._3) }
    assert(sizes.values.sum ==
      orders.select("o_custkey").distinct().count(), "customer partition")
    // final cumulative across cohorts equals total revenue cents
    val finals = rows.groupBy(_._1).map(_._2.maxBy(_._2)._5).sum
    val total = orders
      .select(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("c"))
      .agg(sum("c")).as[Long].collect().head
    assert(finals == total, s"revenue conservation: $finals vs $total")
    rows.groupBy(_._1).foreach { case (c, g) =>
      val sorted = g.sortBy(_._2)
      assert(sorted.head._2 == 0, s"$c starts at month 0")
      assert(sorted.map(_._5).zip(sorted.map(_._4))
        .foldLeft((true, 0L)) { case ((ok, acc), (cum, rev)) =>
          (ok && cum == acc + rev, acc + rev)
        }._1, s"$c cumulative accounting")
    }
  }

  test("q210 winsorize: thresholds ordered, tails exact vs local sort") {
    val r = run("q210_winsorize_audit")
      .select("n_orders", "p01_cents", "p99_cents", "n_below", "n_above",
        "lift_cents", "trim_cents")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    val cents = graft.ops.TestData.table(spark, sf, "orders")
      .select(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
      .as[Long].collect().sorted
    val n = cents.length.toLong
    assert(r._1 == n)
    val ilo = math.max(1L, n / 100)
    val ihi = n - n / 100
    assert(r._2 == cents((ilo - 1).toInt) && r._3 == cents((ihi - 1).toInt),
      "discrete percentile thresholds")
    assert(r._2 <= r._3 && r._4 == ilo - 1 && r._5 == n - ihi)
    val below = cents.take((ilo - 1).toInt)
    val above = cents.drop(ihi.toInt)
    assert(r._6 == below.map(r._2 - _).sum && r._6 >= 0, "lift mass")
    assert(r._7 == above.map(_ - r._3).sum && r._7 >= 0, "trim mass")
  }

  test("q211 uniqueness: orderkey is the key, distincts match recounts") {
    val rows = run("q211_key_uniqueness")
      .select("column_name", "n_rows", "n_distinct", "uniqueness_bps",
        "is_key")
      .as[(String, Long, Long, Long, Int)].collect().map(r => r._1 -> r).toMap
    val o = graft.ops.TestData.table(spark, sf, "orders")
    assert(rows("o_orderkey")._5 == 1, "orderkey must be a key")
    assert(rows("o_orderstatus")._5 == 0 && rows("o_orderpriority")._5 == 0)
    assert(rows("o_custkey")._3 == o.select("o_custkey").distinct().count())
    rows.values.foreach { r =>
      assert(r._3 <= r._2 && r._4 == r._3 * 10000 / r._2, s"accounting: $r")
      assert((r._5 == 1) == (r._3 == r._2), s"is_key consistency: $r")
    }
  }

  test("q215 Kendall: pair accounting, tau replayed from the top frame") {
    val r = run("q215_kendall_tau")
      .select("n_pairs", "nc", "nd", "tx", "ty", "txy", "tau_b")
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect().head
    assert(r._1 == r._2 + r._3 + r._4 + r._5 + r._6, "pairs partition")
    assert(r._7 >= -1.0 && r._7 <= 1.0)
    // replay from the same top-100 frame, brute force
    val top = graft.ops.TestData.table(spark, sf, "lineitem")
      .groupBy("l_partkey")
      .agg(sum(expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"))
        .as("rev"), sum(expr("CAST(l_quantity AS BIGINT)")).as("units"))
      .orderBy(col("rev").desc, col("l_partkey")).limit(100)
      .select("rev", "units").as[(Long, Long)].collect()
    var (nc, nd) = (0L, 0L)
    for (i <- top.indices; j <- (i + 1) until top.length) {
      val p = (top(i)._1 - top(j)._1) * (top(i)._2 - top(j)._2)
      if (p > 0) nc += 1 else if (p < 0) nd += 1
    }
    assert(r._2 == nc && r._3 == nd, s"(nc,nd) vs ($nc,$nd)")
  }

  test("q216 decayed value: halvings bound the raw total, ranking sane") {
    val rows = run("q216_decayed_value")
      .select("rnk", "o_custkey", "n_orders", "raw_cents", "decayed_cents")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1L to 20L))
    rows.foreach { r =>
      assert(r._5 <= r._4 && r._5 >= 0, s"decay bound: $r")
    }
    assert(rows.map(_._5).sliding(2).forall {
      case Array(a, b) => a >= b; case _ => true
    }, "ranked by decayed value")
    // a spot replay for the top customer
    val top = rows.head
    val o = graft.ops.TestData.table(spark, sf, "orders")
      .where(col("o_custkey") === top._2)
      .select(to_date(col("o_orderdate")).as("d"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("c"))
      .as[(java.sql.Date, Long)].collect()
    val dmax = graft.ops.TestData.table(spark, sf, "orders")
      .agg(max(to_date(col("o_orderdate")))).as[java.sql.Date].collect().head
    val expect = o.map { case (d, c) =>
      val k = java.time.temporal.ChronoUnit.DAYS
        .between(d.toLocalDate, dmax.toLocalDate) / 30
      c >> math.min(k, 62L).toInt
    }.sum
    assert(top._5 == expect, s"top customer decay replay")
  }
}
