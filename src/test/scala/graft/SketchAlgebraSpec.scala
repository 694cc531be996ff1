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

  test("q179 item CF: per-item top-3, cosine bounds, symmetric scores") {
    val rows = run("q179_item_cf")
      .select("item", "rank", "neighbor", "pair_orders", "cosine")
      .as[(Long, Int, Long, Long, Double)].collect()
    rows.groupBy(_._1).foreach { case (item, g) =>
      val ranks = g.map(_._2).sorted.toSeq
      assert(ranks == (1 to g.length) && g.length <= 3, s"item $item ranks")
      val cs = g.sortBy(_._2).map(_._5)
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b },
        s"item $item cosine order")
    }
    rows.foreach(r => assert(r._5 > 0 && r._5 <= 1.0 + 1e-12, s"cosine ${r._5}"))
    // symmetry of the underlying score: if j is i's neighbor, the pair
    // score is identical when seen from j (even if rank differs)
    val byPair = rows.map(r => ((r._1, r._3), r._5)).toMap
    byPair.foreach { case ((i, j), c) =>
      byPair.get((j, i)).foreach(c2 => assert(c == c2, s"($i,$j) score"))
    }
  }

  test("q180 market share: shares in [0,1], consistent with totals") {
    val rows = run("q180_market_share")
      .select("o_year", "region_rev", "total_rev", "share")
      .as[(Int, Double, Double, Double)].collect().sortBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (y, r, t, s) =>
      assert(r >= 0 && r <= t, s"year $y revenue bounds")
      assert(s >= 0.0 && s <= 1.0, s"year $y share $s")
      assert(s == r / t, s"year $y share recompute")
    }
  }

  test("q203 Poisson bootstrap: replicate totals bracket the true total") {
    val rows = run("q203_poisson_bootstrap")
      .select("b", "n_eff", "total_cents").as[(Long, Long, Long)].collect()
    assert(rows.map(_._1).sorted.toSeq == (1L to 32L), "32 replicates")
    val truth = graft.ops.TestData.table(spark, sf, "orders")
      .select(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("c"))
      .agg(sum("c")).as[Long].collect().head
    val n = graft.ops.TestData.table(spark, sf, "orders").count()
    // Poisson(1) weights: each replicate is an unbiased resample of the
    // total; at n ~ 1.5k rows the relative sd is a few percent
    rows.foreach { case (b, ne, tc) =>
      assert(math.abs(tc - truth).toDouble / truth < 0.2, s"replicate $b far: $tc vs $truth")
      assert(math.abs(ne - n).toDouble / n < 0.2, s"replicate $b n_eff $ne vs $n")
    }
    val mean = rows.map(_._3).sum.toDouble / rows.length
    assert(math.abs(mean - truth) / truth < 0.05,
      s"replicate mean $mean vs truth $truth")
    // determinism: the hash-derived draws are a pure function of keys
    val again = run("q203_poisson_bootstrap")
      .select("b", "n_eff", "total_cents").as[(Long, Long, Long)].collect()
    assert(rows.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("q212 LSH planner: exact replay, monotone in sim, band tradeoff") {
    val rows = run("q212_lsh_planner")
      .select("bands", "rows_per_band", "sim", "p_detect")
      .as[(Long, Long, Double, Double)].collect()
    assert(rows.length == 76)
    rows.foreach { case (b, r, sim, p) =>
      assert(b * r == 16, "signature budget")
      // same-association Scala replay must be bit-identical
      def pw(x: Double, k: Long): Double = k match {
        case 1 => x
        case 2 => x * x
        case 4 => (x * x) * (x * x)
        case 8 => ((x * x) * (x * x)) * ((x * x) * (x * x))
        case 16 =>
          (((x * x) * (x * x)) * ((x * x) * (x * x))) *
            (((x * x) * (x * x)) * ((x * x) * (x * x)))
      }
      assert(p == 1.0 - pw(1.0 - pw(sim, r), b), s"replay ($b,$r,$sim)")
      assert(p >= 0.0 && p <= 1.0)
    }
    // detection is monotone in similarity within a config
    rows.groupBy(r => (r._1, r._2)).foreach { case (cfg, g) =>
      val ps = g.sortBy(_._3).map(_._4)
      assert(ps.sliding(2).forall { case Array(a, b) => a <= b; case _ => true },
        s"$cfg not monotone")
    }
    // at low similarity, more bands of fewer rows detect MORE (the
    // false-positive side of the banding tradeoff), and the order
    // reverses nowhere below the crossover
    val low = rows.filter(_._3 == 0.25).sortBy(_._2).map(_._4)
    assert(low.sliding(2).forall { case Array(a, b) => a >= b; case _ => true },
      "banding tradeoff at s=0.25")
  }

  test("q213 Neyman: integer weights replay, allocation sums to ~budget") {
    val rows = run("q213_neyman_allocation")
      .select("source", "n_docs", "w", "alloc_bps")
      .as[(String, Long, Long, Long)].collect()
    val docs = graft.ops.TestData.table(spark, sf, "documents")
      .select("source", "n_chars").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => BigInt(r._2))).toMap
    assert(rows.map(_._1).toSet == docs.keySet)
    val totalW = rows.map(_._3).sum
    rows.foreach { case (src, n, w, bps) =>
      val xs = docs(src)
      val rad = BigInt(xs.length) * xs.map(x => x * x).sum -
        xs.sum * xs.sum
      assert(BigInt(n) == xs.length && w >= 0, src)
      assert(BigInt(w) * BigInt(w) <= rad &&
        (BigInt(w) + 1) * (BigInt(w) + 1) > rad, s"$src isqrt")
      assert(bps == w * 10000 / totalW, s"$src allocation")
    }
    val allocSum = rows.map(_._4).sum
    assert(allocSum <= 10000 && allocSum > 10000 - rows.length,
      s"allocation accounting: $allocSum")
  }

  test("q214 collisions: monotone in buckets, B=256 replayed locally") {
    val rows = run("q214_hashing_collisions")
      .select("n_buckets", "n_types", "occupied", "collided_types",
        "collided_types_bps", "collided_df")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(256L, 1024L, 4096L, 16384L))
    assert(rows.map(_._2).distinct.length == 1, "type count is B-free")
    rows.foreach { r =>
      assert(r._3 <= math.min(r._1, r._2) && r._4 <= r._2 && r._6 >= r._4)
      assert(r._5 == r._4 * 10000 / r._2)
    }
    assert(rows.map(_._4).sliding(2).forall {
      case Array(a, b) => a >= b; case _ => true
    }, "more buckets, fewer collisions")
    // local replay at B=256 from the shingle type frame
    val types = graft.ops.DedupOps
      .hashedShingles(graft.ops.TestData.table(spark, sf, "documents"))
      .groupBy("s").count().as[(Long, Long)].collect()
    val byBkt = types.groupBy(_._1 % 256)
    val collided = byBkt.values.filter(_.length > 1)
    assert(rows.head._3 == byBkt.size &&
      rows.head._4 == collided.map(_.length).sum &&
      rows.head._6 == collided.flatMap(_.map(_._2)).sum, "B=256 replay")
  }
}
