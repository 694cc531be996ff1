package graft

import org.apache.spark.sql.functions._
import graft.ops.{DedupOps, TestData}

/** Behavioral invariants for the round-5 warehouse / graph / PQ
  * additions (q113-q120). The DuckDB oracle pins exact values; these
  * specs pin the SEMANTIC contracts that must hold for any corpus —
  * interval partitioning, gap-fill totality, rank mass conservation,
  * ADC ranking laws — plus hand-computed fixed-point PageRank on a
  * tiny injected graph (the one case small enough to verify by hand).
  */
class WarehouseGraphSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q113 SCD2 intervals partition each customer's history") {
    val rows = run("q113_scd2_history")
      .select("o_custkey", "valid_from", "valid_to", "is_current", "n_orders")
      .as[(Long, Long, Long, Int, Long)].collect()
    val byCust = rows.groupBy(_._1)
    val orderCounts = TestData.table(spark, sf, "orders")
      .groupBy("o_custkey").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    byCust.foreach { case (cust, rs) =>
      // chained: row i's valid_to == row i+1's valid_from, last is open
      rs.sliding(2).foreach {
        case Array(a, b) => assert(a._3 == b._2,
          s"gap/overlap in customer $cust: ${a._3} != ${b._2}")
        case _ =>
      }
      assert(rs.last._3 == -1L && rs.last._4 == 1,
        s"customer $cust last interval not open/current")
      assert(rs.init.forall(_._4 == 0), s"customer $cust has >1 current")
      assert(rs.map(_._5).sum == orderCounts(cust),
        s"customer $cust run sizes don't sum to order count")
    }
  }

  test("q114 resample covers the full hourly span with total forward fill") {
    val rows = run("q114_resample_fill")
      .select("user_id", "hour_epoch", "n_events", "is_gap", "value_ffill")
      .as[(Long, Long, Long, Int, Double)].collect()
    rows.groupBy(_._1).foreach { case (u, rs) =>
      val hours = rs.map(_._2)
      assert(hours.max - hours.min == 3600L * (rs.length - 1) &&
        hours.distinct.length == rs.length,
        s"user $u grid is not a dense hourly sequence")
      assert(rs.minBy(_._2)._4 == 0, s"user $u first hour cannot be a gap")
      rs.foreach { r =>
        assert((r._4 == 1) == (r._3 == 0L), s"user $u is_gap/n_events disagree")
        assert(!r._5.isNaN, s"user $u has unfilled value")
      }
    }
  }

  test("q115 MAD statistics are internally consistent") {
    val rows = run("q115_mad_outliers")
      .select("o_orderpriority", "n", "med", "mad", "n_outliers", "max_abs_dev")
      .as[(String, Long, Double, Double, Long, Double)].collect()
    val sizes = TestData.table(spark, sf, "orders")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(rows.map(_._1).toSet == sizes.keySet)
    rows.foreach { r =>
      assert(r._2 == sizes(r._1))
      assert(r._4 >= 0 && r._6 >= r._4, s"${r._1}: mad/max_abs_dev order")
      assert(r._5 <= r._2 / 2, // an outlier set can never reach the median
        s"${r._1}: ${r._5} outliers of ${r._2} rows is not 'robust'")
    }
  }

  test("q116 PMI ranking is descending with the support floor applied") {
    val rows = run("q116_pmi_bigrams")
      .select("c_xy", "pmi_ratio").as[(Long, Double)].collect()
    assert(rows.nonEmpty && rows.length <= 100)
    assert(rows.forall(_._1 >= 5), "support floor violated")
    assert(rows.map(_._2).sliding(2).forall {
      case Array(a, b) => a >= b; case _ => true
    }, "pmi_ratio not descending")
  }

  test("q117 LM transition counts and probability bounds") {
    val rows = run("q117_lm_quality")
      .select("doc_id", "n_trans", "median_p", "min_p")
      .as[(Long, Long, Double, Double)].collect()
    val expected = TestData.table(spark, sf, "documents")
      .select(col("doc_id"), (size(split(col("text"), " ")) - 1).cast("long").as("n"))
      .where(col("n") >= 1).as[(Long, Long)].collect().toMap
    assert(rows.map(_._1).toSet == expected.keySet)
    rows.foreach { r =>
      assert(r._2 == expected(r._1), s"doc ${r._1} transition count")
      assert(r._4 > 0 && r._4 <= r._3 && r._3 <= 1.0,
        s"doc ${r._1}: probability bounds 0 < min <= median <= 1 violated")
    }
  }

  test("q118 fixed-point PageRank matches hand math on a path graph") {
    // 1 - 2 - 3: degrees (1, 2, 1). An independent in-test replay of
    // the integer recurrence (not a copy of the SQL/DataFrame code)
    // must agree exactly after every iteration count.
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("d1", "d2")
    val scale = 1000000000000L
    def replay(iters: Int): Map[Long, Long] = {
      val edges = Seq(1L -> 2L, 2L -> 3L, 2L -> 1L, 3L -> 2L)
      val deg = edges.groupBy(_._1).map { case (v, es) => v -> es.size.toLong }
      val n = deg.size
      val base = 15L * scale / (100L * n)
      var r = deg.map { case (v, _) => v -> scale / n }
      for (_ <- 1 to iters) {
        val contrib = edges.groupBy(_._2).map { case (dst, es) =>
          dst -> es.map { case (src, _) => r(src) / deg(src) }.sum
        }
        r = contrib.map { case (v, m) => v -> (base + (85L * m) / 100L) }
      }
      r
    }
    for (iters <- Seq(1, 3)) {
      val got = DedupOps.pageRank(pairs, iters)
        .select("doc_id", "rank_fp").as[(Long, Long)].collect().toMap
      assert(got == replay(iters), s"iters=$iters: $got vs ${replay(iters)}")
    }
  }

  test("q118 on the corpus: rank mass conserved, floor respected") {
    val rows = run("q118_pagerank")
      .select("doc_id", "deg", "rank_fp").as[(Long, Long, Long)].collect()
    val scale = 1000000000000L
    val n = rows.length
    val base = 15L * scale / (100L * n)
    val total = rows.map(_._3).sum
    // every floor division loses < 1 unit; 3 iterations over n nodes
    // and e edges lose a vanishing fraction of the 1e12 mass
    assert(total <= scale && total >= scale - 100L * n,
      s"mass $total drifted from $scale (n=$n)")
    assert(rows.forall(_._3 >= base), "a node fell below the teleport floor")
    val degrees = DedupOps
      .jaccardPairs(TestData.table(spark, sf, "documents"))
      .where(col("jaccard") >= 0.5)
      .select(explode(array(col("d1"), col("d2"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("deg"))
      .as[(Long, Long)].collect().toMap
    rows.foreach { r => assert(r._2 == degrees(r._1), s"degree of ${r._1}") }
  }

  test("q119 ADC output is a complete deterministic per-query ranking") {
    val out = run("q119_pq_adc_topk")
      .select("query_id", "rnk", "cand_id", "adist")
      .as[(Long, Int, Long, Double)].collect()
    val nq = TestData.table(spark, sf, "embeddings")
      .where(col("vec_id") % 100 === 0).count()
    assert(out.length == 5 * nq)
    out.groupBy(_._1).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to 5), s"query $q ranks")
      assert(sorted.map(_._4).sliding(2).forall {
        case Array(a, b) => a <= b; case _ => true
      }, s"query $q adist not nondecreasing")
      assert(rs.forall(_._4 >= 0) && rs.forall(_._3 != q))
    }
    // determinism: a second run (fresh seeds/codebooks) is identical
    val again = run("q119_pq_adc_topk")
      .select("query_id", "rnk", "cand_id", "adist")
      .as[(Long, Int, Long, Double)].collect()
    assert(out.sortBy(r => (r._1, r._2)).toSeq ==
      again.sortBy(r => (r._1, r._2)).toSeq)
  }

  test("q199 IVF ranking: complete, self-top, audit flags match brute force") {
    val out = run("q199_ivf_topk")
      .select("qid", "rnk", "vec_id", "dist2", "in_exact")
      .as[(Long, Int, Long, Double, Int)].collect()
    val vecs = TestData.table(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    val panel = vecs.keys.filter(_ % 250 == 0).toSeq.sorted
    assert(out.map(_._1).distinct.sorted.toSeq == panel,
      "one ranking per panel query")
    out.groupBy(_._1).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to 5), s"query $q ranks")
      // self is always in its own probed cell: rank 1, distance 0, hit
      assert(sorted.head._3 == q && sorted.head._4 == 0.0 &&
        sorted.head._5 == 1, s"query $q self row")
      assert(sorted.map(_._4).sliding(2).forall {
        case Array(a, b) => a <= b; case _ => true
      }, s"query $q dist2 not nondecreasing")
      // the audit flag must agree with a local brute-force exact top-5
      def d2(a: Seq[Double], b: Seq[Double]) =
        a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
          acc + (x - y) * (x - y) }
      val exact = vecs.toSeq
        .map { case (vid, v) => (d2(vecs(q), v), vid) }
        .sortBy(identity).take(5).map(_._2).toSet
      rs.foreach { r =>
        assert((r._5 == 1) == exact.contains(r._3),
          s"query $q candidate ${r._3} audit flag")
      }
      info(s"query $q recall@5 = ${rs.count(_._5 == 1)}/5")
    }
  }

  test("q198 golden records replay survivorship rules from the q64 clusters") {
    val rows = run("q198_golden_record")
      .select("cluster_id", "rep_doc_id", "n_members", "n_sources",
        "best_doc_id", "best_n_chars", "modal_lang")
      .as[(Long, Long, Long, Long, Long, Long, String)].collect()
    assert(rows.nonEmpty, "fixture corpus must contain near-dup clusters")
    val members = run("q64_dup_clusters")
      .select("doc_id", "cluster_id").as[(Long, Long)].collect()
      .groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val attrs = TestData.table(spark, sf, "documents")
      .select("doc_id", "source", "lang", "n_chars")
      .as[(Long, String, String, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows.map(_._1).toSet == members.keySet,
      "one golden record per q64 cluster")
    rows.foreach { r =>
      val ms = members(r._1).map(attrs)
      assert(r._2 == members(r._1).min && r._2 == r._1,
        s"rep/canonical label mismatch in cluster ${r._1}")
      assert(r._3 == ms.size, s"n_members in cluster ${r._1}")
      assert(r._4 == ms.map(_._2).size, s"n_sources in cluster ${r._1}")
      val best = ms.toSeq.sortBy(m => (-m._4, m._1)).head
      assert(r._5 == best._1 && r._6 == best._4,
        s"best-member rule in cluster ${r._1}")
      val modal = ms.toSeq.groupBy(_._3).toSeq
        .sortBy { case (l, g) => (-g.size, l) }.head._1
      assert(r._7 == modal, s"modal lang in cluster ${r._1}")
    }
  }

  test("q121 entity clusters are closed and canonically labeled") {
    val rows = run("q121_entity_resolution")
      .select("c_custkey", "entity_id", "cluster_size")
      .as[(Long, Long, Long)].collect()
    val byEntity = rows.groupBy(_._2)
    rows.foreach { r =>
      assert(r._2 <= r._1, s"entity label ${r._2} above member ${r._1}")
      assert(byEntity(r._2).length == r._3,
        s"cluster_size ${r._3} != actual ${byEntity(r._2).length}")
    }
    // the canonical id is itself a member of its cluster
    byEntity.foreach { case (e, members) =>
      assert(members.exists(_._1 == e), s"entity $e not among its members")
    }
  }

  test("q121 deletion-neighborhood blocking loses no Levenshtein<=2 pair") {
    // Fixture exercising every edit shape the FastSS guarantee covers:
    // 0/1/2 substitutions, insertions, deletions, mixed indel+sub, at
    // the head, middle, and tail — plus distance-3 near-misses that the
    // verifier must reject. Candidate source = equi-join on hashed
    // deletion variants; truth = brute-force all-pairs Levenshtein.
    val names = Seq(
      1L -> "Customer#000000001", 2L -> "Customer#000000002", // 1 sub
      3L -> "Customer#000010001", // 2 subs vs id 1
      4L -> "Customer#00000001", // 1 deletion vs id 1
      5L -> "XCustomer#000000001", // 1 insertion at head vs id 1
      6L -> "Customer#0000000012", // insertion at tail vs id 1
      7L -> "ustomer#00000000155", // distance >2 from all
      8L -> "Cstomer#00000001", // del head + del mid vs id 1 (ed 2)
      9L -> "abc", 10L -> "acb", 11L -> "a", 12L -> "abcde",
      13L -> "", 14L -> "ab")
    val df = names.toDF("id", "name")
    val truth = df.as("a").join(df.as("b"),
        $"a.id" < $"b.id" &&
          levenshtein($"a.name", $"b.name") <= 2)
      .select($"a.id".as("d1"), $"b.id".as("d2"))
      .as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty && truth.contains((1L, 2L)))
    val v = graft.ops.ExtendedOps.deletionVariants(df, "name", Seq("id"))
    val candidates = v.as("a").join(v.as("b"),
        $"a.vh" === $"b.vh" && $"a.id" < $"b.id")
      .select($"a.id".as("d1"), $"b.id".as("d2")).distinct()
      .as[(Long, Long)].collect().toSet
    assert(truth.subsetOf(candidates), // recall-complete: no pair lost
      s"lost true pairs: ${truth.diff(candidates)}")
    // and the verifier restores exactness: candidates can overshoot
    // (shared variants at ed 3-4), never undershoot
    assert(!truth.contains((1L, 7L)) && !candidates.contains((13L, 12L)))
  }

  test("q129/q152 results are identical with graph broadcasts off") {
    // The graphHint gate changes the PHYSICAL join strategy only; both
    // queries must stay green in both modes (VERDICT r6 #3).
    def collectBoth(name: String) = {
      val on = run(name).collect().map(_.toSeq).toSeq
      spark.conf.set("graft.broadcast_graph_frames", "false")
      try {
        val off = run(name).collect().map(_.toSeq).toSeq
        (on, off)
      } finally spark.conf.unset("graft.broadcast_graph_frames")
    }
    Seq("q129_triangle_count", "q152_kcore").foreach { name =>
      val (on, off) = collectBoth(name)
      assert(on.nonEmpty && on == off, s"$name diverges with the flag off")
    }
  }

  test("q124 HLL sketch state is internally consistent") {
    val rows = run("q124_hll_registers")
      .select("event_type", "exact_users", "hll_sum_scaled",
        "empty_registers", "hll_raw", "hll_estimate", "within_2p5_rsd")
      .as[(String, Long, Long, Int, Double, Double, Int)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, exact, s, v, raw, est, ok) =>
      assert(v >= 0 && v <= 256, s"$et: empty registers $v out of range")
      // the harmonic sum is at least the empties' contribution and at
      // most all 256 registers sitting at rho=0
      assert(s >= v.toLong * (1L << 53) && s <= 256L * (1L << 53), et)
      assert(raw > 0 && est > 0, et)
      // linear-counting branch taken exactly when the spec says so
      if (v > 0 && raw <= 640.0) assert(est != raw, s"$et: correction skipped")
      else assert(est == raw, s"$et: correction applied out of regime")
      // the sketch should be accurate on this data (flag is also
      // value-pinned by the oracle; this keeps the claim honest if the
      // testdata generator changes)
      assert(ok == 1, s"$et: estimate $est vs exact $exact outside 2.5 rsd")
    }
  }

  test("q122 OLS moments: positive spread, full coverage, exact ratio") {
    val rows = run("q122_trend_ols")
      .select("o_orderpriority", "n", "slope_num", "slope_den",
        "slope_dollars_per_day")
      .as[(String, Long, Long, Long, Double)].collect()
    val total = TestData.table(spark, sf, "orders").count()
    assert(rows.map(_._2).sum == total)
    rows.foreach { r =>
      assert(r._4 > 0, s"${r._1}: degenerate x spread")
      assert(r._5 == r._3.toDouble / r._4.toDouble, s"${r._1}: ratio")
    }
  }

  test("q123 histogram buckets cover every row within [0, 9]") {
    val rows = run("q123_value_histogram")
      .select("o_orderpriority", "bucket", "n")
      .as[(String, Int, Long)].collect()
    val sizes = TestData.table(spark, sf, "orders")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(rows.forall(r => r._2 >= 0 && r._2 <= 9))
    rows.groupBy(_._1).foreach { case (g, rs) =>
      assert(rs.map(_._3).sum == sizes(g), s"$g: histogram drops rows")
      assert(rs.map(_._2).distinct.length == rs.length, s"$g: dup buckets")
    }
  }

  test("q120 ORC round-trip digest equals the parquet-direct digest") {
    val direct = TestData.table(spark, sf, "documents")
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"),
        expr("bit_xor(cast(conv(substring(md5(text), 1, 15), 16, 10) as bigint))")
          .as("text_digest"))
      .select("source", "lang", "n_docs", "text_digest")
      .as[(String, String, Long, Long)].collect().toSet
    val viaOrc = run("q120_orc_roundtrip")
      .select("source", "lang", "n_docs", "text_digest")
      .as[(String, String, Long, Long)].collect().toSet
    assert(viaOrc == direct)
  }
}
