package graft

import org.apache.spark.sql.functions._
import graft.ops.TestData

/** Behavioral laws for the round-7 additions (q156-q160). The DuckDB
  * oracle pins exact values; these pin the SEMANTIC contracts that must
  * hold on any corpus: sketch-estimate bounds and mergeability, weighted
  * sampling bias, Jaccard bounds, Borda consistency, and CDC
  * last-writer-wins totality.
  */
class EnsembleSamplingSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q156 KMV estimates are exact below k and within 3 RSD at k") {
    val rows = run("q156_kmv_distinct")
      .select("scope", "n_sketch", "hk", "exact_users", "kmv_est", "err_bps")
      .as[(String, Long, Long, Long, Double, Long)].collect()
    assert(rows.map(_._1).contains("__union__"))
    rows.foreach { case (scope, n, hk, exact, est, errBps) =>
      assert(n <= 64 && hk > 0, scope)
      if (n < 64) {
        // sketch holds the whole scope: the estimate IS the exact count
        assert(est == exact.toDouble && errBps == 0, s"$scope: $est vs $exact")
      } else {
        // KMV RSD is ~1/sqrt(k-2) ~= 12.7% at k=64; 3 sigma is the
        // "sketch is not broken" bound, deterministic on the fixture
        assert(errBps < 3 * 1270, s"$scope: err $errBps bps vs 3 RSD")
      }
    }
    // union row dominates every per-type scope in exact cardinality
    val union = rows.find(_._1 == "__union__").get
    rows.filter(_._1 != "__union__").foreach { r =>
      assert(r._4 <= union._4, s"${r._1} exact above union")
    }
  }

  test("q156 union sketch equals a sketch built directly on the union") {
    // Mergeability: bottom-64 of the per-type sketch VALUES must equal
    // bottom-64 of all distinct user hashes — the property that lets
    // executors sketch shards independently.
    val direct = TestData.table(spark, sf, "events")
      .select(graft.ops.DedupOps.md5Long60(col("user_id").cast("string"))
        .as("h")).distinct()
      .orderBy("h").limit(64)
      .agg(count(lit(1)).as("n"), max("h").as("hk"))
      .as[(Long, Long)].collect().head
    val merged = run("q156_kmv_distinct")
      .where(col("scope") === "__union__")
      .select("n_sketch", "hk").as[(Long, Long)].collect().head
    assert(merged == direct, s"merged $merged vs direct $direct")
  }

  test("q157 weighted sample: per-source size, ordering, and weight bias") {
    val rows = run("q157_weighted_sample")
      .select("source", "doc_id", "n_chars", "priority", "rank")
      .as[(String, Long, Long, Long, Int)].collect()
    val corpusMean = TestData.table(spark, sf, "documents")
      .agg(avg("n_chars")).as[Double].collect().head
    rows.groupBy(_._1).foreach { case (src, rs) =>
      assert(rs.length == 16, s"$src: ${rs.length} rows, want 16")
      assert(rs.map(_._5).sorted.toSeq == (1 to 16), s"$src ranks")
      // priority nondecreasing in rank (bottom-k order law)
      rs.sortBy(_._5).map(_._4).sliding(2).foreach {
        case Array(a, b) => assert(a <= b, s"$src priority order")
        case _ =>
      }
    }
    // weight-proportional bias: priorities shrink with n_chars, so the
    // sample must skew heavier than the corpus (deterministic on the
    // seeded fixture; a uniform sampler would sit at the corpus mean)
    val sampleMean = rows.map(_._3).sum.toDouble / rows.length
    assert(sampleMean > corpusMean,
      s"sample mean $sampleMean not above corpus mean $corpusMean")
  }

  test("q157 is rerun-deterministic") {
    val a = run("q157_weighted_sample").collect().map(_.toSeq).toSeq
    val b = run("q157_weighted_sample").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("q158 neighbor similarity: bounds, edge membership, ordering") {
    val rows = run("q158_neighbor_similarity")
      .select("u", "v", "du", "dv", "common", "jaccard_bps")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val edges = graft.ops.WarehouseOps.coPurchasePairs(spark, sf)
      .as[(Long, Long)].collect().toSet
    rows.foreach { case (u, v, du, dv, common, j) =>
      assert(u < v && edges.contains((u, v)), s"($u,$v) not a graph edge")
      assert(du >= 3 && dv >= 3, "degree floor violated")
      // common neighbors can never exceed either endpoint's degree
      // minus the edge partner itself
      assert(common >= 1 && common <= math.min(du, dv) - 1, s"($u,$v)")
      assert(j >= 0 && j <= 10000, s"($u,$v) jaccard $j out of bps range")
      assert(j == common * 10000 / (du + dv - common), s"($u,$v) formula")
    }
    assert(rows.map(_._6).sliding(2).forall {
      case Array(a, b) => a >= b; case _ => true
    }, "not descending by jaccard_bps")
  }

  test("q159 Borda leaderboard: per-source shape and rank consistency") {
    val rows = run("q159_quality_ensemble")
      .select("source", "doc_id", "r_uniq", "r_alpha", "r_len", "borda", "rank")
      .as[(String, Long, Int, Int, Int, Long, Int)].collect()
    val perSourceDocs = TestData.table(spark, sf, "documents")
      .groupBy("source").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    rows.groupBy(_._1).foreach { case (src, rs) =>
      assert(rs.length == math.min(10L, perSourceDocs(src)), s"$src size")
      assert(rs.map(_._7).sorted.toSeq == (1 to rs.length), s"$src ranks")
      rs.foreach { r =>
        assert(r._6 == r._3.toLong + r._4 + r._5, s"$src borda sum")
        assert(r._3 >= 1 && r._4 >= 1 && r._5 >= 1 &&
          r._3 <= perSourceDocs(src) && r._4 <= perSourceDocs(src) &&
          r._5 <= perSourceDocs(src), s"$src rank bounds")
      }
      // borda nondecreasing in leaderboard rank
      rs.sortBy(_._7).map(_._6).sliding(2).foreach {
        case Array(a, b) => assert(a <= b, s"$src borda order")
        case _ =>
      }
    }
  }

  test("q161 IVM audit: merge equals recompute everywhere, mass conserved") {
    val rows = run("q161_ivm_audit")
      .select("event_type", "day", "n_merged", "cents_merged",
        "n_match", "cents_match")
      .as[(String, Long, Long, Long, Int, Int)].collect()
    val ev = TestData.table(spark, sf, "events")
    assert(rows.nonEmpty)
    // the audit's whole claim: the merged view matches the recompute on
    // EVERY (type, day) cell
    assert(rows.forall(r => r._5 == 1 && r._6 == 1), "a merge diverged")
    // cell domain = the raw grain's distinct (type, day); counts conserve
    val cells = ev.select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct().count()
    assert(rows.length == cells)
    assert(rows.map(_._3).sum == ev.count(), "merged counts drop events")
  }

  test("q162 bitmap overlap: diagonal identity, bounds, exact Jaccard") {
    val rows = run("q162_bitmap_overlap")
      .select("scope_a", "scope_b", "users_a", "users_b", "inter_users",
        "union_users", "jaccard_bps")
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
    val types = TestData.table(spark, sf, "events")
      .select("event_type").distinct().count()
    assert(rows.count(r => r._1 == r._2) == types,
      "every type needs its diagonal row")
    rows.foreach { case (a, b, ua, ub, inter, union, j) =>
      assert(a <= b, s"($a,$b) not ordered")
      if (a == b) {
        // a set intersected with itself IS the set
        assert(inter == ua && ua == ub && union == ua && j == 10000, s"($a,$b)")
      } else {
        assert(inter >= 1 && inter <= math.min(ua, ub), s"($a,$b) inter")
        assert(union == ua + ub - inter && union >= math.max(ua, ub), s"($a,$b)")
        assert(j == inter * 10000 / union && j < 10000 || inter == union,
          s"($a,$b) jaccard")
      }
    }
  }

  test("q163 pigeonhole banding loses no Hamming<=3 pair (exact recall)") {
    // truth = brute-force popcount over all signature pairs; the banded
    // candidate join must reproduce it exactly — the pigeonhole
    // guarantee (<=3 differing bits cannot touch all 4 bands)
    val out = run("q163_simhash_hamming")
      .select("d1", "d2", "hamming").as[(Long, Long, Long)].collect().toSet
    // recompute signatures independently of the banding path
    val sigs = TestData.table(spark, sf, "documents")
      .select(col("doc_id"),
        explode(split(col("text"), " ")).as("w"))
      .select(col("doc_id"), graft.ops.DedupOps.md5Long60(col("w")).as("h"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).map { case (d, hs) =>
        var sig = 0L
        for (j <- 0 until 60) {
          val bal = hs.map(r => if (((r._2 >> j) & 1L) == 1L) 1 else -1).sum
          if (bal > 0) sig |= (1L << j)
        }
        d -> sig
      }
    val ids = sigs.keys.toSeq.sorted
    val truth = (for {
      i <- ids.indices.iterator; j <- (i + 1) until ids.length
      h = java.lang.Long.bitCount(sigs(ids(i)) ^ sigs(ids(j))).toLong
      if h <= 3
    } yield (ids(i), ids(j), h)).toSet
    assert(truth.nonEmpty, "fixture has no near-dup signatures to test")
    assert(out == truth,
      s"banding lost/invented pairs: ${(truth diff out) ++ (out diff truth)}")
  }

  test("q164 span corruption: per-block mask arithmetic and determinism") {
    val rows = run("q164_span_corruption")
      .select("doc_id", "n_tokens", "n_masked", "mask_bps", "n_spans",
        "masked_digest")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    val nDocs = TestData.table(spark, sf, "documents").count()
    assert(rows.length == nDocs)
    rows.foreach { case (d, n, masked, bps, spans, _) =>
      val fullBlocks = n / 20
      // every FULL 20-token block masks exactly 3 tokens (offset <= 17,
      // so the 3-span always fits); the partial tail block adds 0..3
      assert(masked >= 3 * fullBlocks && masked <= 3 * fullBlocks + 3,
        s"doc $d: $masked masked for $n tokens")
      assert(spans >= fullBlocks && spans <= fullBlocks + 1, s"doc $d spans")
      assert(bps == masked * 10000 / n, s"doc $d bps")
    }
    // corpus noise density lands at ~15% (3/20): tail blocks subtract
    // (span clipped) or add (3 masked of < 20 tokens) a little
    val density = rows.map(_._3).sum.toDouble / rows.map(_._2).sum
    assert(density > 0.12 && density < 0.18, s"density $density")
    // rerun-deterministic (hash-derived mask, no RNG state)
    val again = run("q164_span_corruption")
      .select("doc_id", "masked_digest").as[(Long, Long)].collect().toMap
    rows.foreach { r => assert(again(r._1) == r._6, s"doc ${r._1} digest") }
  }

  test("q160 CDC net state: last-writer-wins totality and tombstones") {
    val out = run("q160_cdc_net_state")
      .select("user_id", "last_event_id", "n_changes", "n_deletes")
      .as[(Long, Long, Long, Long)].collect()
    val ev = TestData.table(spark, sf, "events")
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts) div 1000000").as("ts_s"),
        (col("event_type") === "error").as("del"))
      .as[(Long, Long, Long, Boolean)].collect()
    val byUser = ev.groupBy(_._1)
    // independent replay: every user whose LAST change (by ts, event_id)
    // is an upsert appears exactly once with that event; tombstoned
    // users are absent
    val expected = byUser.flatMap { case (u, es) =>
      val last = es.maxBy(e => (e._3, e._2))
      if (last._4) None else Some(u -> last._2)
    }
    assert(out.map(r => r._1 -> r._2).toMap == expected)
    out.foreach { case (u, _, nChanges, nDeletes) =>
      assert(nChanges == byUser(u).length, s"user $u change count")
      assert(nDeletes == byUser(u).count(_._4), s"user $u delete count")
    }
  }
}
