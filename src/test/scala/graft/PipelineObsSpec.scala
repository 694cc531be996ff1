package graft

import org.apache.spark.sql.functions._
import graft.ops.TestData

/** Behavioral invariants for the pipeline-observability catalog
  * (q141-q145). The DuckDB oracle pins exact values; these pin the
  * structural laws that hold on ANY corpus: funnel mass conservation
  * and monotone survivors, the z-test's integer inequality, drift share
  * bounds, lateness-band consistency, and the curriculum's per-source
  * dense ranking.
  */
class PipelineObsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q141 funnel conserves docs; survivors monotone; kept = survivors") {
    val rows = run("q141_filter_funnel")
      .select("stage_idx", "stage", "n_docs", "survivors_after", "share_bps")
      .as[(Int, String, Long, Long, Long)].collect().sortBy(_._1)
    val total = TestData.table(spark, sf, "documents").count()
    assert(rows.map(_._3).sum == total, "stage counts must partition corpus")
    val survivors = rows.filter(_._2 != "kept").map(_._4)
    survivors.sliding(2).withFilter(_.length == 2).foreach { w =>
      assert(w(1) <= w(0),
        "survivors must be non-increasing through the funnel")
    }
    val kept = rows.find(_._2 == "kept").get
    assert(kept._4 == kept._3,
      "after the last gate, survivors == kept docs")
    rows.foreach { r =>
      assert(r._5 == r._3 * 10000 / total, s"share_bps wrong at ${r._2}")
    }
  }

  test("q142 every flagged hour satisfies the integer z>3 inequality") {
    val rows = run("q142_rate_anomaly")
      .select("user_id", "cnt", "active_hours", "total_events",
        "z_num", "z_den9")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty, "fixture corpus must surface some anomalies")
    rows.foreach { case (u, cnt, n, s1, zn, zd) =>
      assert(n >= 4, s"user $u flagged with < 4 active hours")
      assert(n * cnt > s1, s"user $u: flagged hour not above its own mean")
      assert(zn > zd, s"user $u: z_num must exceed 9*variance term")
      assert(zn == (n * cnt - s1) * (n * cnt - s1),
        s"user $u: z_num inconsistent with published moments")
    }
  }

  test("q143 drift shares bounded and near-conserving") {
    val rows = run("q143_snapshot_drift")
      .select("event_type", "n_first", "n_second", "share1_bps",
        "share2_bps", "drift_bps")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    val total = TestData.table(spark, sf, "events").count()
    assert(rows.map(r => r._2 + r._3).sum == total,
      "halves must partition the event stream")
    // each half's shares sum to 10000 up to one floor-rounding unit/type
    val s1 = rows.map(_._4).sum
    val s2 = rows.map(_._5).sum
    assert(s1 <= 10000 && s1 > 10000 - rows.length,
      s"first-half shares sum $s1 out of floor-rounding band")
    assert(s2 <= 10000 && s2 > 10000 - rows.length,
      s"second-half shares sum $s2 out of floor-rounding band")
    rows.foreach(r => assert(r._6 == r._5 - r._4, "drift inconsistent"))
  }

  test("q144 lateness bands conserve events and agree with max lateness") {
    val rows = run("q144_lateness_audit")
      .select("event_type", "band", "n_events", "max_late_s")
      .as[(String, String, Long, Long)].collect()
    val total = TestData.table(spark, sf, "events").count()
    assert(rows.map(_._3).sum == total, "bands must partition all events")
    val bounds = Map("1_on_time" -> (0L, 0L), "2_within_1m" -> (1L, 60L),
      "3_within_5m" -> (61L, 300L), "4_within_1h" -> (301L, 3600L),
      "5_late" -> (3601L, Long.MaxValue))
    rows.foreach { case (t, band, _, maxLate) =>
      val (lo, hi) = bounds(band)
      assert(maxLate >= lo && maxLate <= hi,
        s"$t/$band: max lateness $maxLate outside band bounds")
    }
  }

  test("q145 curriculum ranks densely per source and interleaves") {
    val rows = run("q145_curriculum_interleave")
      .select("doc_id", "source", "uniq_bps", "src_rank", "src_idx")
      .as[(Long, String, Long, Int, Int)].collect()
    val total = TestData.table(spark, sf, "documents").count()
    assert(rows.length == total, "curriculum must order every doc")
    rows.groupBy(_._2).foreach { case (src, g) =>
      val ranks = g.map(_._4).sorted
      assert(ranks.toSeq == (1 to g.length).toSeq,
        s"$src: src_rank not dense 1..n")
      // within a source, rank follows uniq_bps desc (doc_id tiebreak)
      val byRank = g.sortBy(_._4)
      byRank.sliding(2).withFilter(_.length == 2).foreach { w =>
        val (a, b) = (w(0), w(1))
        assert(a._3 > b._3 || (a._3 == b._3 && a._1 < b._1),
          s"$src: rank order violates (uniq_bps desc, doc_id)")
      }
    }
    // output order is the round-robin interleave key
    val key = rows.map(r => (r._4, r._5))
    assert(key.toSeq == key.sortBy(identity).toSeq,
      "output must be ordered by (src_rank, src_idx)")
    val nSources = rows.map(_._2).distinct.length
    assert(rows.take(nSources).forall(_._4 == 1),
      "first wave must be every source's rank-1 doc")
  }

  test("q148 flags only non-benchmark docs with real fingerprint hits") {
    val rows = run("q148_partial_contamination")
      .select("doc_id", "n_shared_fps", "n_bench_docs", "exact_dup")
      .as[(Long, Long, Long, Int)].collect()
    assert(rows.nonEmpty, "fixture corpus must surface some contamination")
    rows.foreach { case (d, fps, bdocs, dup) =>
      assert(d % 97 != 0, s"doc $d: benchmark docs cannot self-flag")
      assert(fps >= 1 && bdocs >= 1, s"doc $d: flagged without a hit")
      assert(dup == 0 || dup == 1)
    }
  }

  test("q149 confusion report conserves docs and bounds tp") {
    val rows = run("q149_langid_confusion")
      .select("lang", "n_true", "n_pred", "tp", "precision_bps",
        "recall_bps")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    val total = TestData.table(spark, sf, "documents").count()
    assert(rows.map(_._2).sum == total, "true supports must cover corpus")
    assert(rows.map(_._3).sum <= total,
      "labeled-pred volume cannot exceed corpus (unknown preds excluded)")
    rows.foreach { case (l, nt, np, tp, p, r) =>
      assert(tp <= nt, s"$l: tp above true support")
      assert(tp <= np, s"$l: tp above predicted volume")
      assert(p == tp * 10000 / math.max(np, 1L), s"$l: precision formula")
      assert(r == tp * 10000 / nt, s"$l: recall formula")
    }
  }

  test("q150 manifest conserves docs and is rerun-deterministic") {
    val a = run("q150_shard_manifest").collect()
    val b = run("q150_shard_manifest").collect()
    assert(a.toSeq == b.toSeq, "manifest must be bit-stable across runs")
    val rows = run("q150_shard_manifest")
      .select("shard", "n_docs", "total_tokens", "total_bytes")
      .as[(Int, Long, Long, Long)].collect()
    val total = TestData.table(spark, sf, "documents").count()
    assert(rows.map(_._2).sum == total, "shards must partition the corpus")
    assert(rows.forall(r => r._1 >= 0 && r._1 < 16))
    assert(rows.forall(r => r._3 > 0 && r._4 > 0))
  }
}
