package graft

import org.apache.spark.sql.functions._

/** Behavioral laws for the scorecard batch (q165-q167). The DuckDB
  * oracle pins exact values; these pin the accounting identities that
  * must hold on any corpus: bin counts total to the population, lift
  * of the full population is exactly 1.0, and the Benford expectation
  * column is a probability distribution times N.
  */
class ScorecardSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q165 bins partition the population; odds ratios are finite") {
    val rows = run("q165_scorecard_odds")
      .select("goods", "bads", "n", "response_rate", "odds_ratio")
      .as[(Long, Long, Long, Double, Double)].collect()
    val total = graft.ops.TestData.bankFrame(spark, sf).count()
    assert(rows.map(_._3).sum == total, "bin n must sum to population")
    rows.foreach { case (g, b, n, rate, or) =>
      assert(g + b == n, "goods + bads = n")
      assert(rate >= 0.0 && rate <= 1.0)
      assert(!or.isNaN && !or.isInfinite,
        s"odds ratio must be finite on this fixture (g=$g b=$b)")
    }
  }

  test("q166 cumulative accounting: monotone bands, full-population lift exactly 1.0") {
    val rows = run("q166_decile_lift")
      .select("band", "n", "responders", "cum_n", "cum_resp", "cum_lift")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
      .sortBy(_._1)
    // at tiny SF the top score band can be empty (duration caps below
    // 1080 when custkey < 155), so require a contiguous range ending
    // at band 10, not all ten bands
    val bands = rows.map(_._1).toSeq
    assert(bands == (bands.head to 10L), s"contiguous bands ending at 10: $bands")
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._4 == a._4 + b._2, "cum_n telescopes")
        assert(b._5 == a._5 + b._3, "cum_resp telescopes")
      case _ =>
    }
    // (R*N)/(N*R) is the SAME product divided by itself -> IEEE-exact 1.0
    assert(rows.last._6 == 1.0, "full-population cumulative lift")
    // lift is a ratio of positive counts everywhere (the synthetic
    // score is ~independent of y, so no directional claim holds — the
    // oracle pins the exact values; here only finiteness/positivity)
    rows.foreach(r => assert(r._6 > 0 && !r._6.isNaN && !r._6.isInfinite))
  }

  test("q167 Benford audit: digits 1..9 cover all orders, expectations sum to N") {
    val rows = run("q167_benford_audit")
      .select("digit", "observed", "expected", "chi_term")
      .as[(Int, Long, Double, Double)].collect()
    assert(rows.map(_._1).sorted.toSeq.forall((1 to 9).contains))
    val orders = graft.ops.TestData.table(spark, sf, "orders").count()
    assert(rows.map(_._2).sum == orders, "every order has a first digit")
    // sum_d log10(1+1/d) == log10(10) == 1, so expectations sum to ~N
    assert(math.abs(rows.map(_._3).sum - orders) < 1e-6 * orders)
    rows.foreach { case (_, _, e, chi) =>
      assert(e > 0 && chi >= 0.0 && !chi.isNaN)
    }
  }

  test("q205 calibration: buckets partition customers, rates bounded") {
    val rows = run("q205_score_calibration")
      .select("bucket", "n", "n_yes", "mean_pred", "actual_rate")
      .as[(Long, Long, Long, Double, Double)].collect().sortBy(_._1)
    val bank = graft.ops.TestData.bankFrame(spark, sf)
    assert(rows.map(_._2).sum == bank.count(), "buckets partition customers")
    assert(rows.map(_._3).sum ==
      bank.where(col("y") === "yes").count(), "yes conservation")
    rows.foreach { r =>
      assert(r._1 >= 0 && r._1 <= 9, s"bucket range: $r")
      assert(r._4 >= -0.1 && r._4 <= 1.0, s"mean_pred range: $r")
      assert(r._5 >= 0.0 && r._5 <= 1.0 && r._3 <= r._2, s"rate range: $r")
    }
    // mean predicted score rises with the bucket index by construction
    rows.map(_._4).sliding(2).foreach {
      case Array(a, b) => assert(a < b, "bucket means must increase")
      case _ =>
    }
  }
}
