package graft

import org.apache.spark.sql.functions._
import graft.etl.BankExprs

/** Breakpoint-exact tables transcribed from the reference constants
  * (bp.py:19-45) — every boundary value on both sides.
  */
class BankExprsSpec extends SparkSpec {
  import spark.implicits._

  private def eval1(in: Seq[Int], expr: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Seq[Any] =
    in.toDF("v").select(expr(col("v"))).collect().map(_.get(0)).toSeq

  test("recency score breakpoints (bp.py:24-31)") {
    val pdays = Seq(-5, -1, 0, 7, 8, 30, 31, 90, 91, 180, 181, 10000)
    val want = Seq(1, 1, 5, 5, 4, 4, 3, 3, 2, 2, 1, 1)
    assert(eval1(pdays, BankExprs.recencyScore) == want)
  }

  test("frequency score breakpoints (bp.py:32-38)") {
    val previous = Seq(-1, 0, 3, 4, 5, 6, 7, 8, 10, 11)
    val want = Seq(2, 2, 2, 3, 3, 4, 4, 5, 5, 1)
    assert(eval1(previous, BankExprs.frequencyScore) == want)
  }

  test("monetary score breakpoints — >50000 scores 1, not 5 (bp.py:39-45)") {
    val balance = Seq(-100.0, 0.0, 5000.0, 5000.01, 10000.0, 10000.01,
      25000.0, 25000.01, 50000.0, 50000.01, 1e9)
    val want = Seq(2, 2, 2, 3, 3, 4, 4, 5, 5, 1, 1)
    val got = balance.toDF("v").select(BankExprs.monetaryScore(col("v")))
      .collect().map(_.getInt(0)).toSeq
    assert(got == want)
  }

  test("age group boundaries (bp.py:176-180)") {
    val got = eval1(Seq(18, 29, 30, 49, 50, 100), BankExprs.ageGroup)
    assert(got == Seq("young", "young", "middle_aged", "middle_aged",
      "senior", "senior"))
  }

  test("wealth segment strict thresholds (bp.py:183-188)") {
    val got = Seq(10000.0, 10000.01, 50000.0, 50000.01, -5.0)
      .toDF("v").select(BankExprs.wealthSegment(col("v")))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("mass_market", "mass_affluent", "mass_affluent",
      "high_net_worth", "mass_market"))
  }

  test("contact day type: day%7 in {0,6}, a heuristic not a calendar (bp.py:191)") {
    val weekend = Seq(6, 7, 13, 14, 20, 21, 27, 28)
    val weekday = (1 to 31).filterNot(weekend.contains)
    assert(eval1(weekend, BankExprs.contactDayType).forall(_ == "weekend"))
    assert(eval1(weekday, BankExprs.contactDayType).forall(_ == "weekday"))
  }

  test("engagement score: negative inputs NOT clamped below (bp.py:197-203)") {
    val df = Seq((-1, 0, 0, "no"), (10, 10, 1000, "yes"), (4, 12, 300, "no"))
      .toDF("previous", "campaign", "duration", "y")
    val got = df.select(BankExprs.engagementScore(col("previous"),
      col("campaign"), col("duration"), col("y"))).collect()
      .map(_.getDouble(0)).toSeq
    assert(got(0) == (-0.1 + 0.0 + 0.0 + 0.0) / 4.0) // negative factor
    assert(got(1) == 1.0)                            // all clamps at max
    assert(got(2) == (0.4 + 1.0 + 0.3 + 0.0) / 4.0)
  }

  test("customer segment from avg score (bp.py:261-269)") {
    val cases = Seq(
      (5, 4, 3, "premium"),      // avg 4.0 -> >= 4
      (4, 4, 3, "high_value"),   // avg 3.67
      (3, 3, 3, "high_value"),   // avg 3.0 boundary
      (2, 2, 2, "medium_value"), // avg 2.0 boundary
      (1, 2, 2, "low_value"))    // avg 1.67
    val df = cases.map(c => (c._1, c._2, c._3)).toDF("r", "f", "m")
    val got = df.select(BankExprs.customerSegment(col("r"), col("f"),
      col("m"))).collect().map(_.getString(0)).toSeq
    assert(got == cases.map(_._4))
  }

  test("rfm json matches Python json.dumps byte layout (bp.py:233-237)") {
    val got = Seq((1, 2, 3)).toDF("r", "f", "m")
      .select(BankExprs.rfmScoresJson(col("r"), col("f"), col("m")))
      .head().getString(0)
    assert(got == """{"recency": 1, "frequency": 2, "monetary": 3}""")
  }
}
