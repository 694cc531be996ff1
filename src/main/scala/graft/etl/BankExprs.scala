package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.schema.Thresholds._

/** The reference's record-level derivations as pure Catalyst Column
  * expressions — every one stays inside whole-stage codegen (no UDFs).
  *
  * Each function cites the reference implementation it reproduces
  * (`bp.py` = `/root/reference/batch_processing/batch_pipeline1.py`).
  */
object BankExprs {

  /** Generic `_calculate_score` (bp.py:255-259): first ascending bound with
    * value <= bound wins; otherwise the `inf` bucket score.
    */
  def piecewiseLe(value: Column, bounds: Seq[(Double, Int)], otherwise: Int): Column =
    bounds.foldRight(lit(otherwise): Column) { case ((bound, score), rest) =>
      when(value <= lit(bound), lit(score)).otherwise(rest)
    }

  /** E1 `age_group` (bp.py:176-180). */
  def ageGroup(age: Column): Column =
    when(age < 30, "young").when(age < 50, "middle_aged").otherwise("senior")

  /** E2 `wealth_segment` — strict > thresholds (bp.py:183-188). */
  def wealthSegment(balance: Column): Column =
    when(balance > HighNetWorthBalance, "high_net_worth")
      .when(balance > MassAffluentBalance, "mass_affluent")
      .otherwise("mass_market")

  /** E3 `contact_day_type` — day-of-month % 7 heuristic, NOT calendar
    * (bp.py:191). `day` is 1-31 so % == pmod here.
    */
  def contactDayType(day: Column): Column =
    when((day % 7).isin(0, 6), "weekend").otherwise("weekday")

  /** E4 `has_loans` (bp.py:194). */
  def hasLoans(housing: Column, loan: Column): Column =
    (housing === "yes") || (loan === "yes")

  /** E5 `engagement_score` (bp.py:197-203). Negative inputs are NOT clamped
    * at 0 (min() only caps above), so the score can go negative; `least`
    * reproduces that. Term order matches the Python dict-sum order.
    */
  def engagementScore(previous: Column, campaign: Column, duration: Column, y: Column): Column =
    (least(previous, lit(10)) / lit(10.0)
      + least(campaign, lit(10)) / lit(10.0)
      + least(duration, lit(1000)) / lit(1000.0)
      + when(y === "yes", 1.0).otherwise(0.0)) / lit(4.0)

  /** R1 recency score over `pdays` (bp.py:24-31,228). */
  def recencyScore(pdays: Column): Column =
    piecewiseLe(pdays, RecencyScores, RecencyElse)

  /** R2 frequency score over `previous` (bp.py:32-38,229). */
  def frequencyScore(previous: Column): Column =
    piecewiseLe(previous, FrequencyScores, FrequencyElse)

  /** R3 monetary score over `balance` (bp.py:39-45,230). */
  def monetaryScore(balance: Column): Column =
    piecewiseLe(balance, MonetaryScores, MonetaryElse)

  /** R4 `rfm_scores` JSON string, byte-compatible with Python
    * `json.dumps(..., default separators (', ', ': '))` (bp.py:233-237).
    */
  def rfmScoresJson(r: Column, f: Column, m: Column): Column =
    concat(lit("{\"recency\": "), r.cast("string"),
      lit(", \"frequency\": "), f.cast("string"),
      lit(", \"monetary\": "), m.cast("string"), lit("}"))

  /** R5 `customer_segment` from avg of the three scores (bp.py:240-241,
    * 261-269).
    */
  def customerSegmentFromAvg(avgScore: Column): Column =
    when(avgScore >= 4, "premium")
      .when(avgScore >= 3, "high_value")
      .when(avgScore >= 2, "medium_value")
      .otherwise("low_value")

  def customerSegment(r: Column, f: Column, m: Column): Column =
    customerSegmentFromAvg((r + f + m) / lit(3.0))
}
