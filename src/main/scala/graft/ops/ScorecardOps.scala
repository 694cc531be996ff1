package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import TestData._

/** Credit-scorecard analytics over the hosted bank frame plus a
  * first-digit (Benford) audit over `orders` — the model-evaluation
  * queries a bank's analytics team runs downstream of the reference
  * pipeline (bp.py enriches and segments; these grade the segments).
  *
  * Cross-engine exactness: the house rule (no libm `ln` — see
  * ExtendedOps q54 note) shapes all three queries. q165 reports
  * odds RATIOS instead of log-WOE (monotone-equivalent, rational
  * arithmetic: one integer product per side, one IEEE division).
  * q166's lift is likewise (cumR*N)/(cumN*R) on exact longs. q167's
  * Benford expectations come from a 9-entry LUT baked at build time
  * into BOTH plans (Spark `lit`, DuckDB correctly-rounded
  * string->DOUBLE casts — the q124 HLL-LUT precedent).
  *
  * Scale notes: all three are single-shuffle partial aggregations;
  * grand totals ride a broadcast 1-row (or 9/10-row) frame, never a
  * global window over row-level data. q166 deliberately bins by fixed
  * score BANDS (duration div 120) rather than population ntile(10):
  * exact population deciles need a global sort (single-partition
  * window — the one plan shape that cannot survive 100 TB), while
  * fixed bands partition-agg cleanly and are standard scorecard
  * practice; the 10-row cumulative window after aggregation is free.
  */
object ScorecardOps {

  /** log10(1 + 1/d) for d = 1..9, shared verbatim by both engines. */
  private val benfordP: Seq[(Int, Double)] =
    (1 to 9).map(d => d -> math.log10(1.0 + 1.0 / d))

  private def benfordValues: String =
    benfordP.map { case (d, p) =>
      s"($d, CAST('${java.lang.Double.toString(p)}' AS DOUBLE))"
    }.mkString(", ")

  def all: Map[String, Q] = Map(

    // Scorecard bin audit: response and odds ratio per (job, marital)
    // bin vs the y='yes' target. odds_ratio = (goods_i * B) / (bads_i
    // * G) — the exponential of the bin's weight-of-evidence, ranked
    // identically, exact across engines (bigint products fit: counts
    // < 2^31, products < 2^62).
    "q165_scorecard_odds" -> Q(
      (s, dir) => {
        val bins = bankFrame(s, dir).groupBy("job", "marital").agg(
          sum(when(col("y") === "yes", 1L).otherwise(0L)).as("goods"),
          sum(when(col("y") === "no", 1L).otherwise(0L)).as("bads"),
          count(lit(1)).as("n"))
        val tot = bins.agg(sum("goods").as("g_tot"), sum("bads").as("b_tot"))
        bins.crossJoin(broadcast(tot))
          .select(col("job"), col("marital"), col("goods"), col("bads"),
            col("n"),
            (col("goods").cast("double") / col("n").cast("double"))
              .as("response_rate"),
            ((col("goods") * col("b_tot")).cast("double") /
              (col("bads") * col("g_tot")).cast("double")).as("odds_ratio"))
          .orderBy("job", "marital")
      },
      Some(bankCte +
        """, bins AS (SELECT job, marital,
          |  CAST(sum(CASE WHEN y = 'yes' THEN 1 ELSE 0 END) AS BIGINT) AS goods,
          |  CAST(sum(CASE WHEN y = 'no' THEN 1 ELSE 0 END) AS BIGINT) AS bads,
          |  CAST(count(*) AS BIGINT) AS n FROM bank GROUP BY job, marital),
          | tot AS (SELECT CAST(sum(goods) AS BIGINT) AS g_tot,
          |  CAST(sum(bads) AS BIGINT) AS b_tot FROM bins)
          | SELECT job, marital, goods, bads, n,
          |  CAST(goods AS DOUBLE) / CAST(n AS DOUBLE) AS response_rate,
          |  CAST(goods * b_tot AS DOUBLE) / CAST(bads * g_tot AS DOUBLE) AS odds_ratio
          | FROM bins, tot ORDER BY job, marital"""
          .stripMargin.replace("\n", ""))),

    // Gains/lift table over fixed score bands: duration (the synthetic
    // propensity score, 0..1199) div 120 -> 10 bands, band 1 = top
    // scores. cum_lift = (cumResp * N) / (cumN * R): exact longs, one
    // IEEE division; the full-population band is exactly 1.0.
    "q166_decile_lift" -> Q(
      (s, dir) => {
        val bands = bankFrame(s, dir)
          .select((lit(10L) - expr("CAST(duration AS BIGINT) div 120")).as("band"),
            when(col("y") === "yes", 1L).otherwise(0L).as("resp"))
          .groupBy("band")
          .agg(count(lit(1)).as("n"), sum("resp").as("responders"))
        val w = Window.orderBy("band")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.orderBy("band")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        bands
          .withColumn("cum_n", sum("n").over(w))
          .withColumn("cum_resp", sum("responders").over(w))
          .withColumn("n_tot", sum("n").over(wAll))
          .withColumn("r_tot", sum("responders").over(wAll))
          .select(col("band"), col("n"), col("responders"),
            (col("responders").cast("double") / col("n").cast("double"))
              .as("resp_rate"),
            col("cum_n"), col("cum_resp"),
            ((col("cum_resp") * col("n_tot")).cast("double") /
              (col("cum_n") * col("r_tot")).cast("double")).as("cum_lift"))
          .orderBy("band")
      },
      Some(bankCte +
        """, bands AS (SELECT 10 - CAST(duration AS BIGINT) // 120 AS band,
          |  CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(CASE WHEN y = 'yes' THEN 1 ELSE 0 END) AS BIGINT) AS responders
          | FROM bank GROUP BY 1),
          | cum AS (SELECT band, n, responders,
          |  CAST(sum(n) OVER (ORDER BY band) AS BIGINT) AS cum_n,
          |  CAST(sum(responders) OVER (ORDER BY band) AS BIGINT) AS cum_resp,
          |  CAST(sum(n) OVER () AS BIGINT) AS n_tot,
          |  CAST(sum(responders) OVER () AS BIGINT) AS r_tot FROM bands)
          | SELECT band, n, responders,
          |  CAST(responders AS DOUBLE) / CAST(n AS DOUBLE) AS resp_rate,
          |  cum_n, cum_resp,
          |  CAST(cum_resp * n_tot AS DOUBLE) / CAST(cum_n * r_tot AS DOUBLE) AS cum_lift
          | FROM cum ORDER BY band"""
          .stripMargin.replace("\n", ""))),

    // First-digit (Benford) audit over order totals: observed count per
    // leading digit vs N * log10(1+1/d), with the per-digit chi-square
    // term. The digit comes from the BIGINT's decimal rendering (both
    // engines render integers identically); floor() first because
    // DuckDB's double->BIGINT cast rounds where Spark's truncates.
    "q167_benford_audit" -> Q(
      (s, dir) => {
        val obs = table(s, dir, "orders")
          .select(substring(floor(col("o_totalprice")).cast("string"), 1, 1)
            .cast("int").as("digit"))
          .groupBy("digit").agg(count(lit(1)).as("observed"))
        val lut = benfordP.foldLeft(lit(null).cast("double")) {
          case (acc, (d, p)) => when(col("digit") === d, lit(p)).otherwise(acc)
        }
        obs.crossJoin(broadcast(obs.agg(sum("observed").as("total"))))
          .withColumn("expected", col("total").cast("double") * lut)
          .select(col("digit"), col("observed"), col("expected"),
            ((col("observed").cast("double") - col("expected")) *
              (col("observed").cast("double") - col("expected")) /
              col("expected")).as("chi_term"))
          .orderBy("digit")
      },
      Some(
        s"""WITH lut(digit, p) AS (VALUES $benfordValues),
          | obs AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,
          |  CAST(count(*) AS BIGINT) AS observed FROM orders GROUP BY 1),
          | tot AS (SELECT CAST(sum(observed) AS BIGINT) AS total FROM obs),
          | e AS (SELECT digit, observed, CAST(total AS DOUBLE) * p AS expected
          |  FROM obs JOIN lut USING (digit), tot)
          | SELECT digit, observed, expected,
          |  (CAST(observed AS DOUBLE) - expected) * (CAST(observed AS DOUBLE) - expected) / expected AS chi_term
          | FROM e ORDER BY digit"""
          .stripMargin.replace("\n", ""))),

    // Chi-square independence audit for the (job x y) contingency
    // table: expected cell = row_total * col_total / N — exact BIGINT
    // product into one IEEE division — and the per-cell chi term in the
    // q167 arithmetic shape. Emitting per-cell terms (not the summed
    // statistic) keeps the output free of unordered double summation.
    // One pass over the frame + two marginal re-aggregations of the
    // 15-cell table.
    "q184_chi2_independence" -> Q(
      (s, dir) => {
        val cells = bankFrame(s, dir).groupBy("job", "y")
          .agg(count(lit(1)).as("observed"))
          .localCheckpoint(eager = true)
        val rowTot = cells.groupBy("job").agg(sum("observed").as("row_tot"))
        val colTot = cells.groupBy("y").agg(sum("observed").as("col_tot"))
        val n = cells.agg(sum("observed").as("n_tot"))
        cells.join(rowTot, "job").join(colTot, "y")
          .crossJoin(broadcast(n))
          .withColumn("expected",
            (col("row_tot") * col("col_tot")).cast("double") /
              col("n_tot").cast("double"))
          .select(col("job"), col("y"), col("observed"), col("row_tot"),
            col("col_tot"), col("expected"),
            ((col("observed").cast("double") - col("expected")) *
              (col("observed").cast("double") - col("expected")) /
              col("expected")).as("chi_term"))
          .orderBy("job", "y")
      },
      Some(bankCte +
        """, cells AS (SELECT job, y, CAST(count(*) AS BIGINT) AS observed
          |   FROM bank GROUP BY job, y),
          | rt AS (SELECT job, CAST(sum(observed) AS BIGINT) AS row_tot
          |   FROM cells GROUP BY job),
          | ct AS (SELECT y, CAST(sum(observed) AS BIGINT) AS col_tot
          |   FROM cells GROUP BY y),
          | n AS (SELECT CAST(sum(observed) AS BIGINT) AS n_tot FROM cells),
          | e AS (SELECT job, y, observed, row_tot, col_tot,
          |     CAST(row_tot * col_tot AS DOUBLE) / CAST(n_tot AS DOUBLE) AS expected
          |   FROM cells JOIN rt USING (job) JOIN ct USING (y), n)
          | SELECT job, y, observed, row_tot, col_tot, expected,
          |   (CAST(observed AS DOUBLE) - expected) * (CAST(observed AS DOUBLE) - expected)
          |     / expected AS chi_term
          | FROM e ORDER BY job, y"""
          .stripMargin.replace("\n", ""))),

    // Score-calibration reliability diagram: bucket customers by the
    // BEHAVIORAL part of the reference's engagement score and compare
    // each bucket's mean predicted score to its observed subscription
    // rate — the diagram an ML-eval pipeline draws before trusting a
    // score as a probability. The y term is deliberately EXCLUDED from
    // the predictor (the reference folds the label into its score,
    // bp.py:201 — faithful elsewhere, but calibrating a score against
    // a label it contains is leakage, so the diagram uses the leak-free
    // part). Integer exactness: the scaled predictor E = 100*least(
    // previous,10) + 100*least(campaign,10) + least(duration,1000) is
    // the reference arithmetic times 3000 with the label term dropped;
    // buckets are E div 300 clamped to [0,9], every aggregate is
    // BIGINT, and the two IEEE divisions are the final per-bucket
    // means. One pass + a 10-row frame.
    "q205_score_calibration" -> Q(
      (s, dir) => {
        val e = expr("100 * least(previous, 10) + 100 * least(campaign, 10)" +
          " + least(duration, 1000)")
        bankFrame(s, dir)
          .select(e.cast("bigint").as("e"),
            when(col("y") === "yes", 1L).otherwise(0L).as("yy"))
          .select(greatest(lit(0L), least(lit(9L), expr("e div 300")))
            .as("bucket"), col("e"), col("yy"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n"), sum("e").as("e_sum"),
            sum("yy").as("n_yes"))
          .select(col("bucket"), col("n"), col("n_yes"),
            (col("e_sum").cast("double") /
              (col("n") * 3000).cast("double")).as("mean_pred"),
            (col("n_yes").cast("double") / col("n").cast("double"))
              .as("actual_rate"))
          .orderBy("bucket")
      },
      Some(bankCte +
        """, sc AS (SELECT
          |   CAST(100 * least(previous, 10) + 100 * least(campaign, 10)
          |     + least(duration, 1000) AS BIGINT) AS e,
          |   CASE WHEN y = 'yes' THEN 1 ELSE 0 END AS yy FROM bank),
          | b AS (SELECT greatest(0, least(9, e // 300)) AS bucket, e, yy FROM sc),
          | g AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n,
          |     CAST(sum(e) AS BIGINT) AS e_sum,
          |     CAST(sum(yy) AS BIGINT) AS n_yes
          |   FROM b GROUP BY bucket)
          | SELECT bucket, n, n_yes,
          |   CAST(e_sum AS DOUBLE) / CAST(n * 3000 AS DOUBLE) AS mean_pred,
          |   CAST(n_yes AS DOUBLE) / CAST(n AS DOUBLE) AS actual_rate
          | FROM g ORDER BY bucket"""
          .stripMargin.replace("\n", ""))),

    // Cellwise contingency residuals for (source x lang): where q184's
    // chi-square says THAT the corpus mix is skewed, the standardized
    // residual (obs - exp)/sqrt(exp) per cell says WHERE — which
    // source over/under-supplies which language. One corpus rollup to
    // the bounded cell frame; margins ride windows over those cells
    // (no second scan); exp and the residual are fixed double
    // expressions over exact BIGINTs.
    "q239_contingency_residuals" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val cells = table(s, dir, "documents")
          .groupBy("source", "lang").agg(count(lit(1)).as("obs"))
        val wAll = Window.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)
        val wRow = Window.partitionBy("source").rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)
        val wCol = Window.partitionBy("lang").rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)
        cells
          .withColumn("row_total", sum("obs").over(wRow))
          .withColumn("col_total", sum("obs").over(wCol))
          .withColumn("total", sum("obs").over(wAll))
          .select(col("source"), col("lang"), col("obs"),
            ((col("row_total") * col("col_total")).cast("double") /
              col("total").cast("double")).as("expected"))
          .select(col("source"), col("lang"), col("obs"), col("expected"),
            ((col("obs").cast("double") - col("expected")) /
              sqrt(col("expected"))).as("std_residual"))
          .orderBy("source", "lang")
      },
      Some(
        """WITH cells AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS obs
          |   FROM documents GROUP BY 1, 2),
          | m AS (SELECT source, lang, obs,
          |     CAST(sum(obs) OVER (PARTITION BY source) AS BIGINT) AS row_total,
          |     CAST(sum(obs) OVER (PARTITION BY lang) AS BIGINT) AS col_total,
          |     CAST(sum(obs) OVER () AS BIGINT) AS total FROM cells),
          | e AS (SELECT source, lang, obs,
          |     CAST(row_total * col_total AS DOUBLE) / CAST(total AS DOUBLE) AS expected
          |   FROM m)
          | SELECT source, lang, obs, expected,
          |   (CAST(obs AS DOUBLE) - expected) / sqrt(expected) AS std_residual
          | FROM e ORDER BY source, lang"""
          .stripMargin.replace("\n", "")))
  )
}
