package graft.ops

import org.apache.spark.sql.functions._
import TestData._

/** Data-governance audits over the hosted banking frame — the checks a
  * training-data release runs before records (or features derived from
  * them) leave the warehouse.
  *
  * Scale notes: k-anonymity is ONE map-combinable groupBy over the
  * quasi-identifier tuple (the equivalence-class frame is bounded by
  * the QI domain product, not the corpus), then a constant-size band
  * rollup; l-diversity rides the same class frame with one extra
  * distinct-count. Nothing here is corpus-quadratic and nothing
  * collects to the driver.
  */
object GovernanceOps {

  def all: Map[String, Q] = Map(

    // k-anonymity audit over the quasi-identifier tuple
    //   (age_group, job, marital, education):
    // every record in an equivalence class of size k is
    // re-identifiable at confidence 1/k, so the release report is the
    // k-histogram — how many classes (and how many RECORDS) sit at
    // k=1 / k=2-4 / k=5-9 / k>=10 — plus the class-size extremes per
    // band. The k<5 bands are the suppression candidates.
    "q217_k_anonymity" -> Q(
      (s, dir) => {
        val qi = bankFrame(s, dir).select(
          when(col("age") < 30, "young")
            .when(col("age") < 50, "middle_aged")
            .otherwise("senior").as("age_group"),
          col("job"), col("marital"), col("education"))
        val classes = qi
          .groupBy("age_group", "job", "marital", "education")
          .agg(count(lit(1)).as("k"))
        classes
          .select(
            when(col("k") === 1, "k=1")
              .when(col("k") < 5, "k=2-4")
              .when(col("k") < 10, "k=5-9")
              .otherwise("k>=10").as("band"),
            col("k"))
          .groupBy("band")
          .agg(count(lit(1)).as("n_classes"), sum("k").as("n_records"),
            min("k").as("min_k"), max("k").as("max_k"))
          .orderBy("band")
      },
      Some(bankCte +
        """, cls AS (SELECT """ + ageGroupSql("age") + """ AS age_group,
          |     job, marital, education, CAST(count(*) AS BIGINT) AS k
          |   FROM bank GROUP BY 1, 2, 3, 4),
          | b AS (SELECT CASE WHEN k = 1 THEN 'k=1' WHEN k < 5 THEN 'k=2-4'
          |     WHEN k < 10 THEN 'k=5-9' ELSE 'k>=10' END AS band, k
          |   FROM cls)
          | SELECT band, CAST(count(*) AS BIGINT) AS n_classes,
          |   CAST(sum(k) AS BIGINT) AS n_records,
          |   CAST(min(k) AS BIGINT) AS min_k,
          |   CAST(max(k) AS BIGINT) AS max_k
          | FROM b GROUP BY band ORDER BY band"""
          .stripMargin.replace("\n", ""))),

    // l-diversity companion to q217: k-anonymity alone falls to the
    // homogeneity attack (a k=50 class where all 50 share y='yes'
    // leaks y without re-identification). Per equivalence class:
    // l = distinct sensitive values (y), c_max = majority count. The
    // rollup groups classes by l and reports the worst majority share
    // seen at each l. Two nested map-combinable aggregates over the
    // bounded (QI x y) domain — nothing corpus-sized survives stage 1.
    "q225_l_diversity" -> Q(
      (s, dir) => {
        val qiy = bankFrame(s, dir).select(
          when(col("age") < 30, "young")
            .when(col("age") < 50, "middle_aged")
            .otherwise("senior").as("age_group"),
          col("job"), col("marital"), col("education"), col("y"))
        val cells = qiy
          .groupBy("age_group", "job", "marital", "education", "y")
          .agg(count(lit(1)).as("c"))
        val classes = cells
          .groupBy("age_group", "job", "marital", "education")
          .agg(sum("c").as("k"), count(lit(1)).as("l"),
            max("c").as("c_max"))
        classes.groupBy("l")
          .agg(count(lit(1)).as("n_classes"), sum("k").as("n_records"),
            max((col("c_max").cast("double") / col("k").cast("double")))
              .as("max_majority_share"))
          .orderBy("l")
      },
      Some(bankCte +
        """, cells AS (SELECT """ + ageGroupSql("age") + """ AS age_group,
          |     job, marital, education, y, CAST(count(*) AS BIGINT) AS c
          |   FROM bank GROUP BY 1, 2, 3, 4, 5),
          | cls AS (SELECT age_group, job, marital, education,
          |     CAST(sum(c) AS BIGINT) AS k, CAST(count(*) AS BIGINT) AS l,
          |     CAST(max(c) AS BIGINT) AS c_max
          |   FROM cells GROUP BY 1, 2, 3, 4)
          | SELECT l, CAST(count(*) AS BIGINT) AS n_classes,
          |   CAST(sum(k) AS BIGINT) AS n_records,
          |   max(CAST(c_max AS DOUBLE) / CAST(k AS DOUBLE)) AS max_majority_share
          | FROM cls GROUP BY l ORDER BY l"""
          .stripMargin.replace("\n", ""))),

    // Generalization-ladder audit: how much k-anonymity each coarsening
    // of the age attribute buys — level 0 keeps exact age in the QI,
    // level 1 generalizes to the 3-band age_group, level 2 suppresses
    // age entirely. Per level: class count, worst k, and the
    // suppression cost that remains (classes and records still below
    // k=5). The release decision reads this table top-down and stops
    // at the first level whose records_lt5 is acceptable. Three
    // bounded-domain aggregates unioned — each a single
    // map-combinable pass.
    "q226_generalization_ladder" -> Q(
      (s, dir) => {
        val base = bankFrame(s, dir).select(col("age"),
          when(col("age") < 30, "young")
            .when(col("age") < 50, "middle_aged")
            .otherwise("senior").as("age_group"),
          col("job"), col("marital"), col("education"))
        def level(lvl: Int, ageCol: org.apache.spark.sql.Column) = base
          .select(ageCol.as("age_qi"), col("job"), col("marital"),
            col("education"))
          .groupBy("age_qi", "job", "marital", "education")
          .agg(count(lit(1)).as("k"))
          .agg(count(lit(1)).as("n_classes"), min("k").as("min_k"),
            sum(when(col("k") < 5, 1L).otherwise(0L)).as("classes_lt5"),
            sum(when(col("k") < 5, col("k")).otherwise(0L))
              .as("records_lt5"))
          .select(lit(lvl).cast("int").as("level"), col("n_classes"),
            col("min_k"), col("classes_lt5"), col("records_lt5"))
        level(0, col("age").cast("string"))
          .unionByName(level(1, col("age_group")))
          .unionByName(level(2, lit("*")))
          .orderBy("level")
      },
      Some(bankCte +
        s""", l0 AS (SELECT CAST(age AS VARCHAR) AS age_qi, job, marital, education,
          |     CAST(count(*) AS BIGINT) AS k FROM bank GROUP BY 1, 2, 3, 4),
          | l1 AS (SELECT ${ageGroupSql("age")} AS age_qi, job, marital, education,
          |     CAST(count(*) AS BIGINT) AS k FROM bank GROUP BY 1, 2, 3, 4),
          | l2 AS (SELECT '*' AS age_qi, job, marital, education,
          |     CAST(count(*) AS BIGINT) AS k FROM bank GROUP BY 1, 2, 3, 4),
          | r0 AS (SELECT CAST(0 AS INT) AS level, CAST(count(*) AS BIGINT) AS n_classes,
          |     CAST(min(k) AS BIGINT) AS min_k,
          |     CAST(sum(CASE WHEN k < 5 THEN 1 ELSE 0 END) AS BIGINT) AS classes_lt5,
          |     CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT) AS records_lt5 FROM l0),
          | r1 AS (SELECT CAST(1 AS INT), CAST(count(*) AS BIGINT),
          |     CAST(min(k) AS BIGINT),
          |     CAST(sum(CASE WHEN k < 5 THEN 1 ELSE 0 END) AS BIGINT),
          |     CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT) FROM l1),
          | r2 AS (SELECT CAST(2 AS INT), CAST(count(*) AS BIGINT),
          |     CAST(min(k) AS BIGINT),
          |     CAST(sum(CASE WHEN k < 5 THEN 1 ELSE 0 END) AS BIGINT),
          |     CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT) FROM l2)
          | SELECT * FROM r0 UNION ALL SELECT * FROM r1 UNION ALL SELECT * FROM r2
          | ORDER BY level""".stripMargin.replace("\n", "")))
  )
}
