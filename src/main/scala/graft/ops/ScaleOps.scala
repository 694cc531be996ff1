package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.VectorFunctions
import SimilarityOps.cosine
import TestData._

/** Operators whose POINT is the 100 TB execution strategy, verified for
  * result-equivalence against the straightforward formulation:
  *
  *  - q39: two-phase salted aggregation — the skew pattern for hot keys
  *    (5 event types across 100k+ rows): phase 1 aggregates on
  *    (key, salt) so the hot key's rows spread over `Salts` reducers,
  *    phase 2 combines the partials. DECIMAL partials make the result
  *    exactly equal to the unsalted plain GROUP BY oracle.
  *
  *  - q40: IVF-style ANN — coarse quantization against a deterministic
  *    centroid set (first 16 vectors), then exact cosine only within the
  *    query's cell. Fully deterministic, so unlike the random-hyperplane
  *    LSH variant it IS oracle-checked end-to-end in DuckDB.
  */
object ScaleOps {

  private val Salts = 16
  private val NumCentroids = 16

  private val dotSql =
    "list_reduce(list_transform(list_zip(%s, %s), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)"

  /** Replication factor for the throughput query: sf0.01's 1,500
    * customers x 700 = 1.05M records — the reference's published
    * benchmark row count (README.md:133: 1M records in 252s).
    * Config-derived (`graft.etl.replication`) like `graft.tiles` and
    * `graft.kmeans.k`, defaulting to 700 to keep the published shape;
    * the registered oracle pins the DEFAULT — a session overriding the
    * factor steps outside the hash gate, and ScaleParamSpec pins the
    * exact linear-scaling invariant (counts and decimal-exact sums
    * scale by rep) at non-default values instead.
    */
  private val DefaultEtlReplication = 700

  private[graft] def etlReplication(s: org.apache.spark.sql.SparkSession): Int =
    graft.Levers.posInt(s, "graft.etl.replication", DefaultEtlReplication)

  def all: Map[String, Q] = Map(

    // Full 4-stage ETL over ~1M (sf0.01) / ~10M (sf0.1) records,
    // summarized per segment pair. Engagement is quantized to
    // DECIMAL(10,6) per row before summing so the aggregate is exact and
    // order-independent (double sums would not hash-match).
    "q41_etl_throughput" -> Q(
      (s, dir) => {
        val bank = TestData.bankFrame(s, dir)
        // Parallelism without a shuffle: the 32-partition range drives
        // the cross join and the tiny bank frame is broadcast, so the
        // replicated rows are born spread across all cores (a real
        // multi-split file read would look the same).
        val replicated = s.range(0, etlReplication(s), 1, 32)
          .select(col("id").as("rep"))
          .crossJoin(broadcast(bank))
          .drop("id", "rep")
        val res = graft.pipeline.BankingPipeline.fromTyped(replicated)
        res.processed
          .groupBy("customer_segment", "wealth_segment")
          .agg(count(lit(1)).as("n"),
            sum(col("engagement_score").cast(DecimalType(10, 6)))
              .cast(DecimalType(18, 6)).cast("double").as("engagement_sum"))
          .orderBy("customer_segment", "wealth_segment")
      },
      Some(TestData.bankCte +
        s""", rep AS (SELECT bank.* FROM bank, generate_series(1, $DefaultEtlReplication)),
           | v AS (SELECT * FROM rep WHERE age BETWEEN 18 AND 100),
           | scored AS (SELECT v.*, ${TestData.recencySql("pdays")} AS r,
           |   ${TestData.frequencySql("previous")} AS f,
           |   ${TestData.monetarySql("balance")} AS m FROM v)
           | SELECT ${TestData.segmentSql("(((r + f + m)) / 3.0)")} AS customer_segment,
           |   ${TestData.wealthSql("balance")} AS wealth_segment,
           |   count(*) AS n,
           |   CAST(CAST(sum(CAST(${TestData.engagementSql("previous", "campaign", "duration", "y")} AS DECIMAL(10,6))) AS DECIMAL(18,6)) AS DOUBLE) AS engagement_sum
           | FROM scored GROUP BY 1, 2 ORDER BY customer_segment, wealth_segment"""
          .stripMargin.replace("\n", ""))),

    // Same replicated workload, but entering through the REAL csv-text
    // parse path (the reference's actual input shape): render each bank
    // row to its semicolon line, replicate, tokenize with from_csv,
    // coerce, validate, enrich, segment, aggregate. Shares q41's oracle
    // (the render->parse round trip is lossless).
    "q42_csv_etl_throughput" -> Q(
      (s, dir) => {
        val bank = TestData.bankFrame(s, dir)
        val line = concat_ws(";",
          col("age").cast("string"), col("job"), col("marital"),
          col("education"), col("default"), col("balance").cast("string"),
          col("housing"), col("loan"), col("contact"),
          col("day").cast("string"), col("month"),
          col("duration").cast("string"), col("campaign").cast("string"),
          col("pdays").cast("string"), col("previous").cast("string"),
          col("poutcome"), col("y"))
        val lines = s.range(0, etlReplication(s), 1, 32)
          .select(col("id").as("rep"))
          .crossJoin(broadcast(bank.select(line.as("value"))))
          .drop("rep")
        val res = graft.pipeline.BankingPipeline.fromLines(lines)
        res.processed
          .groupBy("customer_segment", "wealth_segment")
          .agg(count(lit(1)).as("n"),
            sum(col("engagement_score").cast(DecimalType(10, 6)))
              .cast(DecimalType(18, 6)).cast("double").as("engagement_sum"))
          .orderBy("customer_segment", "wealth_segment")
      },
      Some(TestData.bankCte +
        s""", rep AS (SELECT bank.* FROM bank, generate_series(1, $DefaultEtlReplication)),
           | v AS (SELECT * FROM rep WHERE age BETWEEN 18 AND 100),
           | scored AS (SELECT v.*, ${TestData.recencySql("pdays")} AS r,
           |   ${TestData.frequencySql("previous")} AS f,
           |   ${TestData.monetarySql("balance")} AS m FROM v)
           | SELECT ${TestData.segmentSql("(((r + f + m)) / 3.0)")} AS customer_segment,
           |   ${TestData.wealthSql("balance")} AS wealth_segment,
           |   count(*) AS n,
           |   CAST(CAST(sum(CAST(${TestData.engagementSql("previous", "campaign", "duration", "y")} AS DECIMAL(10,6))) AS DECIMAL(18,6)) AS DOUBLE) AS engagement_sum
           | FROM scored GROUP BY 1, 2 ORDER BY customer_segment, wealth_segment"""
          .stripMargin.replace("\n", ""))),

    "q39_salted_agg" -> Q(
      (s, dir) => {
        val salted = table(s, dir, "events")
          .withColumn("_salt", pmod(hash(col("event_id")), lit(Salts)))
          .groupBy("event_type", "_salt")
          .agg(count(lit(1)).as("pn"),
            sum(col("value").cast(DecimalType(18, 4))).as("psum"))
        salted.groupBy("event_type")
          .agg(sum("pn").as("n"),
            sum("psum").cast(DecimalType(18, 4)).cast("double")
              .as("value_sum"))
          .orderBy("event_type")
      },
      Some(
        """SELECT event_type, count(*) AS n,
          | CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS value_sum
          | FROM events GROUP BY event_type ORDER BY event_type"""
          .stripMargin.replace("\n", ""))),

    "q40_ann_ivf_topk" -> Q(
      (s, dir) => {
        val n = table(s, dir, "embeddings")
          .select(col("vec_id"),
            col("embedding").cast("array<double>").as("v"))
          .select(col("vec_id"), col("v"),
            VectorFunctions.l2norm(col("v")).as("nrm"))
        val cent = n.where(col("vec_id") < NumCentroids)
          .select(col("vec_id").as("cid"), col("v").as("cv"),
            col("nrm").as("cn"))
        // Coarse assign: nearest centroid by cosine (ties -> lowest cid).
        val assigned = n.join(broadcast(cent))
          .select(col("vec_id"), col("v"), col("nrm"), col("cid"),
            cosine(col("v"), col("cv"), col("nrm"), col("cn")).as("cosc"))
          .withColumn("rn", row_number().over(Window.partitionBy("vec_id")
            .orderBy(desc("cosc"), col("cid"))))
          .where(col("rn") === 1)
          .select(col("vec_id"), col("v"), col("nrm"),
            col("cid").as("cell"))
        val q = assigned.where(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("query_id"), col("v").as("qv"),
            col("nrm").as("qn"), col("cell").as("qcell"))
        broadcast(q)
          .join(assigned, col("cell") === col("qcell") &&
            col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id").as("cand_id"),
            cosine(col("qv"), col("v"), col("qn"), col("nrm")).as("cosine"))
          .withColumn("rnk", row_number().over(Window.partitionBy("query_id")
            .orderBy(desc("cosine"), col("cand_id"))))
          .where(col("rnk") <= 5)
          .select("query_id", "rnk", "cand_id", "cosine")
          .orderBy("query_id", "rnk")
      },
      Some(
        s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
           | n AS (SELECT vec_id, v, sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm FROM e),
           | cent AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id < $NumCentroids),
           | asg0 AS (SELECT n.vec_id, n.v, n.nrm, c.cid,
           |   ${dotSql.format("n.v", "c.cv")} / (n.nrm * c.cn) AS cosc
           |   FROM n, cent c),
           | asg1 AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cosc DESC, cid) AS rn FROM asg0),
           | asg AS (SELECT vec_id, v, nrm, cid AS cell FROM asg1 WHERE rn = 1),
           | q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn, cell AS qcell FROM asg WHERE vec_id % 100 = 0),
           | sc AS (SELECT q.query_id, a.vec_id AS cand_id,
           |   ${dotSql.format("q.qv", "a.v")} / (q.qn * a.nrm) AS cosine
           |   FROM q JOIN asg a ON a.cell = q.qcell AND a.vec_id <> q.query_id),
           | r AS (SELECT query_id, cand_id, cosine,
           |   CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS INT) AS rnk FROM sc)
           | SELECT query_id, rnk, cand_id, cosine FROM r WHERE rnk <= 5
           | ORDER BY query_id, rnk""".stripMargin.replace("\n", "")))
  )
}
