package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import TestData._

/** Round-2 catalog extensions: semi-structured (JSON) projection, event
  * sequence analytics (lag/lead gaps, running totals), doc-term ranking
  * (TF-IDF top terms), and grouped order-statistics quantiles.
  *
  * Scale notes (100 TB posture):
  *  - JSON extraction is a codegen'd per-row projection (no shuffle);
  *  - the sequence queries shuffle once by their window key (user /
  *    customer) — the same partitioning serves lag, gap aggregation, and
  *    running totals, and at cluster scale would be a bucketed layout;
  *  - TF-IDF's document-frequency side is a tiny term dimension joined
  *    back broadcast-style; the doc-term frame shuffles once by term;
  *  - running totals use integer cents so the window sum is exact and
  *    order-independent across engines (double window sums are not:
  *    DuckDB evaluates windowed aggregates with a segment tree, Spark
  *    sequentially — float association would diverge).
  */
object ExtendedOps {

  def all: Map[String, Q] = Map(

    // Semi-structured projection: JSON property extraction + grouped
    // integer stats. from_json with an explicit schema (not
    // get_json_object) so the parse is a single typed struct read.
    "q52_json_props" -> Q(
      (s, dir) => table(s, dir, "events")
        .select(col("event_type"),
          from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
            .getField("k").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), min("k").as("min_k"),
          max("k").as("max_k"), sum(col("k").cast("long")).as("sum_k"))
        .orderBy("event_type"),
      Some(
        """SELECT event_type, count(*) AS n,
          | min(CAST(props->>'k' AS INT)) AS min_k,
          | max(CAST(props->>'k' AS INT)) AS max_k,
          | CAST(sum(CAST(props->>'k' AS INT)) AS BIGINT) AS sum_k
          | FROM events GROUP BY event_type ORDER BY event_type"""
          .stripMargin.replace("\n", ""))),

    // Per-user inter-event gaps via lag(): one shuffle by user_id serves
    // both the lag window and the final aggregation.
    "q53_user_gaps" -> Q(
      (s, dir) => {
        // Ordering by floored epoch (not raw ts) keeps the per-user gap
        // sequence identical to the oracle's: both sequences are sorted
        // multisets of the same second values.
        val w = Window.partitionBy("user_id").orderBy("es", "event_id")
        table(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            unix_timestamp(col("ts")).as("es"))
          .withColumn("gap", col("es") - lag("es", 1).over(w))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            max("gap").as("max_gap_s"),
            sum("gap").as("total_span_s"))
          .orderBy("user_id")
      },
      Some(
        """WITH e AS (SELECT user_id, event_id,
          |   CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events),
          | g AS (SELECT user_id,
          |   es - lag(es, 1) OVER (PARTITION BY user_id ORDER BY es, event_id) AS gap
          |   FROM e)
          | SELECT user_id, count(*) AS n_events, max(gap) AS max_gap_s,
          |   CAST(sum(gap) AS BIGINT) AS total_span_s
          | FROM g GROUP BY user_id ORDER BY user_id""".stripMargin
          .replace("\n", ""))),

    // TF-IDF top-3 terms per document. Linear idf (N/df instead of
    // ln(N/df)): rational arithmetic over small integers is bit-identical
    // across engines, where libm ln() is not guaranteed to be; the
    // ranking structure (doc-term tf, term df, per-doc top-k window) is
    // the operator under test.
    "q54_tfidf_topterms" -> Q(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val nDocs = docs.select(countDistinct("doc_id").as("n_docs"))
        val terms = docs.select(col("doc_id"),
          explode(split(col("text"), " ")).as("term"))
        val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
        val w = Window.partitionBy("doc_id")
          .orderBy(desc("score"), col("term"))
        tf.join(df, "term").crossJoin(broadcast(nDocs))
          .select(col("doc_id"), col("term"),
            (col("tf").cast("double") * col("n_docs") / col("df"))
              .as("score"))
          .withColumn("rnk", row_number().over(w))
          .where(col("rnk") <= 3)
          .select("doc_id", "rnk", "term", "score")
          .orderBy("doc_id", "rnk")
      },
      Some(
        """WITH terms AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
          | tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term),
          | df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
          | nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
          | sc AS (SELECT tf.doc_id, tf.term,
          |   CAST(tf.tf AS DOUBLE) * nd.n_docs / df.df AS score
          |   FROM tf JOIN df USING (term) CROSS JOIN nd),
          | r AS (SELECT doc_id, term, score,
          |   CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS INT) AS rnk FROM sc)
          | SELECT doc_id, rnk, term, score FROM r WHERE rnk <= 3
          | ORDER BY doc_id, rnk""".stripMargin.replace("\n", ""))),

    // Running revenue per customer in integer cents: exact, associative,
    // and engine-order-independent (see scale notes).
    "q55_running_revenue" -> Q(
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy("o_orderdate", "o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        table(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
            round(col("o_totalprice") * 100).cast("long").as("cents"))
          .withColumn("running_cents", sum("cents").over(w))
          .select(col("o_custkey"), col("o_orderkey"),
            (col("running_cents") / 100.0).as("running_revenue"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some(
        """WITH c AS (SELECT o_custkey, o_orderkey, o_orderdate,
          |   CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
          | r AS (SELECT o_custkey, o_orderkey,
          |   sum(cents) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          |     ROWS UNBOUNDED PRECEDING) AS running_cents FROM c)
          | SELECT o_custkey, o_orderkey, running_cents / 100.0 AS running_revenue
          | FROM r ORDER BY o_custkey, o_orderkey""".stripMargin
          .replace("\n", ""))),

    // Grouped exact discrete p90 via order statistics (q48's technique
    // generalized beyond the median): the result is an actual data
    // element, so it compares exactly — no interpolation semantics to
    // reconcile across engines.
    "q56_grouped_p90" -> Q(
      (s, dir) => {
        val w = Window.partitionBy("event_type")
          .orderBy(col("value"), col("event_id"))
        table(s, dir, "events")
          .withColumn("rn", row_number().over(w))
          .withColumn("cnt", count(lit(1))
            .over(Window.partitionBy("event_type")))
          .where(col("rn") === ceil(col("cnt") * 0.9).cast("int"))
          .select(col("event_type"), col("value").as("p90_value"))
          .orderBy("event_type")
      },
      Some(
        """WITH r AS (SELECT event_type, value, event_id,
          |   row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
          |   count(*) OVER (PARTITION BY event_type) AS cnt
          | FROM events)
          | SELECT event_type, value AS p90_value FROM r
          | WHERE rn = CAST(ceil(cnt * 0.9) AS INT)
          | ORDER BY event_type""".stripMargin.replace("\n", "")))
  )
}
