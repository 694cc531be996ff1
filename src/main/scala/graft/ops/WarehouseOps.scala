package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import TestData._

/** Warehouse-maintenance and behavioral analytics operators: small-file
  * compaction planning, co-purchase graph triangle counting, cohort
  * retention, and multi-touch attribution. All integer-exact (cents /
  * month indices / basis points) so both engines hash identically.
  */
object WarehouseOps {

  /** Target compaction bin size in bytes (sf-independent constant; at
    * larger sf each (lang, source) group simply plans more files).
    */
  private val BinBytes = 8192L

  def all: Map[String, Q] = Map(

    // Small-file compaction planning — the table-maintenance pass every
    // lakehouse needs: within each (lang, source) partition, documents
    // are packed in doc_id order into ~8 KiB output files by cumulative
    // size (greedy first-fit in key order), and the plan reports each
    // planned file's doc count, bytes, and fill factor. 100 TB posture:
    // ONE shuffle on the partition key, then a per-group ordered window
    // — the same layout a real compactor (Iceberg/Delta bin-packing)
    // uses; group sizes are bounded by the partition layout, never the
    // corpus, and the plan is pure metadata (no text moves until the
    // rewrite executes it).
    "q128_compaction_plan" -> Q(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val w = Window.partitionBy("lang", "source").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        docs.select(col("lang"), col("source"), col("doc_id"), col("n_chars"))
          .withColumn("cum", sum("n_chars").over(w))
          .withColumn("file_id",
            expr(s"(greatest(cum, 1) - 1) div $BinBytes").cast("int"))
          .groupBy("lang", "source", "file_id")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_chars").as("bytes"),
            min("doc_id").as("first_doc"),
            max("doc_id").as("last_doc"))
          .withColumn("fill_bps", expr(s"bytes * 10000 div $BinBytes"))
          .orderBy("lang", "source", "file_id")
      },
      Some(
        s"""WITH c AS (SELECT lang, source, doc_id, n_chars,
           |   sum(n_chars) OVER (PARTITION BY lang, source ORDER BY doc_id
           |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           |   FROM documents),
           | b AS (SELECT lang, source, doc_id, n_chars,
           |   CAST((greatest(cum, 1) - 1) // $BinBytes AS INT) AS file_id FROM c)
           | SELECT lang, source, file_id, count(*) AS n_docs,
           |   CAST(sum(n_chars) AS BIGINT) AS bytes,
           |   min(doc_id) AS first_doc, max(doc_id) AS last_doc,
           |   CAST(sum(n_chars) * 10000 // $BinBytes AS BIGINT) AS fill_bps
           | FROM b GROUP BY 1, 2, 3 ORDER BY lang, source, file_id"""
          .stripMargin.replace("\n", ""))),

    // Degree-ordered triangle counting over the co-purchase graph
    // (parts appearing in the same order). Edges orient from the
    // (degree, id)-smaller endpoint, so a triangle {a,b,c} materializes
    // exactly once as the wedge a->b->c closed by a->c — the classic
    // bound that keeps wedge fanout at O(E^1.5) total instead of
    // O(sum deg^2): hub nodes get only their few higher-degree
    // neighbors as out-edges. 100 TB posture: per-order pair fanout is
    // bounded by order width (<= C(13,2) here), the edge list shuffles
    // as fixed-width longs, and the two wedge joins are plain
    // equi-joins AQE can skew-split.
    "q129_triangle_count" -> Q(
      (s, dir) => {
        val li = table(s, dir, "lineitem")
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
          .distinct()
        // pairs feeds deg AND e; e feeds all three legs of the wedge
        // join — checkpoint both so the order self-join runs once and
        // the oriented edge list is a materialized leaf, not a lineage
        // replayed three times (q110/q118 discipline).
        val pairs = li.alias("a").join(li.alias("b"),
            col("a.o") === col("b.o") && col("a.p") < col("b.p"))
          .select(col("a.p").as("u"), col("b.p").as("v"))
          .distinct()
          .localCheckpoint(eager = true)
        val deg = pairs.select(col("u").as("n"))
          .unionAll(pairs.select(col("v").as("n")))
          .groupBy("n").agg(count(lit(1)).as("deg"))
        val e = pairs
          .join(deg.select(col("n").as("u"), col("deg").as("du")), "u")
          .join(deg.select(col("n").as("v"), col("deg").as("dv")), "v")
          .select(
            when(col("du") < col("dv") ||
              (col("du") === col("dv") && col("u") < col("v")),
              col("u")).otherwise(col("v")).as("src"),
            when(col("du") < col("dv") ||
              (col("du") === col("dv") && col("u") < col("v")),
              col("v")).otherwise(col("u")).as("dst"))
          .localCheckpoint(eager = true)
        // Broadcast the edge list into both wedge legs: the oriented
        // edges are fixed-width longs (~19 MB at sf0.1), so wedges are
        // generated AND closed inside one pipelined codegen stage — the
        // 49M intermediate wedge rows (measured at sf0.1) never hit a
        // shuffle. Past broadcast size (E >~ 10^8) drop the hints and
        // the same plan degrades gracefully to two shuffled hash joins.
        val tri = e.alias("ab").join(broadcast(e.alias("bc")),
            col("ab.dst") === col("bc.src"))
          .select(col("ab.src").as("ta"), col("ab.dst").as("tb"),
            col("bc.dst").as("tc"))
          .join(broadcast(e.alias("ac")),
            col("ta") === col("ac.src") && col("tc") === col("ac.dst"),
            "left_semi")
        tri.select(explode(array(col("ta"), col("tb"), col("tc"))).as("part"))
          .groupBy("part").agg(count(lit(1)).as("triangles"))
          .join(deg.select(col("n").as("part"), col("deg")), "part")
          .orderBy(col("triangles").desc, col("part"))
          .limit(20)
          .select(col("part"), col("triangles"), col("deg"))
          .orderBy(col("triangles").desc, col("part"))
      },
      Some(
        """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
          | pairs AS (SELECT DISTINCT a.p AS u, b.p AS v FROM li a JOIN li b
          |   ON a.o = b.o AND a.p < b.p),
          | deg AS (SELECT n, count(*) AS deg FROM
          |   (SELECT u AS n FROM pairs UNION ALL SELECT v FROM pairs) GROUP BY 1),
          | e AS (SELECT CASE WHEN (da.deg, pairs.u) < (db.deg, pairs.v)
          |     THEN pairs.u ELSE pairs.v END AS src,
          |   CASE WHEN (da.deg, pairs.u) < (db.deg, pairs.v)
          |     THEN pairs.v ELSE pairs.u END AS dst
          |   FROM pairs JOIN deg da ON da.n = pairs.u JOIN deg db ON db.n = pairs.v),
          | tri AS (SELECT ab.src AS ta, ab.dst AS tb, bc.dst AS tc
          |   FROM e ab JOIN e bc ON ab.dst = bc.src
          |   WHERE EXISTS (SELECT 1 FROM e ac WHERE ac.src = ab.src AND ac.dst = bc.dst)),
          | pt AS (SELECT part, count(*) AS triangles FROM
          |   (SELECT ta AS part FROM tri UNION ALL SELECT tb FROM tri
          |    UNION ALL SELECT tc FROM tri) GROUP BY 1),
          | top AS (SELECT pt.part, pt.triangles, deg.deg FROM pt
          |   JOIN deg ON deg.n = pt.part
          |   ORDER BY triangles DESC, part LIMIT 20)
          | SELECT part, triangles, deg FROM top ORDER BY triangles DESC, part"""
          .stripMargin.replace("\n", ""))),

    // Cohort retention: customers cohorted by first-order month; for
    // each cohort x month-offset (0..11), how many distinct cohort
    // members ordered again, as exact basis points of cohort size.
    // Month indices are pure integers (year*12 + month), so offsets
    // and the final div are engine-exact. 100 TB posture: two
    // aggregations sharing one customer-key exchange, then a tiny
    // cohort-level join — no event-grain shuffle ever repeats.
    "q130_cohort_retention" -> Q(
      (s, dir) => {
        val om = table(s, dir, "orders").select(
          col("o_custkey").as("c"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
            .as("m"))
        val first = om.groupBy("c").agg(min("m").as("m0"))
        val act = om.distinct()
        val ret = act.join(first, "c")
          .select(col("c"), col("m0"), (col("m") - col("m0")).as("off"))
          .where(col("off") <= 11)
          .groupBy("m0", "off").agg(count(lit(1)).as("n_active"))
        val size = first.groupBy("m0").agg(count(lit(1)).as("cohort_n"))
        ret.join(size, "m0")
          .select(
            expr("((m0 - 1) div 12) * 100 + ((m0 - 1) % 12 + 1)")
              .cast("int").as("cohort_ym"),
            col("off").cast("int").as("month_offset"),
            col("n_active"), col("cohort_n"),
            expr("n_active * 10000 div cohort_n").as("retained_bps"))
          .orderBy("cohort_ym", "month_offset")
      },
      Some(
        """WITH om AS (SELECT o_custkey AS c,
          |   year(o_orderdate) * 12 + month(o_orderdate) AS m FROM orders),
          | f AS (SELECT c, min(m) AS m0 FROM om GROUP BY 1),
          | act AS (SELECT DISTINCT c, m FROM om),
          | ret AS (SELECT f.m0, act.m - f.m0 AS off, count(*) AS n_active
          |   FROM act JOIN f USING (c) WHERE act.m - f.m0 <= 11 GROUP BY 1, 2),
          | sz AS (SELECT m0, count(*) AS cohort_n FROM f GROUP BY 1)
          | SELECT CAST(((m0 - 1) // 12) * 100 + ((m0 - 1) % 12 + 1) AS INT) AS cohort_ym,
          |   CAST(off AS INT) AS month_offset, n_active, cohort_n,
          |   CAST(n_active * 10000 // cohort_n AS BIGINT) AS retained_bps
          | FROM ret JOIN sz USING (m0) ORDER BY cohort_ym, month_offset"""
          .stripMargin.replace("\n", ""))),

    // Multi-touch attribution: each purchase is credited to the first
    // and the last touch (click/view) STRICTLY before it in the user's
    // event stream; purchases with no prior touch credit "none". Value
    // is settled in integer cents (floor(v*100 + 0.5): one IEEE
    // multiply per row, then exact BIGINT sums — order-independent
    // across engines). 100 TB posture: one user-key window carries both
    // models (first/last over the same frame), then a channel-level
    // aggregate over a handful of groups.
    "q131_attribution" -> Q(
      (s, dir) => {
        val ev = table(s, dir, "events")
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val touch = when(col("event_type").isin("click", "view"),
          col("event_type"))
        val purch = ev
          .withColumn("ft", first(touch, ignoreNulls = true).over(w))
          .withColumn("lt", last(touch, ignoreNulls = true).over(w))
          .where(col("event_type") === "purchase")
          .select(coalesce(col("ft"), lit("none")).as("ft"),
            coalesce(col("lt"), lit("none")).as("lt"),
            expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)").as("cents"))
        val ft = purch.groupBy(col("ft").as("channel"))
          .agg(count(lit(1)).as("conversions"), sum("cents").as("value_cents"))
          .withColumn("model", lit("first_touch"))
        val lt = purch.groupBy(col("lt").as("channel"))
          .agg(count(lit(1)).as("conversions"), sum("cents").as("value_cents"))
          .withColumn("model", lit("last_touch"))
        ft.unionByName(lt)
          .select(col("model"), col("channel"), col("conversions"),
            col("value_cents"))
          .orderBy("model", "channel")
      },
      Some(
        """WITH t AS (SELECT user_id, ts, event_id, event_type, value,
          |   first_value(CASE WHEN event_type IN ('click', 'view') THEN event_type END IGNORE NULLS)
          |     OVER (PARTITION BY user_id ORDER BY ts, event_id
          |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ft,
          |   last_value(CASE WHEN event_type IN ('click', 'view') THEN event_type END IGNORE NULLS)
          |     OVER (PARTITION BY user_id ORDER BY ts, event_id
          |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt
          |   FROM events),
          | p AS (SELECT coalesce(ft, 'none') AS ft, coalesce(lt, 'none') AS lt,
          |   CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
          |   FROM t WHERE event_type = 'purchase'),
          | m AS (SELECT 'first_touch' AS model, ft AS channel,
          |     count(*) AS conversions, sum(cents) AS value_cents FROM p GROUP BY 2
          |   UNION ALL
          |   SELECT 'last_touch', lt, count(*), sum(cents) FROM p GROUP BY 2)
          | SELECT model, channel, conversions, CAST(value_cents AS BIGINT) AS value_cents
          | FROM m ORDER BY model, channel""".stripMargin.replace("\n", "")))
  )
}
