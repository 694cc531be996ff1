package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import TestData._

/** Pipeline-observability operators: the reports a production
  * training-data pipeline emits about ITSELF — filter-funnel attribution,
  * per-user event-rate anomalies, corpus snapshot drift, out-of-order
  * lateness audits, and deterministic curriculum ordering.
  *
  * Everything that crosses the oracle hash gate is integer-exact
  * (counts, basis points, epoch seconds, BIGINT z-score numerators);
  * the only IEEE values are single correctly-rounded divisions shared
  * verbatim with the DuckDB twin (q84's mean-word-length discipline).
  */
object PipelineObsOps {

  /** Funnel stage order — index is the reporting sort key. */
  private val FunnelStages = Seq(
    (1, "lang_filter"), (2, "too_short"), (3, "too_long"),
    (4, "mean_len"), (5, "dup_frac"), (6, "kept"))

  def all: Map[String, Q] = Map(

    // Filter-funnel report: every doc is attributed to its FIRST failing
    // quality gate (lang allowlist -> Gopher min/max words -> mean word
    // length band -> duplicate-word fraction). The last four stages are
    // the full gopherKeep gate set, so "kept" = gopherKeep AND
    // lang != zh — a strict SUBSET of the q84/q96 keep-list whenever a
    // zh doc passes the Gopher gates (the funnel adds the lang gate
    // those queries do not have). The funnel reports
    // per-stage drops, survivors after each stage, and drop share in
    // basis points — the "where did my corpus go" dashboard every
    // curation run ships with. 100 TB posture: ONE narrow projection
    // computes the first-fail stage per doc (no shuffle), the corpus
    // collapses map-side to <= 6 stage rows, and the cumulative-survivor
    // window runs on that post-aggregate frame — bounded by the
    // gate count, never the corpus.
    "q141_filter_funnel" -> Q(
      (s, dir) => {
        val w = split(col("text"), " ")
        val meanLen =
          expr("length(replace(text, ' ', '')) * 1.0 / size(split(text, ' '))")
        val dupFrac = lit(1.0) - size(array_distinct(w)) * lit(1.0) / size(w)
        val stage = when(col("lang") === "zh", "lang_filter")
          .when(size(w) < TextOps.GopherMinWords, "too_short")
          .when(size(w) > TextOps.GopherMaxWords, "too_long")
          .when(meanLen < TextOps.GopherMinMeanLen ||
            meanLen > TextOps.GopherMaxMeanLen, "mean_len")
          .when(dupFrac > TextOps.GopherMaxDupFrac, "dup_frac")
          .otherwise("kept")
        val stageIdx = FunnelStages.foldLeft(lit(null).cast("int")) {
          case (acc, (i, n)) => when(col("stage") === n, i).otherwise(acc)
        }
        val agg = table(s, dir, "documents")
          .select(stage.as("stage"))
          .groupBy("stage").agg(count(lit(1)).as("n_docs"))
          .withColumn("stage_idx", stageIdx)
        val cum = Window.orderBy("stage_idx")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        agg
          .crossJoin(broadcast(agg.agg(sum("n_docs").as("total"))))
          .withColumn("dropped_cum",
            sum(when(col("stage") =!= "kept", col("n_docs")).otherwise(0L))
              .over(cum))
          .select(col("stage_idx"), col("stage"), col("n_docs"),
            (col("total") - col("dropped_cum")).as("survivors_after"),
            expr("n_docs * 10000 div total").as("share_bps"))
          .orderBy("stage_idx")
      },
      Some(
        """WITH m AS (SELECT CASE
          |     WHEN lang = 'zh' THEN 'lang_filter'
          |     WHEN len(string_split(text, ' ')) < 30 THEN 'too_short'
          |     WHEN len(string_split(text, ' ')) > 10000 THEN 'too_long'
          |     WHEN length(replace(text, ' ', '')) * 1.0 / len(string_split(text, ' ')) < 3.5
          |       OR length(replace(text, ' ', '')) * 1.0 / len(string_split(text, ' ')) > 5.0 THEN 'mean_len'
          |     WHEN 1.0 - len(list_distinct(string_split(text, ' '))) * 1.0 / len(string_split(text, ' ')) > 0.6 THEN 'dup_frac'
          |     ELSE 'kept' END AS stage
          |   FROM documents),
          | a AS (SELECT stage, count(*) AS n_docs,
          |     CASE stage WHEN 'lang_filter' THEN 1 WHEN 'too_short' THEN 2
          |       WHEN 'too_long' THEN 3 WHEN 'mean_len' THEN 4
          |       WHEN 'dup_frac' THEN 5 ELSE 6 END AS stage_idx
          |   FROM m GROUP BY 1)
          | SELECT CAST(stage_idx AS INT) AS stage_idx, stage, n_docs,
          |   CAST(sum(n_docs) OVER () - sum(CASE WHEN stage <> 'kept' THEN n_docs ELSE 0 END)
          |     OVER (ORDER BY stage_idx ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          |     AS survivors_after,
          |   CAST(n_docs * 10000 // sum(n_docs) OVER () AS BIGINT) AS share_bps
          | FROM a ORDER BY stage_idx""".stripMargin.replace("\n", ""))),

    // Per-user event-rate anomaly detection: hourly activity counts per
    // user, then a per-user z-test on each hour — flag hours whose count
    // sits more than 3 sigma ABOVE that user's own hourly mean. The
    // baseline is over the user's ACTIVE hours only (hours with zero
    // events contribute to neither n, s1, nor s2), which raises the
    // mean and makes the flag conservative for sparse users — the
    // deliberate semantic here: a user who fires 5 events in each of 3
    // scattered hours is steady, not anomalous, even if their
    // calendar-hour mean would be near zero. The
    // entire test runs in BIGINT moments ((n*x - S1)^2 > 9*(n*S2 - S1^2)
    // is z > 3 with both sides integer), so the flag — and the gate —
    // are engine-exact with no IEEE mean/stddev anywhere. 100 TB
    // posture: ONE user-key exchange end-to-end — the repartition feeds
    // the (user, hour) aggregation (HashPartitioning(user) satisfies the
    // two-key clustering, q113's discipline) and all three moment
    // windows ride the same partitioning; flagged rows are the only
    // output.
    "q142_rate_anomaly" -> Q(
      (s, dir) => {
        val hourly = table(s, dir, "events")
          .select(col("user_id"),
            expr("unix_micros(ts) div 3600000000").as("hour_idx"))
          .repartition(col("user_id"))
          .groupBy("user_id", "hour_idx").agg(count(lit(1)).as("cnt"))
        val u = Window.partitionBy("user_id")
        val flagged = hourly
          .withColumn("n", count(lit(1)).over(u))
          .withColumn("s1", sum("cnt").over(u))
          .withColumn("s2", sum(col("cnt") * col("cnt")).over(u))
          .where(col("n") >= 4 &&
            col("n") * col("cnt") > col("s1") &&
            (col("n") * col("cnt") - col("s1")) *
              (col("n") * col("cnt") - col("s1")) >
              lit(9L) * (col("n") * col("s2") - col("s1") * col("s1")))
        flagged.select(col("user_id"), col("hour_idx"), col("cnt"),
            col("n").as("active_hours"), col("s1").as("total_events"),
            ((col("n") * col("cnt") - col("s1")) *
              (col("n") * col("cnt") - col("s1"))).as("z_num"),
            (lit(9L) * (col("n") * col("s2") - col("s1") * col("s1")))
              .as("z_den9"))
          .orderBy("user_id", "hour_idx")
      },
      Some(
        """WITH h AS (SELECT user_id, epoch_us(ts) // 3600000000 AS hour_idx,
          |     count(*) AS cnt
          |   FROM events GROUP BY 1, 2),
          | m AS (SELECT user_id, hour_idx, cnt,
          |     count(*) OVER (PARTITION BY user_id) AS n,
          |     CAST(sum(cnt) OVER (PARTITION BY user_id) AS BIGINT) AS s1,
          |     CAST(sum(cnt * cnt) OVER (PARTITION BY user_id) AS BIGINT) AS s2
          |   FROM h)
          | SELECT user_id, hour_idx, cnt, n AS active_hours, s1 AS total_events,
          |   CAST((n * cnt - s1) * (n * cnt - s1) AS BIGINT) AS z_num,
          |   CAST(9 * (n * s2 - s1 * s1) AS BIGINT) AS z_den9
          | FROM m WHERE n >= 4 AND n * cnt > s1
          |   AND (n * cnt - s1) * (n * cnt - s1) > 9 * (n * s2 - s1 * s1)
          | ORDER BY user_id, hour_idx""".stripMargin.replace("\n", ""))),

    // Corpus snapshot drift: split the event stream at the midpoint of
    // its time range and compare per-type distribution shares between
    // the two halves — the monitor that catches a source going dark or
    // a scraper doubling up between snapshots. Shares are integer basis
    // points; the midpoint is integer epoch-second arithmetic; nothing
    // IEEE crosses the gate. 100 TB posture: two full-partial
    // aggregations (bounds, then per-type conditional counts) with the
    // scalar bounds BROADCAST — the event grain never shuffles at all,
    // and the half totals come from an unpartitioned window over the
    // POST-AGGREGATE frame (<= |event_type| rows — bounded by type
    // cardinality, never the corpus) so the counts subtree runs once.
    "q143_snapshot_drift" -> Q(
      (s, dir) => {
        val ev = table(s, dir, "events")
          .select(col("event_type"),
            expr("unix_micros(ts) div 1000000").as("ts_s"))
        val bounds = ev.agg(
          expr("(min(ts_s) + max(ts_s)) div 2").as("mid"))
        val halves = ev.crossJoin(broadcast(bounds))
          .groupBy("event_type")
          .agg(sum(when(col("ts_s") <= col("mid"), 1L).otherwise(0L))
            .as("n_first"),
            sum(when(col("ts_s") > col("mid"), 1L).otherwise(0L))
              .as("n_second"))
        val tot = Window.partitionBy(lit(0)).rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)
        halves
          .withColumn("t1", sum("n_first").over(tot))
          .withColumn("t2", sum("n_second").over(tot))
          .select(col("event_type"), col("n_first"), col("n_second"),
            expr("n_first * 10000 div greatest(t1, 1)").as("share1_bps"),
            expr("n_second * 10000 div greatest(t2, 1)").as("share2_bps"))
          .withColumn("drift_bps", col("share2_bps") - col("share1_bps"))
          .orderBy("event_type")
      },
      Some(
        """WITH e AS (SELECT event_type, epoch_us(ts) // 1000000 AS ts_s FROM events),
          | b AS (SELECT (min(ts_s) + max(ts_s)) // 2 AS mid FROM e),
          | h AS (SELECT event_type,
          |     CAST(sum(CASE WHEN ts_s <= b.mid THEN 1 ELSE 0 END) AS BIGINT) AS n_first,
          |     CAST(sum(CASE WHEN ts_s > b.mid THEN 1 ELSE 0 END) AS BIGINT) AS n_second
          |   FROM e CROSS JOIN b GROUP BY 1),
          | t AS (SELECT event_type, n_first, n_second,
          |     CAST(sum(n_first) OVER () AS BIGINT) AS t1,
          |     CAST(sum(n_second) OVER () AS BIGINT) AS t2 FROM h)
          | SELECT event_type, n_first, n_second,
          |   CAST(n_first * 10000 // greatest(t1, 1) AS BIGINT) AS share1_bps,
          |   CAST(n_second * 10000 // greatest(t2, 1) AS BIGINT) AS share2_bps,
          |   CAST(n_second * 10000 // greatest(t2, 1)
          |     - n_first * 10000 // greatest(t1, 1) AS BIGINT) AS drift_bps
          | FROM t ORDER BY event_type""".stripMargin
          .replace("\n", ""))),

    // Out-of-order lateness audit: within each user's stream in ARRIVAL
    // order, how late does each event's timestamp trail the running
    // high-water mark — the batch twin of a streaming watermark's
    // lateness histogram, and the report that sizes `withWatermark`
    // before a streaming job ships. The testdata generator emits events
    // perfectly time-sorted (verified: zero inversions), so arrival
    // order is modeled as a DAILY INGEST BATCH: events arrive day by
    // day, md5-hash-permuted within each day — the deterministic
    // stand-in for a multi-source interleave that both engines replay
    // bit-identically and that bounds disorder at one batch. Lateness lands in integer
    // seconds and is banded on_time / 1m / 5m / 1h / late. 100 TB
    // posture: ONE user-key exchange for the running-max window, then
    // the corpus collapses map-side to <= 5x5 (type, band) rows.
    "q144_lateness_audit" -> Q(
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy("day", "arrival", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val late = table(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("event_type"),
            expr("unix_micros(ts) div 1000000").as("ts_s"))
          .withColumn("day", expr("ts_s div 86400"))
          .withColumn("arrival",
            DedupOps.md5Long60(col("event_id").cast("string")))
          .withColumn("late_s", max("ts_s").over(w) - col("ts_s"))
        late
          .withColumn("band",
            when(col("late_s") <= 0, "1_on_time")
              .when(col("late_s") <= 60, "2_within_1m")
              .when(col("late_s") <= 300, "3_within_5m")
              .when(col("late_s") <= 3600, "4_within_1h")
              .otherwise("5_late"))
          .groupBy("event_type", "band")
          .agg(count(lit(1)).as("n_events"), max("late_s").as("max_late_s"))
          .orderBy("event_type", "band")
      },
      Some(
        """WITH a AS (SELECT event_type, user_id, event_id,
          |     epoch_us(ts) // 1000000 AS ts_s,
          |     epoch_us(ts) // 1000000 // 86400 AS day,
          |     ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT AS arrival
          |   FROM events),
          | l AS (SELECT event_type,
          |     CAST(max(ts_s) OVER (PARTITION BY user_id ORDER BY day, arrival, event_id
          |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |       - ts_s AS BIGINT) AS late_s
          |   FROM a),
          | b AS (SELECT event_type, CASE
          |     WHEN late_s <= 0 THEN '1_on_time' WHEN late_s <= 60 THEN '2_within_1m'
          |     WHEN late_s <= 300 THEN '3_within_5m' WHEN late_s <= 3600 THEN '4_within_1h'
          |     ELSE '5_late' END AS band, late_s FROM l)
          | SELECT event_type, band, count(*) AS n_events,
          |   max(late_s) AS max_late_s
          | FROM b GROUP BY 1, 2 ORDER BY event_type, band""".stripMargin
          .replace("\n", ""))),

    // Deterministic curriculum interleave: rank docs within each source
    // by lexical uniqueness (distinct-word basis points — integer), then
    // emit the round-robin training order (rank 1 of every source, then
    // rank 2, ...) that keeps every batch source-diverse — the
    // curriculum layout a pretraining run materializes once. The global
    // position is the SORT KEY (src_rank, src_idx) — pure arithmetic,
    // never a single-partition row_number over the corpus. 100 TB
    // posture: the per-source rank rides the two-level distributed
    // scan (OrderStat.scanRank, chunked by the inverted bps score —
    // monotone along the uniq_bps DESC order, bounded 10001-value
    // domain) — a source-partitioned row_number would sort a whole
    // source's docs in one task at 100x; plus a 20-row broadcast
    // dimension for the source index.
    "q145_curriculum_interleave" -> Q(
      (s, dir) => {
        val docs = table(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            expr("size(array_distinct(split(text, ' '))) * 10000 div size(split(text, ' '))")
              .as("uniq_bps"))
        val srcIdx = docs.select(col("source")).distinct()
          .withColumn("src_idx",
            row_number().over(Window.orderBy("source")))
        OrderStat.scanRank(docs, Seq("source"),
            Seq(col("uniq_bps").desc, col("doc_id")),
            lit(10000L) - col("uniq_bps"), "src_rank_l")
          .withColumn("src_rank", col("src_rank_l").cast("int"))
          .join(broadcast(srcIdx), "source")
          .select(col("doc_id"), col("source"), col("uniq_bps"),
            col("src_rank"), col("src_idx"))
          .orderBy("src_rank", "src_idx")
      },
      Some(
        """WITH d AS (SELECT doc_id, source,
          |     len(list_distinct(string_split(text, ' '))) * 10000
          |       // len(string_split(text, ' ')) AS uniq_bps
          |   FROM documents),
          | si AS (SELECT source, CAST(row_number() OVER (ORDER BY source) AS INT) AS src_idx
          |   FROM (SELECT DISTINCT source FROM d)),
          | r AS (SELECT doc_id, source, CAST(uniq_bps AS BIGINT) AS uniq_bps,
          |     CAST(row_number() OVER (PARTITION BY source ORDER BY uniq_bps DESC, doc_id) AS INT)
          |       AS src_rank
          |   FROM d)
          | SELECT r.doc_id, r.source, r.uniq_bps, r.src_rank, si.src_idx
          | FROM r JOIN si USING (source) ORDER BY src_rank, src_idx"""
          .stripMargin.replace("\n", ""))),

    // Tukey-fence volume outliers: flag days whose event volume falls
    // outside [Q1 - 1.5*IQR, Q3 + 1.5*IQR] — with BOTH the quartiles
    // (discrete upper order statistics, ceil(k*n/4) index selection —
    // no interpolation) and the fences decided in exact integers: the
    // 1.5 factor rides as 2*x vs 2*q + 3*iqr, so no float ever
    // decides a flag. One corpus rollup to the daily frame; windows
    // run over those ~30 rows.
    "q244_volume_outliers" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val daily = table(s, dir, "events")
          .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(count(lit(1)).as("volume"))
        val ranked = daily
          .withColumn("rn", row_number().over(Window.orderBy("volume")))
          .withColumn("n", count(lit(1)).over(Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing)))
        val quarts = ranked
          .select(
            max(when(col("rn") === expr("(n + 3) div 4"), col("volume")))
              .as("q1"),
            max(when(col("rn") === expr("(3 * n + 3) div 4"),
              col("volume"))).as("q3"))
        daily.crossJoin(broadcast(quarts))
          .select(col("day"), col("volume"), col("q1"), col("q3"),
            when(col("volume") * 2 > col("q3") * 2 +
              (col("q3") - col("q1")) * 3, 1)
              .when(col("volume") * 2 < col("q1") * 2 -
                (col("q3") - col("q1")) * 3, -1)
              .otherwise(0).cast("int").as("outlier"))
          .orderBy("day")
      },
      Some(
        """WITH daily AS (SELECT strftime(ts, '%Y-%m-%d') AS day,
          |     CAST(count(*) AS BIGINT) AS volume FROM events GROUP BY 1),
          | r AS (SELECT day, volume,
          |     row_number() OVER (ORDER BY volume) AS rn,
          |     count(*) OVER () AS n FROM daily),
          | q AS (SELECT
          |     max(CASE WHEN rn = (n + 3) // 4 THEN volume END) AS q1,
          |     max(CASE WHEN rn = (3 * n + 3) // 4 THEN volume END) AS q3
          |   FROM r)
          | SELECT d.day, d.volume, q.q1, q.q3,
          |   CAST(CASE WHEN d.volume * 2 > q.q3 * 2 + (q.q3 - q.q1) * 3 THEN 1
          |     WHEN d.volume * 2 < q.q1 * 2 - (q.q3 - q.q1) * 3 THEN -1
          |     ELSE 0 END AS INT) AS outlier
          | FROM daily d, q ORDER BY d.day"""
          .stripMargin.replace("\n", "")))
  )
}
