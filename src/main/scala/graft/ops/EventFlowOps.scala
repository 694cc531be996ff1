package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import TestData._

/** Event-sequence analytics over the clickstream: the first-order
  * Markov transition matrix and a ClickHouse-windowFunnel-style staged
  * conversion report — the product-analytics pair that sits next to
  * sessionization (q50) and funnel attribution (q79/q131) in any
  * event warehouse.
  *
  * Scale notes: both queries do ALL row-level work inside windows
  * partitioned by user_id — one exchange of the events table each;
  * everything after is bounded (25 transition cells, 4 funnel levels).
  * q172 chains three same-partition windows instead of three
  * aggregate-then-join-back rounds, so Catalyst plans ONE user_id
  * exchange end-to-end (PlanSpec-pinned), the shape that survives a
  * 1000-executor shuffle of 100 TB of events.
  */
object EventFlowOps {

  def all: Map[String, Q] = Map(

    // First-order Markov chain: P(next event type | current), counted
    // over each user's (ts, event_id)-ordered stream. prob is one IEEE
    // division of exact counts.
    "q171_markov_transitions" -> Q(
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val trans = table(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type").as("src"))
          .withColumn("dst", lead("src", 1).over(w))
          .where(col("dst").isNotNull)
          .groupBy("src", "dst").agg(count(lit(1)).as("cnt"))
        val wSrc = Window.partitionBy("src")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        trans
          .withColumn("from_src", sum("cnt").over(wSrc))
          .select(col("src"), col("dst"), col("cnt"), col("from_src"),
            (col("cnt").cast("double") / col("from_src").cast("double"))
              .as("prob"))
          .orderBy("src", "dst")
      },
      Some(
        """WITH seq AS (SELECT user_id, event_type AS src,
          |  lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
          |  FROM events),
          | trans AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS cnt
          |  FROM seq WHERE dst IS NOT NULL GROUP BY src, dst)
          | SELECT src, dst, cnt,
          |  CAST(sum(cnt) OVER (PARTITION BY src) AS BIGINT) AS from_src,
          |  CAST(cnt AS DOUBLE) / CAST(sum(cnt) OVER (PARTITION BY src) AS DOUBLE) AS prob
          | FROM trans ORDER BY src, dst"""
          .stripMargin.replace("\n", ""))),

    // Staged conversion funnel view -> click -> purchase within ONE
    // HOUR of the user's first view (earliest-chain greedy semantics:
    // t1 = first view; t2 = first click at/after t1; t3 = first
    // purchase at/after t2; t2/t3 must land inside [t1, t1 + 1h]).
    // Three chained windows over the SAME user partition — no
    // aggregate-join-back, no self-join.
    "q172_window_funnel" -> Q(
      (s, dir) => {
        val wu = Window.partitionBy("user_id")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val horizon = col("t1") + expr("INTERVAL 1 HOUR")
        val lvl = table(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_type"))
          .withColumn("t1",
            min(when(col("event_type") === "view", col("ts"))).over(wu))
          .withColumn("t2",
            min(when(col("event_type") === "click" &&
              col("ts") >= col("t1") && col("ts") <= horizon, col("ts")))
              .over(wu))
          .withColumn("t3",
            min(when(col("event_type") === "purchase" &&
              col("ts") >= col("t2") && col("ts") <= horizon, col("ts")))
              .over(wu))
          .groupBy("user_id")
          .agg(min("t1").as("t1"), min("t2").as("t2"), min("t3").as("t3"))
          .select(col("user_id"),
            when(col("t3").isNotNull, 3).when(col("t2").isNotNull, 2)
              .when(col("t1").isNotNull, 1).otherwise(0).cast("int")
              .as("level"))
        lvl.groupBy("level").agg(count(lit(1)).as("users"))
          .orderBy("level")
      },
      Some(
        """WITH e1 AS (SELECT user_id, ts, event_type,
          |  min(CASE WHEN event_type = 'view' THEN ts END) OVER (PARTITION BY user_id) AS t1
          |  FROM events),
          | e2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts >= t1
          |    AND ts <= t1 + INTERVAL 1 HOUR THEN ts END) OVER (PARTITION BY user_id) AS t2
          |  FROM e1),
          | e3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts >= t2
          |    AND ts <= t1 + INTERVAL 1 HOUR THEN ts END) OVER (PARTITION BY user_id) AS t3
          |  FROM e2),
          | u AS (SELECT user_id, min(t1) AS t1, min(t2) AS t2, min(t3) AS t3
          |  FROM e3 GROUP BY user_id)
          | SELECT CAST(CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
          |   WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS INT) AS level,
          |  CAST(count(*) AS BIGINT) AS users
          | FROM u GROUP BY 1 ORDER BY level"""
          .stripMargin.replace("\n", ""))),

    // Interval-union coverage (gaps-and-islands): every event projects
    // a 10-minute activity interval; per user, merge overlaps into
    // islands and report island count + covered seconds. The merge is
    // the classic running-max-of-end window — one user exchange, all
    // arithmetic in integer epoch-micros (exact cross-engine), no
    // interval self-join (the naive overlap join is quadratic per user
    // and dies on power users at 100 TB; the window shape is linear).
    "q177_interval_union" -> Q(
      (s, dir) => {
        val iv = table(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("ss"),
            (unix_micros(col("ts")) + lit(600000000L)).as("ee"))
        val wPrev = Window.partitionBy("user_id").orderBy("ss", "event_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        val wRun = Window.partitionBy("user_id").orderBy("ss", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val islands = iv
          .withColumn("max_prev_e", max("ee").over(wPrev))
          .withColumn("new_island",
            when(col("max_prev_e").isNull ||
              col("ss") > col("max_prev_e"), 1L).otherwise(0L))
          .withColumn("island", sum("new_island").over(wRun))
        islands.groupBy("user_id", "island")
          .agg(count(lit(1)).as("n_ev"), min("ss").as("is_s"),
            max("ee").as("is_e"))
          .groupBy("user_id")
          .agg(sum("n_ev").as("n_events"),
            count(lit(1)).as("n_islands"),
            expr("sum(is_e - is_s) div 1000000").as("covered_s"))
          .orderBy("user_id")
      },
      Some(
        """WITH iv AS (SELECT user_id, event_id, epoch_us(ts) AS ss,
          |     epoch_us(ts) + 600000000 AS ee FROM events),
          | mk AS (SELECT *, max(ee) OVER (PARTITION BY user_id ORDER BY ss, event_id
          |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS max_prev_e
          |   FROM iv),
          | fl AS (SELECT *, CASE WHEN max_prev_e IS NULL OR ss > max_prev_e
          |     THEN 1 ELSE 0 END AS new_island FROM mk),
          | isl AS (SELECT *, sum(new_island) OVER (PARTITION BY user_id
          |     ORDER BY ss, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
          |   FROM fl),
          | g AS (SELECT user_id, island, CAST(count(*) AS BIGINT) AS n_ev,
          |     min(ss) AS is_s, max(ee) AS is_e FROM isl GROUP BY 1, 2)
          | SELECT user_id, CAST(sum(n_ev) AS BIGINT) AS n_events,
          |   CAST(count(*) AS BIGINT) AS n_islands,
          |   CAST(sum(is_e - is_s) // 1000000 AS BIGINT) AS covered_s
          | FROM g GROUP BY user_id ORDER BY user_id"""
          .stripMargin.replace("\n", ""))),

    // Funnel time-to-convert: q172's greedy chain re-derived per user
    // over a 7-DAY horizon (this stream is sparse commerce — ~7 events
    // per user per year — so the weekly consideration window is the
    // one that converts; q172 keeps the tight 1 h web-session horizon),
    // then EXACT discrete percentiles of (t3 - t1) over the converted
    // population — index selection on a row_number, all integer
    // arithmetic (idx_q = ceil(q * n) computed as (q*n + den-1) div
    // den), no interpolating percentile() whose float semantics differ
    // across engines. Scale: the percentile sort runs over the
    // CONVERTED-USER aggregate (three window passes collapse events to
    // one row per user first), a small fraction of the user dimension.
    "q182_funnel_latency" -> Q(
      (s, dir) => {
        val wu = Window.partitionBy("user_id")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val horizon = col("t1") + expr("INTERVAL 7 DAYS")
        val conv = table(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_type"))
          .withColumn("t1",
            min(when(col("event_type") === "view", col("ts"))).over(wu))
          .withColumn("t2",
            min(when(col("event_type") === "click" &&
              col("ts") >= col("t1") && col("ts") <= horizon, col("ts")))
              .over(wu))
          .withColumn("t3",
            min(when(col("event_type") === "purchase" &&
              col("ts") >= col("t2") && col("ts") <= horizon, col("ts")))
              .over(wu))
          .groupBy("user_id")
          .agg(min("t1").as("t1"), min("t3").as("t3"))
          .where(col("t3").isNotNull)
          .select(col("user_id"),
            expr("(unix_micros(t3) - unix_micros(t1)) div 1000000")
              .as("lat_s"))
        // Percentile ranks via the two-level distributed scan
        // (global-window lint r15: the converted-user frame grows with
        // the corpus — 14 -> 126 per decade — so a single-partition
        // global row_number over it serializes at scale). Chunk =
        // lat_s div 2^14: latency is domain-bounded by the 7-day
        // horizon (<= 604800 s, ~37 chunks), monotone along the order.
        val nDf = conv.agg(count(lit(1)).as("n"))
        OrderStat.scanRank(conv, Seq.empty,
            Seq(col("lat_s"), col("user_id")),
            expr("lat_s div 16384"), "rn")
          .crossJoin(broadcast(nDf))
          .agg(
            max("n").as("n_converted"),
            max(when(col("rn") === expr("(n + 1) div 2"), col("lat_s")))
              .as("p50_s"),
            max(when(col("rn") === expr("(9 * n + 9) div 10"), col("lat_s")))
              .as("p90_s"),
            max("lat_s").as("max_s"))
      },
      Some(
        """WITH e1 AS (SELECT user_id, ts, event_type,
          |  min(CASE WHEN event_type = 'view' THEN ts END) OVER (PARTITION BY user_id) AS t1
          |  FROM events),
          | e2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts >= t1
          |    AND ts <= t1 + INTERVAL 7 DAYS THEN ts END) OVER (PARTITION BY user_id) AS t2
          |  FROM e1),
          | e3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts >= t2
          |    AND ts <= t1 + INTERVAL 7 DAYS THEN ts END) OVER (PARTITION BY user_id) AS t3
          |  FROM e2),
          | u AS (SELECT user_id, min(t1) AS t1, min(t3) AS t3 FROM e3 GROUP BY user_id),
          | conv AS (SELECT user_id,
          |    (epoch_us(t3) - epoch_us(t1)) // 1000000 AS lat_s
          |  FROM u WHERE t3 IS NOT NULL),
          | r AS (SELECT lat_s, row_number() OVER (ORDER BY lat_s, user_id) AS rn,
          |    CAST(count(*) OVER () AS BIGINT) AS n FROM conv)
          | SELECT max(n) AS n_converted,
          |  max(CASE WHEN rn = (n + 1) // 2 THEN lat_s END) AS p50_s,
          |  max(CASE WHEN rn = (9 * n + 9) // 10 THEN lat_s END) AS p90_s,
          |  max(lat_s) AS max_s FROM r"""
          .stripMargin.replace("\n", ""))),

    // Daily active / new / returning users: a user is NEW on the day of
    // their first event, RETURNING on every later active day. All
    // integer (epoch-day buckets, first-seen via min) — the standard
    // growth-accounting rollup. Two aggregations over the deduped
    // (user, day) frame; the day join is day-dimension-sized.
    "q185_new_returning" -> Q(
      (s, dir) => {
        val userDay = table(s, dir, "events")
          .select(col("user_id"),
            expr("unix_micros(date_trunc('day', ts)) div 86400000000")
              .as("day"))
          .distinct()
          .localCheckpoint(eager = true)
        val active = userDay.groupBy("day")
          .agg(count(lit(1)).as("active_users"))
        val firstDay = userDay.groupBy("user_id")
          .agg(min("day").as("day"))
          .groupBy("day").agg(count(lit(1)).as("new_users"))
        active.join(firstDay, Seq("day"), "left")
          .na.fill(0L, Seq("new_users"))
          .select(col("day"), col("active_users"), col("new_users"),
            (col("active_users") - col("new_users")).as("returning_users"))
          .orderBy("day")
      },
      Some(
        """WITH ud AS (SELECT DISTINCT user_id,
          |     epoch_us(date_trunc('day', ts)) // 86400000000 AS day FROM events),
          | a AS (SELECT day, CAST(count(*) AS BIGINT) AS active_users
          |   FROM ud GROUP BY day),
          | f AS (SELECT day, CAST(count(*) AS BIGINT) AS new_users
          |   FROM (SELECT user_id, min(day) AS day FROM ud GROUP BY user_id)
          |   GROUP BY day)
          | SELECT a.day, a.active_users,
          |   CAST(coalesce(f.new_users, 0) AS BIGINT) AS new_users,
          |   a.active_users - CAST(coalesce(f.new_users, 0) AS BIGINT) AS returning_users
          | FROM a LEFT JOIN f ON a.day = f.day ORDER BY a.day"""
          .stripMargin.replace("\n", ""))),

    // Orphan-conversion audit — the as-of ANTI join: purchases with NO
    // click by the same user in the preceding hour (attribution's
    // complement; a rising orphan share means lost upstream tracking).
    // q36/q49 emit the matches; absence needs different machinery: a
    // per-user running max of click times over a RANGE frame (so a
    // click sharing the purchase's exact timestamp counts regardless
    // of event-id order — the tie rule the NOT EXISTS oracle implies),
    // then a null/age test. ONE user-key exchange, no range explosion,
    // no anti-join of corpus against corpus; the daily rollup is the
    // only other shuffle.
    "q208_orphan_purchases" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = table(s, dir, "events")
          .where(col("event_type").isin("click", "purchase"))
          .select(col("user_id"), col("event_type"), col("ts"),
            expr("unix_micros(ts)").as("tus"))
        val w = Window.partitionBy("user_id").orderBy("tus")
          .rangeBetween(Window.unboundedPreceding, Window.currentRow)
        val scored = ev
          .withColumn("last_click",
            max(when(col("event_type") === "click", col("tus"))).over(w))
          .where(col("event_type") === "purchase")
          .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
            (col("last_click").isNull ||
              col("tus") - col("last_click") > 3600L * 1000000L)
              .cast("long").as("orphan"))
        scored.groupBy("day")
          .agg(count(lit(1)).as("n_purchases"), sum("orphan").as("n_orphans"))
          .select(col("day"), col("n_purchases"), col("n_orphans"),
            expr("n_orphans * 10000 div n_purchases").as("orphan_bps"))
          .orderBy("day")
      },
      Some(
        """WITH p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
          | o AS (SELECT strftime(p.ts, '%Y-%m-%d') AS day,
          |     CASE WHEN NOT EXISTS (SELECT 1 FROM events c
          |       WHERE c.event_type = 'click' AND c.user_id = p.user_id
          |         AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR)
          |     THEN 1 ELSE 0 END AS orphan
          |   FROM p)
          | SELECT day, CAST(count(*) AS BIGINT) AS n_purchases,
          |   CAST(sum(orphan) AS BIGINT) AS n_orphans,
          |   CAST(sum(orphan) * 10000 // count(*) AS BIGINT) AS orphan_bps
          | FROM o GROUP BY day ORDER BY day"""
          .stripMargin.replace("\n", ""))),

    // Top 3-step behavioral paths: each user's (ts, event_id)-ordered
    // stream yields its consecutive event-type trigrams via two leads
    // over the SAME user window (one exchange, q171's discipline); the
    // trigram rollup is map-combinable into a bounded frame (|types|^3
    // cells), so the top-20 cut sorts ~hundreds of rows, never the
    // corpus. The path-mining counterpart of q171's 1-step matrix —
    // what a product team reads to find the dominant 3-click journeys.
    "q222_event_paths" -> Q(
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        table(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type").as("e1"))
          .withColumn("e2", lead("e1", 1).over(w))
          .withColumn("e3", lead("e1", 2).over(w))
          .where(col("e3").isNotNull)
          .select(concat_ws(">", col("e1"), col("e2"), col("e3"))
            .as("path"))
          .groupBy("path").agg(count(lit(1)).as("cnt"))
          .orderBy(desc("cnt"), col("path"))
          .limit(20)
      },
      Some(
        """WITH seq AS (SELECT event_type AS e1,
          |     lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
          |     lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3
          |   FROM events)
          | SELECT e1 || '>' || e2 || '>' || e3 AS path,
          |   CAST(count(*) AS BIGINT) AS cnt
          | FROM seq WHERE e3 IS NOT NULL
          | GROUP BY 1 ORDER BY cnt DESC, path LIMIT 20"""
          .stripMargin.replace("\n", ""))),

    // Rolling 7-day active users (DAU / WAU / stickiness), EXACT: the
    // textbook per-day COUNT(DISTINCT user) OVER 7 ROWS doesn't
    // distribute (distinct state can't merge across frames), and
    // windowed HLL is approximate. Instead: collapse events to the
    // distinct (user, day) frame ONCE, then each user-day emits its 7
    // covered window-days (a bounded x7 fanout of the COLLAPSED frame,
    // not of raw events) and a second distinct + count per day gives
    // exact WAU. Every stage is a map-combinable hash aggregate; no
    // per-event window state anywhere. stickiness = dau/wau is the
    // final IEEE division of two exact BIGINTs.
    "q224_rolling_actives" -> Q(
      (s, dir) => {
        val ud = table(s, dir, "events")
          .select(col("user_id"), to_date(col("ts")).as("day"))
          .distinct()
        val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
        val wau = ud
          .select(col("user_id"),
            explode(expr("sequence(day, date_add(day, 6))")).as("day"))
          .distinct()
          .groupBy("day").agg(count(lit(1)).as("wau"))
        dau.join(wau, Seq("day"))
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("dau"), col("wau"),
            (col("dau").cast("double") / col("wau").cast("double"))
              .as("stickiness"))
          .orderBy("day")
      },
      Some(
        """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
          | dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY day),
          | ex AS (SELECT DISTINCT user_id, day + CAST(x AS INT) AS wday
          |   FROM ud CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS x) t),
          | wau AS (SELECT wday AS day, CAST(count(*) AS BIGINT) AS wau FROM ex GROUP BY 1)
          | SELECT strftime(d.day, '%Y-%m-%d') AS day, d.dau, w.wau,
          |   CAST(d.dau AS DOUBLE) / CAST(w.wau AS DOUBLE) AS stickiness
          | FROM dau d JOIN wau w ON d.day = w.day ORDER BY day"""
          .stripMargin.replace("\n", ""))),

    // Weekly cohort retention triangle: users grouped by first-active
    // week, each cell = share (bps) of the cohort active k weeks later.
    // Weeks are integer day-offsets from the corpus min date div 7 —
    // no engine-specific week-of-year semantics to disagree on. Shape:
    // distinct (user, week) and per-user min ride ONE user exchange;
    // the triangle rollup is bounded by weeks^2 cells. All shares are
    // exact integer bps.
    "q230_retention_triangle" -> Q(
      (s, dir) => {
        val uw0 = table(s, dir, "events")
          .select(col("user_id"), to_date(col("ts")).as("day"))
        val anchor = uw0.agg(min("day").as("d0"))
        val uw = uw0.crossJoin(broadcast(anchor))
          .select(col("user_id"),
            expr("datediff(day, d0) div 7").as("wk"))
          .distinct()
        val cohorts = uw.groupBy("user_id").agg(min("wk").as("cohort"))
        val sizes = cohorts.groupBy("cohort")
          .agg(count(lit(1)).as("cohort_size"))
        uw.join(cohorts, "user_id")
          .groupBy(col("cohort"), (col("wk") - col("cohort")).as("wk_offset"))
          .agg(count(lit(1)).as("n_active"))
          .join(sizes, "cohort")
          .select(col("cohort"), col("wk_offset"), col("n_active"),
            col("cohort_size"),
            expr("n_active * 10000 div cohort_size").as("retained_bps"))
          .orderBy("cohort", "wk_offset")
      },
      Some(
        """WITH d0 AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events),
          | uw AS (SELECT DISTINCT user_id,
          |     CAST((CAST(ts AS DATE) - d0.d0) // 7 AS BIGINT) AS wk
          |   FROM events, d0),
          | ch AS (SELECT user_id, CAST(min(wk) AS BIGINT) AS cohort
          |   FROM uw GROUP BY user_id),
          | sz AS (SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_size
          |   FROM ch GROUP BY cohort),
          | cell AS (SELECT ch.cohort, uw.wk - ch.cohort AS wk_offset,
          |     CAST(count(*) AS BIGINT) AS n_active
          |   FROM uw JOIN ch USING (user_id) GROUP BY 1, 2)
          | SELECT cell.cohort, cell.wk_offset, cell.n_active, sz.cohort_size,
          |   CAST(cell.n_active * 10000 // sz.cohort_size AS BIGINT) AS retained_bps
          | FROM cell JOIN sz USING (cohort) ORDER BY cohort, wk_offset"""
          .stripMargin.replace("\n", ""))),

    // Rolling 14-OBSERVATION click/purchase correlation (NOT strictly
    // 14 calendar days: the ROWS frame runs over observed days, so a
    // day with zero click/purchase events is skipped and the window
    // can span a longer calendar range — corr14 = "last 14 days with
    // activity"; a calendar-exact variant would densify the daily
    // series or RANGE-frame an epoch-day key). The daily rollup is
    // the only corpus-size shuffle; the rolling Pearson then rides
    // INTEGER moment sums (n, sx, sy, sxx, syy, sxy) over a 14-row
    // frame of the tiny daily series, closed into a correlation by one
    // fixed double expression per row — no float accumulates across
    // rows, so the doubles agree bit-for-bit. Degenerate windows
    // (zero variance) yield NULL on both engines.
    "q233_rolling_correlation" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val daily = table(s, dir, "events")
          .where(col("event_type").isin("click", "purchase"))
          .groupBy(to_date(col("ts")).as("day"))
          .agg(
            sum(when(col("event_type") === "click", 1L).otherwise(0L))
              .as("x"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("y"))
        val w = Window.orderBy("day").rowsBetween(-13, Window.currentRow)
        daily
          .withColumn("n", count(lit(1)).over(w))
          .withColumn("sx", sum("x").over(w))
          .withColumn("sy", sum("y").over(w))
          .withColumn("sxx", sum(col("x") * col("x")).over(w))
          .withColumn("syy", sum(col("y") * col("y")).over(w))
          .withColumn("sxy", sum(col("x") * col("y")).over(w))
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("x"), col("y"), col("n"),
            when(col("n") * col("sxx") - col("sx") * col("sx") === 0 ||
              col("n") * col("syy") - col("sy") * col("sy") === 0,
              lit(null).cast("double"))
              .otherwise(
                (col("n") * col("sxy") - col("sx") * col("sy"))
                  .cast("double") /
                (sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
                  .cast("double")) *
                 sqrt((col("n") * col("syy") - col("sy") * col("sy"))
                  .cast("double")))).as("corr14"))
          .orderBy("day")
      },
      Some(
        """WITH daily AS (SELECT CAST(ts AS DATE) AS day,
          |     CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x,
          |     CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
          |   FROM events WHERE event_type IN ('click', 'purchase')
          |   GROUP BY 1),
          | m AS (SELECT day, x, y,
          |     CAST(count(*) OVER w AS BIGINT) AS n,
          |     CAST(sum(x) OVER w AS BIGINT) AS sx,
          |     CAST(sum(y) OVER w AS BIGINT) AS sy,
          |     CAST(sum(x * x) OVER w AS BIGINT) AS sxx,
          |     CAST(sum(y * y) OVER w AS BIGINT) AS syy,
          |     CAST(sum(x * y) OVER w AS BIGINT) AS sxy
          |   FROM daily
          |   WINDOW w AS (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
          | SELECT strftime(day, '%Y-%m-%d') AS day, x, y, n,
          |   CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0 THEN NULL
          |     ELSE CAST(n * sxy - sx * sy AS DOUBLE)
          |       / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
          |          * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) END AS corr14
          | FROM m ORDER BY day"""
          .stripMargin.replace("\n", ""))),

    // Attribution-window sweep: click-attribution rate of purchases at
    // THREE horizons (1h / 6h / 24h) from ONE pass — the per-user
    // running max of click times (q208's RANGE window) prices every
    // horizon simultaneously, where the naive approach runs one
    // window-join per horizon. One user exchange + a 1-row aggregate
    // unpivoted to 3 rows; the sweep a growth team reads to pick an
    // attribution policy before re-running it over 100 TB of events.
    "q237_attribution_sweep" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = table(s, dir, "events")
          .where(col("event_type").isin("click", "purchase"))
          .select(col("user_id"), col("event_type"),
            expr("unix_micros(ts)").as("tus"))
        val w = Window.partitionBy("user_id").orderBy("tus")
          .rangeBetween(Window.unboundedPreceding, Window.currentRow)
        val purch = ev
          .withColumn("last_click",
            max(when(col("event_type") === "click", col("tus"))).over(w))
          .where(col("event_type") === "purchase")
          .select((col("tus") - col("last_click")).as("delta"))
        val agg = purch.agg(count(lit(1)).as("n"),
          sum(when(col("delta") <= 3600L * 1000000L, 1L).otherwise(0L))
            .as("a1"),
          sum(when(col("delta") <= 6 * 3600L * 1000000L, 1L).otherwise(0L))
            .as("a6"),
          sum(when(col("delta") <= 24 * 3600L * 1000000L, 1L)
            .otherwise(0L)).as("a24"))
        def row(h: Int, c: String) = agg.select(
          lit(h).cast("int").as("horizon_h"), col("n").as("n_purchases"),
          col(c).as("n_attributed"),
          expr(s"$c * 10000 div n").as("attributed_bps"))
        row(1, "a1").unionByName(row(6, "a6")).unionByName(row(24, "a24"))
          .orderBy("horizon_h")
      },
      Some(
        """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS tus
          |   FROM events WHERE event_type IN ('click', 'purchase')),
          | p AS (SELECT tus - max(CASE WHEN event_type = 'click' THEN tus END)
          |     OVER (PARTITION BY user_id ORDER BY tus
          |       RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS delta,
          |     event_type FROM ev),
          | a AS (SELECT CAST(count(*) AS BIGINT) AS n,
          |     CAST(sum(CASE WHEN delta <= 3600000000 THEN 1 ELSE 0 END) AS BIGINT) AS a1,
          |     CAST(sum(CASE WHEN delta <= 21600000000 THEN 1 ELSE 0 END) AS BIGINT) AS a6,
          |     CAST(sum(CASE WHEN delta <= 86400000000 THEN 1 ELSE 0 END) AS BIGINT) AS a24
          |   FROM p WHERE event_type = 'purchase')
          | SELECT CAST(1 AS INT) AS horizon_h, n AS n_purchases, a1 AS n_attributed,
          |   CAST(a1 * 10000 // n AS BIGINT) AS attributed_bps FROM a
          | UNION ALL SELECT CAST(6 AS INT), n, a6, CAST(a6 * 10000 // n AS BIGINT) FROM a
          | UNION ALL SELECT CAST(24 AS INT), n, a24, CAST(a24 * 10000 // n AS BIGINT) FROM a
          | ORDER BY horizon_h"""
          .stripMargin.replace("\n", ""))),

    // Hour-of-week traffic heatmap: the bounded 7x24 profile (counts +
    // bps share + per-cell peak flag) every on-call dashboard starts
    // from. Day-of-week derives from the integer epoch-day ((d+4) % 7
    // anchors 1970-01-01 to Thursday) — no engine locale/week-start
    // semantics anywhere. One map-combinable rollup; windows ride the
    // 168-cell frame.
    "q246_hourweek_heatmap" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val cells = table(s, dir, "events")
          .select(
            expr("(unix_micros(ts) div 86400000000 + 4) % 7").as("dow"),
            expr("(unix_micros(ts) div 3600000000) % 24").as("hod"))
          .groupBy("dow", "hod").agg(count(lit(1)).as("n_events"))
        val wAll = Window.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)
        cells
          .withColumn("total", sum("n_events").over(wAll))
          .withColumn("peak", max("n_events").over(wAll))
          .select(col("dow"), col("hod"), col("n_events"),
            expr("n_events * 10000 div total").as("share_bps"),
            (col("n_events") === col("peak")).cast("int").as("is_peak"))
          .orderBy("dow", "hod")
      },
      Some(
        """WITH c AS (SELECT (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
          |     (epoch_us(ts) // 3600000000) % 24 AS hod,
          |     CAST(count(*) AS BIGINT) AS n_events
          |   FROM events GROUP BY 1, 2),
          | m AS (SELECT dow, hod, n_events,
          |     CAST(sum(n_events) OVER () AS BIGINT) AS total,
          |     CAST(max(n_events) OVER () AS BIGINT) AS peak FROM c)
          | SELECT dow, hod, n_events,
          |   CAST(n_events * 10000 // total AS BIGINT) AS share_bps,
          |   CAST(n_events = peak AS INT) AS is_peak
          | FROM m ORDER BY dow, hod"""
          .stripMargin.replace("\n", ""))),

    // Persistent heavy users: who sits in the DAILY top-10 (by event
    // count) on the most days — the stable-abuser / power-user report,
    // as opposed to one-day spikes. TopKPerGroup pre-reduces each
    // day's leaderboard before any exchange (answer-proportional:
    // 10 x days rows survive), then a bounded persistence rollup; the
    // final cut keeps users with >= 3 top-10 days. Ties inside a day
    // break on user_id — deterministic on both engines.
    "q253_persistent_heavy_users" -> Q(
      (s, dir) => {
        val daily = table(s, dir, "events")
          .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"),
            col("user_id"))
          .agg(count(lit(1)).as("cnt"))
        val top = graft.plans.TopKPerGroup(daily, Seq("day"),
          Seq(("cnt", true), ("user_id", false)), 10)
        top.groupBy("user_id")
          .agg(count(lit(1)).as("days_in_top10"),
            sum("cnt").as("events_in_top10"),
            min("day").as("first_day"), max("day").as("last_day"))
          .where(col("days_in_top10") >= 3)
          .orderBy(desc("days_in_top10"), desc("events_in_top10"),
            col("user_id"))
      },
      Some(
        """WITH d AS (SELECT strftime(ts, '%Y-%m-%d') AS day, user_id,
          |     CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2),
          | r AS (SELECT day, user_id, cnt,
          |     row_number() OVER (PARTITION BY day ORDER BY cnt DESC, user_id) AS rn
          |   FROM d),
          | t AS (SELECT day, user_id, cnt FROM r WHERE rn <= 10)
          | SELECT user_id, CAST(count(*) AS BIGINT) AS days_in_top10,
          |   CAST(sum(cnt) AS BIGINT) AS events_in_top10,
          |   min(day) AS first_day, max(day) AS last_day
          | FROM t GROUP BY user_id HAVING count(*) >= 3
          | ORDER BY days_in_top10 DESC, events_in_top10 DESC, user_id"""
          .stripMargin.replace("\n", ""))),

    // View-abandonment rate by hour of day: views with NO purchase by
    // the same user within the following hour, as a share of that
    // hour-of-day's views. The "next purchase" comes from one
    // REVERSE-range window per user (min purchase time at-or-after
    // each event) — q208's machinery pointed forward — so the whole
    // sweep is one user exchange + a 24-row rollup, never a view-vs-
    // purchase self-join.
    "q254_abandonment_by_hour" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = table(s, dir, "events")
          .where(col("event_type").isin("view", "purchase"))
          .select(col("user_id"), col("event_type"),
            expr("unix_micros(ts)").as("tus"))
        val w = Window.partitionBy("user_id").orderBy("tus")
          .rangeBetween(Window.currentRow, Window.unboundedFollowing)
        ev
          .withColumn("next_purchase",
            min(when(col("event_type") === "purchase", col("tus")))
              .over(w))
          .where(col("event_type") === "view")
          .select(expr("(tus div 3600000000) % 24").as("hod"),
            (col("next_purchase").isNull ||
              col("next_purchase") - col("tus") > 3600L * 1000000L)
              .cast("long").as("abandoned"))
          .groupBy("hod")
          .agg(count(lit(1)).as("n_views"), sum("abandoned")
            .as("n_abandoned"))
          .select(col("hod"), col("n_views"), col("n_abandoned"),
            expr("n_abandoned * 10000 div n_views").as("abandon_bps"))
          .orderBy("hod")
      },
      Some(
        """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS tus
          |   FROM events WHERE event_type IN ('view', 'purchase')),
          | nx AS (SELECT user_id, event_type, tus,
          |     min(CASE WHEN event_type = 'purchase' THEN tus END)
          |       OVER (PARTITION BY user_id ORDER BY tus
          |         RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_purchase
          |   FROM ev),
          | v AS (SELECT (tus // 3600000000) % 24 AS hod,
          |     CASE WHEN next_purchase IS NULL OR next_purchase - tus > 3600000000
          |       THEN 1 ELSE 0 END AS abandoned
          |   FROM nx WHERE event_type = 'view')
          | SELECT hod, CAST(count(*) AS BIGINT) AS n_views,
          |   CAST(sum(abandoned) AS BIGINT) AS n_abandoned,
          |   CAST(sum(abandoned) * 10000 // count(*) AS BIGINT) AS abandon_bps
          | FROM v GROUP BY hod ORDER BY hod"""
          .stripMargin.replace("\n", ""))),

    // Session-handoff matrix: how sessions END and how the user's NEXT
    // session begins — the (last event of session k, first event of
    // session k+1) transition counts. Sessions are 30-minute-gap
    // islands (q50's rule); the session id, the first/last flags, and
    // the cross-session lead all ride windows on the SAME user
    // partition — one exchange of the event log end to end, then a
    // bounded |types|^2 rollup. The "do error-terminated sessions
    // come back?" read.
    "q259_session_handoff" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val wSeq = Window.partitionBy("user_id").orderBy("tus", "event_id")
        val wRun = wSeq.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)
        val ev = table(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("event_type"),
            expr("unix_micros(ts)").as("tus"))
          .withColumn("prev_t", lag("tus", 1).over(wSeq))
          .withColumn("new_sess",
            when(col("prev_t").isNull ||
              col("tus") - col("prev_t") > 1800L * 1000000L, 1L)
              .otherwise(0L))
          .withColumn("sess", sum("new_sess").over(wRun))
        val wSess = Window.partitionBy("user_id", "sess")
          .orderBy("tus", "event_id")
        val edges = ev
          .withColumn("rn", row_number().over(wSess))
          .withColumn("cnt", count(lit(1)).over(
            Window.partitionBy("user_id", "sess")))
          .withColumn("next_first",
            lead(when(col("rn") === 1, col("event_type")), 1).over(
              Window.partitionBy("user_id").orderBy("sess", "rn")))
          .where(col("rn") === col("cnt") && col("next_first").isNotNull)
          .select(col("event_type").as("ends_with"),
            col("next_first").as("resumes_with"))
        edges.groupBy("ends_with", "resumes_with")
          .agg(count(lit(1)).as("n_handoffs"))
          .orderBy("ends_with", "resumes_with")
      },
      Some(
        """WITH ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS tus
          |   FROM events),
          | g AS (SELECT *, CASE WHEN lag(tus) OVER w IS NULL
          |       OR tus - lag(tus) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_sess
          |   FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
          | ss AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id
          |     ORDER BY tus, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
          |   FROM g),
          | f AS (SELECT *, row_number() OVER (PARTITION BY user_id, sess ORDER BY tus, event_id) AS rn,
          |     count(*) OVER (PARTITION BY user_id, sess) AS cnt FROM ss),
          | h AS (SELECT *, lead(CASE WHEN rn = 1 THEN event_type END)
          |     OVER (PARTITION BY user_id ORDER BY sess, rn) AS next_first FROM f)
          | SELECT event_type AS ends_with, next_first AS resumes_with,
          |   CAST(count(*) AS BIGINT) AS n_handoffs
          | FROM h WHERE rn = cnt AND next_first IS NOT NULL
          | GROUP BY 1, 2 ORDER BY ends_with, resumes_with"""
          .stripMargin.replace("\n", ""))),

    // Lambda-architecture unified serving view (VERDICT r7 #8's
    // streaming-batch unification, expressed batch-side): the BATCH
    // layer reads the compacted daily grain for everything older than
    // the 7-day speed horizon (in production a materialized rollup —
    // modeled here by aggregating to days first), the SPEED layer
    // scans only the raw tail (partition-prunable by the cutoff), and
    // the serving view is their sum. The query also RECONCILES the
    // view against a direct raw recompute — the lambda consistency
    // audit — so the oracle pins both the unified numbers and the
    // boundary correctness (no double-counted or dropped day at the
    // batch/speed seam). Full outer join: an event type alive in only
    // one layer must still serve.
    "q270_lambda_view" -> Q(
      (s, dir) => {
        val ev = table(s, dir, "events")
          .select(col("event_type"), to_date(col("ts")).as("day"))
        val cut = ev.agg(date_sub(max("day"), 7).as("cut"))
        val tagged = ev.crossJoin(broadcast(cut))
        val batchL = tagged.where(col("day") < col("cut"))
          .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
          .groupBy("event_type")
          .agg(sum("n").as("batch_events"),
            count(lit(1)).as("batch_days"))
        val speedL = tagged.where(col("day") >= col("cut"))
          .groupBy("event_type").agg(count(lit(1)).as("speed_events"))
        val raw = ev.groupBy("event_type").agg(count(lit(1)).as("raw_total"))
        batchL.join(speedL, Seq("event_type"), "full")
          .select(col("event_type"),
            coalesce(col("batch_events"), lit(0L)).as("batch_events"),
            coalesce(col("batch_days"), lit(0L)).as("batch_days"),
            coalesce(col("speed_events"), lit(0L)).as("speed_events"))
          .withColumn("total", col("batch_events") + col("speed_events"))
          .join(raw, "event_type")
          .withColumn("consistent",
            (col("total") === col("raw_total")).cast("int"))
          .orderBy("event_type")
      },
      Some(
        """WITH ev AS (SELECT event_type, CAST(ts AS DATE) AS day FROM events),
          | cut AS (SELECT max(day) - 7 AS cut FROM ev),
          | b AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS batch_events,
          |     CAST(count(*) AS BIGINT) AS batch_days
          |   FROM (SELECT event_type, day, count(*) AS n FROM ev, cut
          |     WHERE day < cut GROUP BY 1, 2) GROUP BY event_type),
          | sp AS (SELECT event_type, CAST(count(*) AS BIGINT) AS speed_events
          |   FROM ev, cut WHERE day >= cut GROUP BY event_type),
          | raw AS (SELECT event_type, CAST(count(*) AS BIGINT) AS raw_total
          |   FROM ev GROUP BY event_type),
          | u AS (SELECT coalesce(b.event_type, sp.event_type) AS event_type,
          |     coalesce(b.batch_events, 0) AS batch_events,
          |     coalesce(b.batch_days, 0) AS batch_days,
          |     coalesce(sp.speed_events, 0) AS speed_events
          |   FROM b FULL JOIN sp ON b.event_type = sp.event_type)
          | SELECT u.event_type, u.batch_events, u.batch_days, u.speed_events,
          |   u.batch_events + u.speed_events AS total, raw.raw_total,
          |   CAST(u.batch_events + u.speed_events = raw.raw_total AS INT)
          |     AS consistent
          | FROM u JOIN raw ON u.event_type = raw.event_type
          | ORDER BY u.event_type""".stripMargin.replace("\n", ""))),

    // Transition dwell times: q171's Markov matrix weighted by HOW
    // LONG each step takes — per (src, dst) event-type transition, the
    // discrete lower-median and max gap in whole seconds. Gaps come
    // from one lead on the user partition (q171's exchange). The
    // median does NOT sort transition rows: gap_s is an integer, so a
    // count-per-(src,dst,gap_s) pre-aggregate (map-combinable) shrinks
    // the frame to distinct gap values — bounded by the observed gap
    // DOMAIN in seconds, not by N (at 100x the per-user event density
    // rises and gaps shrink) — and a cumulative-count over that
    // aggregate locates the median value directly. No task ever holds
    // a corpus-sized (src,dst) group; order-statistic median, no
    // interpolation.
    "q264_transition_dwell" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val wSeq = Window.partitionBy("user_id").orderBy("tus", "event_id")
        val trans = table(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            col("event_type").as("src"), expr("unix_micros(ts)").as("tus"))
          .withColumn("dst", lead("src", 1).over(wSeq))
          .withColumn("next_t", lead("tus", 1).over(wSeq))
          .where(col("dst").isNotNull)
          .select(col("src"), col("dst"),
            expr("(next_t - tus) div 1000000").as("gap_s"))
        val gapCounts = trans.groupBy("src", "dst", "gap_s")
          .agg(count(lit(1)).as("gc"))
        val wPair = Window.partitionBy("src", "dst")
        gapCounts
          .withColumn("cum", sum("gc").over(wPair.orderBy("gap_s")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("cnt", sum("gc").over(wPair))
          .withColumn("max_gap", max("gap_s").over(wPair))
          .where(col("cum") >= expr("(cnt + 1) div 2") &&
            col("cum") - col("gc") < expr("(cnt + 1) div 2"))
          .select(col("src"), col("dst"), col("cnt").as("n_trans"),
            col("gap_s").as("median_gap_s"), col("max_gap"))
          .orderBy("src", "dst")
      },
      Some(
        """WITH seq AS (SELECT user_id, event_type AS src,
          |     lead(event_type) OVER w AS dst,
          |     (lead(epoch_us(ts)) OVER w - epoch_us(ts)) // 1000000 AS gap_s
          |   FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
          | t AS (SELECT src, dst, gap_s FROM seq WHERE dst IS NOT NULL),
          | r AS (SELECT src, dst, gap_s,
          |     row_number() OVER (PARTITION BY src, dst ORDER BY gap_s) AS rn,
          |     count(*) OVER (PARTITION BY src, dst) AS cnt,
          |     max(gap_s) OVER (PARTITION BY src, dst) AS max_gap
          |   FROM t)
          | SELECT src, dst, CAST(cnt AS BIGINT) AS n_trans,
          |   CAST(gap_s AS BIGINT) AS median_gap_s,
          |   CAST(max_gap AS BIGINT) AS max_gap
          | FROM r WHERE rn = (cnt + 1) // 2 ORDER BY src, dst"""
          .stripMargin.replace("\n", "")))
  )
}
