package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import TestData._
import DedupOps.md5Long60

/** Probabilistic-structure operators with fully deterministic, DuckDB-
  * replayable state: a Count-Min sketch (heavy-hitter frequency
  * estimation) and a Bloom filter (set-membership decontamination).
  * Companion to q124's HyperLogLog (ExtendedOps) and q51's bounded
  * sketches: here the ENTIRE structure — every register/bit — is built
  * from the md5-60-bit hash bridge, so the oracle replays the sketch
  * bit-for-bit rather than merely bounding it.
  *
  * 100 TB posture (both): the sketch state is a FIXED-SIZE aggregate
  * (d x w counters / m bits), built map-side-combinable and mergeable
  * across any partitioning — the layout a 1000-executor rollup needs.
  * Estimation joins broadcast the sketch, never shuffle the corpus.
  */
object SketchOps {

  /** Row-j CMS bucket for a key: md5-60-bit of "j-key" mod width.
    * Independent-enough hash rows come from salting the same base hash
    * family with the row index, the standard CMS construction.
    */
  private def cmsBucket(key: Column, j: Int, width: Int): Column =
    md5Long60(concat_ws("-", lit(j), key)) % width

  private val CmsDepth = 4
  private val CmsWidth = 512

  /** Bloom bit position i for a text: md5-60-bit of "i:text" mod m. */
  private def bloomBit(text: Column, i: Int, m: Int): Column =
    md5Long60(concat_ws(":", lit(i), text)) % m

  private val BloomK = 5
  private val BloomM = 8192

  def all: Map[String, Q] = Map(

    // Count-Min sketch heavy hitters: d=4 rows x w=512 counters over
    // events.user_id; per-key estimate = min over rows of the counter
    // at that key's bucket (Cormode & Muthukrishnan 2005). The top-20
    // heaviest users (by exact count; tie-broken by id) are reported
    // with both exact and CMS counts, so the one-sided overestimate
    // guarantee (cms_est >= exact, always) is value-pinned by the
    // oracle. At scale the 2048-counter sketch replaces a full
    // groupBy-key pass for frequency screening: counters max out the
    // shuffle at d*w rows regardless of corpus size, and two sketches
    // merge by elementwise addition.
    "q126_cms_heavy_hitters" -> Q(
      (s, dir) => {
        val ev = table(s, dir, "events")
        val rows = posexplode(array((0 until CmsDepth).map(j =>
          cmsBucket(col("user_id"), j, CmsWidth)): _*))
        val sketch = ev.select(col("user_id"))
          .select(rows)
          .groupBy(col("pos").as("j"), col("col").as("bucket"))
          .agg(count(lit(1)).as("cnt"))
        val exact = ev.groupBy("user_id").agg(count(lit(1)).as("exact_cnt"))
        val est = exact.select(col("user_id"), col("exact_cnt"), rows)
          .join(broadcast(sketch),
            col("pos") === col("j") && col("col") === col("bucket"))
          .groupBy("user_id", "exact_cnt")
          .agg(min("cnt").as("cms_est"))
        est
          .orderBy(col("exact_cnt").desc, col("user_id"))
          .limit(20)
          .select(col("user_id"), col("exact_cnt"), col("cms_est"),
            (col("cms_est") - col("exact_cnt")).as("overcount"))
          .orderBy(col("exact_cnt").desc, col("user_id"))
      },
      Some(
        s"""WITH j AS (SELECT unnest(generate_series(0, ${CmsDepth - 1})) AS j),
           | h AS (SELECT e.user_id, j.j,
           |   ('0x' || substr(md5(j.j::VARCHAR || '-' || e.user_id::VARCHAR), 1, 15))::BIGINT % $CmsWidth AS bucket
           |   FROM events e CROSS JOIN j),
           | sk AS (SELECT j, bucket, count(*) AS cnt FROM h GROUP BY 1, 2),
           | ex AS (SELECT user_id, count(*) AS exact_cnt FROM events GROUP BY 1),
           | kb AS (SELECT ex.user_id, ex.exact_cnt, j.j,
           |   ('0x' || substr(md5(j.j::VARCHAR || '-' || ex.user_id::VARCHAR), 1, 15))::BIGINT % $CmsWidth AS bucket
           |   FROM ex CROSS JOIN j),
           | est AS (SELECT kb.user_id, kb.exact_cnt, min(sk.cnt) AS cms_est
           |   FROM kb JOIN sk USING (j, bucket) GROUP BY 1, 2),
           | top AS (SELECT * FROM est ORDER BY exact_cnt DESC, user_id LIMIT 20)
           | SELECT user_id, exact_cnt, cms_est, cms_est - exact_cnt AS overcount
           | FROM top ORDER BY exact_cnt DESC, user_id""".stripMargin
          .replace("\n", ""))),

    // Bloom-filter decontamination: the q86 benchmark set (doc_id % 97
    // == 0) is compressed to an m=8192-bit / k=5 filter; every corpus
    // doc tests its 5 bit positions against the filter. bloom_maybe=1
    // for every true member (no false negatives — pinned by the oracle
    // on every row) plus a hash-determined set of false positives,
    // reported explicitly. At 100 TB this is THE membership-check
    // layout: the filter is a kilobyte-scale broadcast no matter how
    // big the benchmark suite, vs q86's broadcast of the full distinct
    // shingle set; the corpus side stays a per-row codegen'd probe with
    // no shuffle at all.
    "q127_bloom_decontam" -> Q(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val bench = docs.where(col("doc_id") % 97 === 0)
        val bits = bench
          .select(explode(array((0 until BloomK).map(i =>
            bloomBit(col("text"), i, BloomM)): _*)).as("bit"))
          .distinct()
        val probes = docs.select(col("doc_id"),
            explode(array((0 until BloomK).map(i =>
              bloomBit(col("text"), i, BloomM)): _*)).as("bit"))
          .join(broadcast(bits.withColumn("hit", lit(1))), Seq("bit"), "left")
          .groupBy("doc_id")
          .agg((sum(coalesce(col("hit"), lit(0))) === BloomK)
            .cast("int").as("bloom_maybe"))
        val exact = docs.alias("d")
          .join(bench.select(col("text").as("btext")).distinct().alias("b"),
            col("d.text") === col("b.btext"), "left")
          .select(col("d.doc_id"),
            when(col("b.btext").isNotNull, 1).otherwise(0).as("exact_member"))
        probes.join(exact, "doc_id")
          .select(col("doc_id"), col("bloom_maybe"), col("exact_member"),
            (col("bloom_maybe") === 1 && col("exact_member") === 0)
              .cast("int").as("false_positive"))
          .orderBy("doc_id")
      },
      Some(
        s"""WITH i AS (SELECT unnest(generate_series(0, ${BloomK - 1})) AS i),
           | bench AS (SELECT text FROM documents WHERE doc_id % 97 = 0),
           | bits AS (SELECT DISTINCT
           |   ('0x' || substr(md5(i.i::VARCHAR || ':' || b.text), 1, 15))::BIGINT % $BloomM AS bit
           |   FROM bench b CROSS JOIN i),
           | pr AS (SELECT d.doc_id,
           |   ('0x' || substr(md5(i.i::VARCHAR || ':' || d.text), 1, 15))::BIGINT % $BloomM AS bit
           |   FROM documents d CROSS JOIN i),
           | bm AS (SELECT pr.doc_id,
           |   CAST(sum(CASE WHEN bits.bit IS NOT NULL THEN 1 ELSE 0 END) = $BloomK AS INT) AS bloom_maybe
           |   FROM pr LEFT JOIN bits USING (bit) GROUP BY 1),
           | ex AS (SELECT d.doc_id,
           |   CASE WHEN EXISTS (SELECT 1 FROM bench b WHERE b.text = d.text)
           |     THEN 1 ELSE 0 END AS exact_member FROM documents d)
           | SELECT bm.doc_id, bm.bloom_maybe, ex.exact_member,
           |   CAST(bm.bloom_maybe = 1 AND ex.exact_member = 0 AS INT) AS false_positive
           | FROM bm JOIN ex USING (doc_id) ORDER BY doc_id""".stripMargin
          .replace("\n", ""))),

    // Sketch-based join-cardinality estimation: the optimizer
    // pre-flight that answers "how big is A JOIN B on user_id" without
    // running the join. Sides are the first/second time-halves of the
    // event stream (q143's midpoint split); each side is compressed to
    // the SAME d=4 x w=512 counter sketch keyed by the md5-60 bridge,
    // and each depth row estimates the join size as the bucket-wise
    // inner product sum(cntA*cntB) — an over-estimate of the true
    // sum-over-keys(a_u*b_u) for non-negative counts (AMS/CMS inner
    // product, Alon-Matias-Szegedy 1996), so est_j >= exact on every
    // row, pinned by the oracle. 100 TB posture: sketch state is
    // 2*d*w counters regardless of corpus size, built map-side
    // combinable in ONE pass (no per-side shuffle of the event grain);
    // the exact check — the thing the sketch replaces — is the only
    // user-key aggregation.
    "q147_cms_join_size" -> Q(
      (s, dir) => {
        val ev = table(s, dir, "events")
          .select(col("user_id"),
            expr("unix_micros(ts) div 1000000").as("ts_s"))
        val mid = ev.agg(expr("(min(ts_s) + max(ts_s)) div 2").as("mid"))
        val halves = ev.crossJoin(broadcast(mid))
          .select(col("user_id"), (col("ts_s") <= col("mid")).as("h1"))
        val rows = posexplode(array((0 until CmsDepth).map(j =>
          cmsBucket(col("user_id"), j, CmsWidth)): _*))
        val sketch = halves.select(col("h1"), rows)
          .groupBy(col("pos").as("j"), col("col").as("bucket"))
          .agg(sum(when(col("h1"), 1L).otherwise(0L)).as("ca"),
            sum(when(!col("h1"), 1L).otherwise(0L)).as("cb"))
        val est = sketch.groupBy("j")
          .agg(sum(col("ca") * col("cb")).as("est_join_rows"))
        val exact = halves.groupBy("user_id")
          .agg(sum(when(col("h1"), 1L).otherwise(0L)).as("a"),
            sum(when(!col("h1"), 1L).otherwise(0L)).as("b"))
          .agg(sum(col("a") * col("b")).as("exact_join_rows"))
        est.crossJoin(broadcast(exact))
          .select(col("j").cast("int").as("j"), col("est_join_rows"),
            col("exact_join_rows"),
            expr("(est_join_rows - exact_join_rows) * 10000 div greatest(exact_join_rows, 1)")
              .as("over_bps"))
          .orderBy("j")
      },
      Some(
        s"""WITH e AS (SELECT user_id, epoch_us(ts) // 1000000 AS ts_s FROM events),
           | b AS (SELECT (min(ts_s) + max(ts_s)) // 2 AS mid FROM e),
           | h AS (SELECT user_id, ts_s <= b.mid AS h1 FROM e CROSS JOIN b),
           | jj AS (SELECT unnest(generate_series(0, ${CmsDepth - 1})) AS j),
           | sk AS (SELECT jj.j,
           |   ('0x' || substr(md5(jj.j::VARCHAR || '-' || h.user_id::VARCHAR), 1, 15))::BIGINT % $CmsWidth AS bucket,
           |   CAST(sum(CASE WHEN h.h1 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
           |   CAST(sum(CASE WHEN h.h1 THEN 0 ELSE 1 END) AS BIGINT) AS cb
           |   FROM h CROSS JOIN jj GROUP BY 1, 2),
           | est AS (SELECT j, CAST(sum(ca * cb) AS BIGINT) AS est_join_rows
           |   FROM sk GROUP BY 1),
           | ab AS (SELECT user_id, CAST(sum(CASE WHEN h1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
           |   CAST(sum(CASE WHEN h1 THEN 0 ELSE 1 END) AS BIGINT) AS b
           |   FROM h GROUP BY 1),
           | ex AS (SELECT CAST(sum(a * b) AS BIGINT) AS exact_join_rows FROM ab)
           | SELECT CAST(est.j AS INT) AS j, est.est_join_rows, ex.exact_join_rows,
           |   CAST((est.est_join_rows - ex.exact_join_rows) * 10000
           |     // greatest(ex.exact_join_rows, 1) AS BIGINT) AS over_bps
           | FROM est CROSS JOIN ex ORDER BY j""".stripMargin
          .replace("\n", ""))),

    // KMV (k-minimum-values / bottom-k) distinct sketch per event type,
    // plus the MERGED union sketch built from the per-type sketches
    // alone (Bar-Yossef et al. 2002; the Theta-sketch family's
    // workhorse). State per scope is the k=64 smallest md5-60 hashes of
    // user_id; the estimator is (k-1) * 2^60 / h_k (exact n when the
    // scope holds < k users). 63 * 2^60 is exact in an IEEE double (6-
    // bit mantissa times a power of two) and the one division is
    // correctly rounded, so the estimate is bit-identical cross-engine;
    // err_bps goes through an explicit floor() (DuckDB's double->BIGINT
    // cast ROUNDS where Spark truncates — the floor keeps both on the
    // same integer). The union row pins MERGEABILITY: union(A, B) =
    // bottom-k(sketch(A) ++ sketch(B)) touches only 64 x |types| sketch
    // values, never the corpus — the property that lets 1000 executors
    // sketch independently and a coordinator combine k-sized states.
    // 100 TB posture: candidate generation is the TopKPerGroup custom
    // operator (partial k-heaps ahead of the exchange — shuffle volume
    // is answer-proportional, 64 rows per type), and the union re-rank
    // is a TakeOrdered over <= 64 x |types| rows.
    "q156_kmv_distinct" -> Q(
      (s, dir) => {
        val k = 64
        val h = table(s, dir, "events")
          .select(col("event_type"),
            md5Long60(col("user_id").cast("string")).as("h"))
          .distinct()
        // The per-type sketch is 64 x |types| rows — checkpoint it so
        // the union-merge branch reuses the materialized state instead
        // of replaying the whole TopK tower (and its corpus scan) a
        // second time. The exact_users columns are GATE CALIBRATION
        // only: at real scale the sketch replaces those corpus-wide
        // aggregations — the production read path touches nothing but
        // the k-sized states.
        val perType = graft.plans.TopKPerGroup(
            h, Seq("event_type"), Seq(("h", false)), k)
          .localCheckpoint(eager = true)
        val sk = perType.groupBy(col("event_type").as("scope"))
          .agg(count(lit(1)).as("n_sketch"), max("h").as("hk"))
        val ex = h.groupBy(col("event_type").as("scope"))
          .agg(count(lit(1)).as("exact_users"))
        val usk = perType.select("h").distinct().orderBy("h").limit(k)
          .agg(count(lit(1)).as("n_sketch"), max("h").as("hk"))
          .select(lit("__union__").as("scope"), col("n_sketch"), col("hk"))
        val uex = h.select("h").distinct()
          .agg(count(lit(1)).as("exact_users"))
          .select(lit("__union__").as("scope"), col("exact_users"))
        sk.unionByName(usk).join(ex.unionByName(uex), "scope")
          .withColumn("kmv_est",
            when(col("n_sketch") < k, col("n_sketch").cast("double"))
              .otherwise(lit(63.0 * 1152921504606846976.0) / col("hk")))
          .withColumn("err_bps", expr(
            "cast(floor(abs(kmv_est - exact_users) * 10000 / exact_users) as bigint)"))
          .select(col("scope"), col("n_sketch"), col("hk"),
            col("exact_users"), col("kmv_est"), col("err_bps"))
          .orderBy("scope")
      },
      Some(
        """WITH h AS (SELECT DISTINCT event_type,
          |     ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
          |   FROM events),
          | r AS (SELECT event_type, h,
          |     row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM h),
          | sk AS (SELECT event_type AS scope, CAST(count(*) AS BIGINT) AS n_sketch,
          |     max(h) AS hk FROM r WHERE rn <= 64 GROUP BY 1),
          | ur AS (SELECT h, row_number() OVER (ORDER BY h) AS rn
          |   FROM (SELECT DISTINCT h FROM r WHERE rn <= 64)),
          | usk AS (SELECT '__union__' AS scope, CAST(count(*) AS BIGINT) AS n_sketch,
          |     max(h) AS hk FROM ur WHERE rn <= 64),
          | ex AS (SELECT event_type AS scope, CAST(count(*) AS BIGINT) AS exact_users
          |   FROM h GROUP BY 1),
          | uex AS (SELECT '__union__' AS scope,
          |     CAST(count(DISTINCT h) AS BIGINT) AS exact_users FROM h),
          | a AS (SELECT * FROM sk UNION ALL SELECT * FROM usk),
          | e AS (SELECT * FROM ex UNION ALL SELECT * FROM uex),
          | j AS (SELECT a.scope, a.n_sketch, a.hk, e.exact_users,
          |     CASE WHEN a.n_sketch < 64 THEN CAST(a.n_sketch AS DOUBLE)
          |       ELSE 63.0 * 1152921504606846976 / a.hk END AS kmv_est
          |   FROM a JOIN e USING (scope))
          | SELECT scope, n_sketch, hk, exact_users, kmv_est,
          |   CAST(floor(abs(kmv_est - exact_users) * 10000 / exact_users) AS BIGINT) AS err_bps
          | FROM j ORDER BY scope""".stripMargin.replace("\n", ""))),

    // KMV INTERSECTION estimate for every audience pair (Theta-sketch
    // set algebra over q156's per-type states): merge two bottom-64
    // sketches into the pair's union sketch, count members present in
    // BOTH input sketches (m_common), and estimate |A ∩ B| =
    // (m / k') * est|A ∪ B| — the Bar-Yossef/Beyer ratio estimator.
    // Everything after the per-type sketches touches only k-sized
    // state: 10 audience pairs x <= 128 sketch values. The exact_inter
    // column is gate calibration only (at scale the sketch REPLACES
    // that corpus-wide pair join). Cross-engine exactness: same
    // estimator arithmetic as q156 (63 * 2^60 exact in a double, one
    // correctly-rounded division), ratio-then-multiply in pinned order,
    // err through an explicit floor().
    "q173_kmv_intersect" -> Q(
      (s, dir) => {
        val k = 64
        val h = table(s, dir, "events")
          .select(col("event_type").as("t"),
            md5Long60(col("user_id").cast("string")).as("h"))
          .distinct()
        val sv = graft.plans.TopKPerGroup(h, Seq("t"), Seq(("h", false)), k)
          .localCheckpoint(eager = true)
        val types = sv.select("t").distinct()
        val mA = sv.alias("x").join(types.alias("y"), col("x.t") < col("y.t"))
          .select(col("x.t").as("ta"), col("y.t").as("tb"), col("x.h").as("h"),
            lit(1L).as("in_a"), lit(0L).as("in_b"))
        val mB = sv.alias("x").join(types.alias("y"), col("y.t") < col("x.t"))
          .select(col("y.t").as("ta"), col("x.t").as("tb"), col("x.h").as("h"),
            lit(0L).as("in_a"), lit(1L).as("in_b"))
        val merged = mA.unionByName(mB)
          .groupBy("ta", "tb", "h")
          .agg(max("in_a").as("in_a"), max("in_b").as("in_b"))
        val u = graft.plans.TopKPerGroup(
            merged, Seq("ta", "tb"), Seq(("h", false)), k)
          .groupBy("ta", "tb")
          .agg(count(lit(1)).as("n_sketch"), max("h").as("hk"),
            sum(col("in_a") * col("in_b")).as("m_common"))
        val exact = h.alias("x").join(h.alias("y"),
            col("x.h") === col("y.h") && col("x.t") < col("y.t"))
          .groupBy(col("x.t").as("ta"), col("y.t").as("tb"))
          .agg(count(lit(1)).as("exact_inter"))
        u.join(exact, Seq("ta", "tb"), "left")
          .na.fill(0L, Seq("exact_inter"))
          .withColumn("union_est",
            when(col("n_sketch") < k, col("n_sketch").cast("double"))
              .otherwise(lit(63.0 * 1152921504606846976.0) / col("hk")))
          .withColumn("inter_est",
            col("m_common").cast("double") / col("n_sketch").cast("double")
              * col("union_est"))
          .withColumn("err_bps", expr("cast(floor(abs(inter_est - exact_inter)" +
            " * 10000 / greatest(exact_inter, 1)) as bigint)"))
          .select(col("ta"), col("tb"), col("n_sketch"), col("m_common"),
            col("union_est"), col("inter_est"), col("exact_inter"),
            col("err_bps"))
          .orderBy("ta", "tb")
      },
      Some(
        """WITH h AS (SELECT DISTINCT event_type AS t,
          |     ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
          |   FROM events),
          | r AS (SELECT t, h, row_number() OVER (PARTITION BY t ORDER BY h) AS rn FROM h),
          | sv AS (SELECT t, h FROM r WHERE rn <= 64),
          | ty AS (SELECT DISTINCT t FROM sv),
          | m1 AS (SELECT x.t AS ta, y.t AS tb, x.h AS h, 1 AS in_a, 0 AS in_b
          |   FROM sv x JOIN ty y ON x.t < y.t),
          | m2 AS (SELECT y.t AS ta, x.t AS tb, x.h AS h, 0 AS in_a, 1 AS in_b
          |   FROM sv x JOIN ty y ON y.t < x.t),
          | mm AS (SELECT ta, tb, h, max(in_a) AS in_a, max(in_b) AS in_b
          |   FROM (SELECT * FROM m1 UNION ALL SELECT * FROM m2) GROUP BY ta, tb, h),
          | mr AS (SELECT *, row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS rn FROM mm),
          | u AS (SELECT ta, tb, CAST(count(*) AS BIGINT) AS n_sketch, max(h) AS hk,
          |     CAST(sum(in_a * in_b) AS BIGINT) AS m_common
          |   FROM mr WHERE rn <= 64 GROUP BY ta, tb),
          | ex AS (SELECT x.t AS ta, y.t AS tb, CAST(count(*) AS BIGINT) AS exact_inter
          |   FROM h x JOIN h y ON x.h = y.h AND x.t < y.t GROUP BY 1, 2),
          | est AS (SELECT u.ta, u.tb, n_sketch, m_common,
          |     CASE WHEN n_sketch < 64 THEN CAST(n_sketch AS DOUBLE)
          |       ELSE 63.0 * 1152921504606846976 / hk END AS union_est,
          |     CAST(coalesce(exact_inter, 0) AS BIGINT) AS exact_inter
          |   FROM u LEFT JOIN ex ON u.ta = ex.ta AND u.tb = ex.tb),
          | f AS (SELECT ta, tb, n_sketch, m_common, union_est,
          |     CAST(m_common AS DOUBLE) / CAST(n_sketch AS DOUBLE) * union_est AS inter_est,
          |     exact_inter FROM est)
          | SELECT ta, tb, n_sketch, m_common, union_est, inter_est, exact_inter,
          |   CAST(floor(abs(inter_est - exact_inter) * 10000 / greatest(exact_inter, 1)) AS BIGINT) AS err_bps
          | FROM f ORDER BY ta, tb""".stripMargin.replace("\n", ""))),

    // Deterministic Poisson bootstrap — confidence intervals for a
    // 100 TB aggregate in ONE pass, no RNG: each (row, replicate) pair
    // draws a Poisson(1) pseudo-weight by inverting the CDF at the
    // md5-60 hash of "orderkey:replicate" (cumulative thresholds
    // precomputed exactly as floor(F(k) * 2^60) BIGINT literals, so
    // both engines draw the identical weight), and replicate b's total
    // is sum(w * cents). 32 replicates fan out map-side and collapse
    // to a 32-row frame by partial aggregation — the resample never
    // shuffles the corpus, which is why Poisson bootstrap (not the
    // classical n-out-of-n multinomial, which needs a global draw) is
    // THE resampling scheme for distributed data. The spread of the 32
    // totals IS the standard error estimate; all totals exact BIGINT
    // cents.
    "q203_poisson_bootstrap" -> Q(
      (s, dir) => {
        val cents = table(s, dir, "orders").select(col("o_orderkey"),
          expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
            .as("cents"))
        cents
          .select(col("o_orderkey"), col("cents"),
            explode(expr("sequence(1, 32)")).as("b"))
          .select(col("b").cast("bigint").as("b"), col("cents"),
            md5Long60(concat_ws(":", col("o_orderkey"), col("b")))
              .as("h"))
          .select(col("b"), col("cents"),
            when(col("h") < 424136118829305344L, 0L)
              .when(col("h") < 848272237658610688L, 1L)
              .when(col("h") < 1060340297073263360L, 2L)
              .when(col("h") < 1131029650211480960L, 3L)
              .otherwise(4L).as("w"))
          .groupBy("b")
          .agg(sum("w").as("n_eff"),
            sum(col("w") * col("cents")).as("total_cents"))
          .orderBy("b")
      },
      Some(
        """WITH cents AS (SELECT o_orderkey,
          |     CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
          |   FROM orders),
          | reps AS (SELECT CAST(unnest(generate_series(1, 32)) AS BIGINT) AS b),
          | h AS (SELECT r.b, c.cents,
          |     ('0x' || substr(md5(c.o_orderkey::VARCHAR || ':' || r.b::VARCHAR), 1, 15))::BIGINT AS h
          |   FROM cents c CROSS JOIN reps r),
          | w AS (SELECT b, cents,
          |     CASE WHEN h < 424136118829305344 THEN 0
          |          WHEN h < 848272237658610688 THEN 1
          |          WHEN h < 1060340297073263360 THEN 2
          |          WHEN h < 1131029650211480960 THEN 3
          |          ELSE 4 END AS w FROM h)
          | SELECT b, CAST(sum(w) AS BIGINT) AS n_eff,
          |   CAST(sum(w * cents) AS BIGINT) AS total_cents
          | FROM w GROUP BY b ORDER BY b""".stripMargin.replace("\n", "")))
  ,

    // MinHash-LSH parameter planner: the detection-probability surface
    // p(s) = 1 - (1 - s^r)^b for every (bands, rows) factorization of
    // the house 16-hash signature, over a 19-point similarity grid —
    // the table an operator reads to pick banding before a dedup run
    // (q139 measures the deployed config against its realized
    // candidates; this plans ALL configs analytically). Cross-engine
    // exactness without libm pow: r and b are powers of two, so s^r
    // and (1-s^r)^b evaluate by REPEATED SQUARING with identical
    // association in both engines — every multiply is the same IEEE
    // operation in the same order. 76 rows, no table input: the plan
    // is a pure literal cross join.
    "q212_lsh_planner" -> Q(
      (s, dir) => {
        val grid = s.range(1, 20).select((col("id") / 20.0).as("sim"))
        val cfgs = s.createDataFrame(Seq((16L, 1L), (8L, 2L), (4L, 4L),
          (2L, 8L))).toDF("bands", "rows_per_band")
        grid.crossJoin(cfgs)
          .withColumn("sr", expr(
            "CASE rows_per_band WHEN 1 THEN sim WHEN 2 THEN sim * sim " +
              "WHEN 4 THEN (sim * sim) * (sim * sim) " +
              "ELSE ((sim * sim) * (sim * sim)) * ((sim * sim) * (sim * sim)) END"))
          .withColumn("q", lit(1.0) - col("sr"))
          .withColumn("p_detect", lit(1.0) - expr(
            "CASE bands WHEN 2 THEN q * q WHEN 4 THEN (q * q) * (q * q) " +
              "WHEN 8 THEN ((q * q) * (q * q)) * ((q * q) * (q * q)) " +
              "ELSE (((q * q) * (q * q)) * ((q * q) * (q * q))) * " +
              "(((q * q) * (q * q)) * ((q * q) * (q * q))) END"))
          .select(col("bands"), col("rows_per_band"), col("sim"),
            col("p_detect"))
          .orderBy("bands", "sim")
      },
      Some(
        """WITH grid AS (SELECT CAST(unnest(generate_series(1, 19)) AS BIGINT) / 20.0 AS sim),
          | cfg AS (SELECT CAST(bands AS BIGINT) AS bands,
          |     CAST(rows_per_band AS BIGINT) AS rows_per_band
          |   FROM (VALUES (16, 1), (8, 2), (4, 4), (2, 8)) t(bands, rows_per_band)),
          | base AS (SELECT bands, rows_per_band, sim FROM grid CROSS JOIN cfg),
          | sr AS (SELECT bands, rows_per_band, sim,
          |   CASE rows_per_band WHEN 1 THEN sim WHEN 2 THEN sim * sim
          |     WHEN 4 THEN (sim * sim) * (sim * sim)
          |     ELSE ((sim * sim) * (sim * sim)) * ((sim * sim) * (sim * sim)) END AS sr
          |   FROM base),
          | qq AS (SELECT bands, rows_per_band, sim, 1.0 - sr AS q FROM sr)
          | SELECT bands, rows_per_band, sim,
          |   1.0 - CASE bands WHEN 2 THEN q * q WHEN 4 THEN (q * q) * (q * q)
          |     WHEN 8 THEN ((q * q) * (q * q)) * ((q * q) * (q * q))
          |     ELSE (((q * q) * (q * q)) * ((q * q) * (q * q))) *
          |       (((q * q) * (q * q)) * ((q * q) * (q * q))) END AS p_detect
          | FROM qq ORDER BY bands, sim"""
          .stripMargin.replace("\n", ""))),

    // Neyman minimum-variance sampling allocation: split a 10k-doc
    // sampling budget across sources proportionally to N_h * sigma_h
    // (strata that are BIG or VARIABLE get more samples — the design
    // that minimizes the estimator variance at fixed budget). The
    // allocation weight is isqrt(N_h * sum(x^2) - S_h^2) — an exact
    // integer square root (floor of a correctly-rounded sqrt; the
    // radicand stays far below 2^52, where floor(sqrt) is
    // deterministic in both engines) — so the weight total and the
    // bps allocation are pure BIGINT arithmetic: NO cross-row float
    // summation anywhere (a double weight total would be
    // association-order-dependent and break the gate). One stratum
    // aggregation; the 20-row allocation derives map-side.
    "q213_neyman_allocation" -> Q(
      (s, dir) => {
        val st = table(s, dir, "documents")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sx"),
            sum(col("n_chars") * col("n_chars")).as("sxx"))
          .select(col("source"), col("n_docs"), col("sx"), col("sxx"),
            expr("CAST(floor(sqrt(CAST(n_docs * sxx - sx * sx AS DOUBLE))) AS BIGINT)")
              .as("w"))
          .localCheckpoint(eager = true)
        val tot = st.agg(sum("w").as("tw"))
        st.crossJoin(broadcast(tot))
          .select(col("source"), col("n_docs"), col("w"),
            expr("w * 10000 div tw").as("alloc_bps"))
          .orderBy("source")
      },
      Some(
        """WITH st AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
          |     CAST(sum(n_chars) AS BIGINT) AS sx,
          |     CAST(sum(n_chars * n_chars) AS BIGINT) AS sxx
          |   FROM documents GROUP BY source),
          | w AS (SELECT source, n_docs,
          |     CAST(floor(sqrt(CAST(n_docs * sxx - sx * sx AS DOUBLE))) AS BIGINT) AS w
          |   FROM st),
          | t AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM w)
          | SELECT source, n_docs, w,
          |   CAST(w * 10000 // tw AS BIGINT) AS alloc_bps
          | FROM w CROSS JOIN t ORDER BY source"""
          .stripMargin.replace("\n", ""))))

  /** Bitmap-index presence matrix (q162), kept beside the sketches: the
    * EXACT mergeable-state sibling of q124/q156 — same "fixed-layout
    * state, combine anywhere" contract, zero error.
    */
  def bitmaps: Map[String, Q] = Map(

    // Bitmap-index audience overlap: each event type's user set is
    // compressed to 64-bit presence words (word = user_id div 64, bit =
    // user_id mod 64, OR-combined) — the bitmap-index layout every OLAP
    // store (Druid/Pinot/ClickHouse roaring bitmaps) uses for distinct
    // counting and segment intersection. The output is the full
    // audience-overlap matrix: per ordered type pair (diagonal
    // included), both cardinalities, the intersection popcount from
    // AND-ed words, the inclusion-exclusion union, and Jaccard bps.
    // Pairs sharing no user are structurally absent (inner word join) —
    // same domain as the oracle's set join. The DuckDB twin computes
    // everything from raw DISTINCT sets, so the hash gate proves the
    // bitmap arithmetic (shift/OR/AND/popcount) against an independent
    // formulation, not a replay. 100 TB posture: per-type state is
    // |users|/64 words built in ONE map-side-combinable bit_or
    // aggregate (bitmaps merge by OR across any partitioning);
    // intersections are an equi-join on the word index with popcount
    // inside codegen — the corpus grain never shuffles twice, and the
    // matrix domain is C(|types|+1, 2).
    "q162_bitmap_overlap" -> Q(
      (s, dir) => {
        val words = table(s, dir, "events")
          .select(col("event_type").as("t"), col("user_id")).distinct()
          .select(col("t"), expr("user_id div 64").as("w"),
            expr("shiftleft(1L, cast(user_id % 64 as int))").as("bit"))
          .groupBy("t", "w").agg(expr("bit_or(bit)").as("word"))
          .localCheckpoint(eager = true)
        val tot = words.groupBy("t")
          .agg(sum(expr("bit_count(word)")).as("users"))
        val inter = words.as("a").join(words.as("b"),
            col("a.w") === col("b.w") && col("a.t") <= col("b.t"))
          .groupBy(col("a.t").as("scope_a"), col("b.t").as("scope_b"))
          .agg(sum(expr("bit_count(a.word & b.word)")).as("inter_users"))
          .where(col("inter_users") > 0)
        inter
          .join(broadcast(tot.select(col("t").as("scope_a"),
            col("users").as("users_a"))), "scope_a")
          .join(broadcast(tot.select(col("t").as("scope_b"),
            col("users").as("users_b"))), "scope_b")
          .select(col("scope_a"), col("scope_b"),
            col("users_a"), col("users_b"), col("inter_users"),
            (col("users_a") + col("users_b") - col("inter_users"))
              .as("union_users"),
            expr("inter_users * 10000 div (users_a + users_b - inter_users)")
              .as("jaccard_bps"))
          .orderBy("scope_a", "scope_b")
      },
      Some(
        """WITH u AS (SELECT DISTINCT event_type AS t, user_id FROM events),
          | tot AS (SELECT t, CAST(count(*) AS BIGINT) AS users FROM u GROUP BY 1),
          | px AS (SELECT a.t AS scope_a, b.t AS scope_b,
          |     CAST(count(*) AS BIGINT) AS inter_users
          |   FROM u a JOIN u b ON a.user_id = b.user_id AND a.t <= b.t
          |   GROUP BY 1, 2)
          | SELECT px.scope_a, px.scope_b, ta.users AS users_a,
          |   tb.users AS users_b, px.inter_users,
          |   CAST(ta.users + tb.users - px.inter_users AS BIGINT) AS union_users,
          |   CAST(px.inter_users * 10000
          |     // (ta.users + tb.users - px.inter_users) AS BIGINT) AS jaccard_bps
          | FROM px JOIN tot ta ON ta.t = px.scope_a
          | JOIN tot tb ON tb.t = px.scope_b
          | ORDER BY scope_a, scope_b""".stripMargin.replace("\n", "")))
  )
}
