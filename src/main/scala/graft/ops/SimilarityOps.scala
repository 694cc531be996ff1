package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import TestData._

/** Similarity search over the `embeddings` table (ARRAY<FLOAT>, 64-dim):
  * brute-force cosine top-k as the exact baseline, and a random-hyperplane
  * LSH variant as the scale path (bucket first, exact cosine only within
  * bucket).
  *
  * Scale notes: the query set is broadcast (small side), candidates stay
  * partitioned; per-query top-k uses a window partitioned by query id.
  * At 1000-executor scale the LSH variant turns the O(Q x N) cross
  * product into O(Q x N / 2^planes) bucket-local work, with the bucket id
  * computed in a single codegen'd projection (no shuffle besides the
  * bucket join).
  */
object SimilarityOps {

  /** Exact cosine with a fixed left-to-right double fold, matching the
    * DuckDB oracle's list_reduce order bit-for-bit. Uses the codegen'd
    * [[graft.functions.VectorFunctions.dot]] (same accumulation order as
    * the HOF formulation, ~40x faster on pairwise workloads).
    */
  def cosine(va: Column, vb: Column, na: Column, nb: Column): Column =
    graft.functions.VectorFunctions.dot(va, vb) / (na * nb)

  /** vec_id, v (double array), nrm. */
  private def normed(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"), col("v"),
        graft.functions.VectorFunctions.l2norm(col("v")).as("nrm"))

  private val NumPlanes = 6
  private val Dim = 64

  /** Deterministic gaussian hyperplanes (fixed seed). */
  private lazy val planes: Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(NumPlanes)(Seq.fill(Dim)(rnd.nextGaussian()))
  }

  /** Random-hyperplane LSH bucket id: bit j = sign of dot(v, plane_j). */
  def lshBucket(v: Column): Column =
    (0 until NumPlanes).map { j =>
      val dot = aggregate(zip_with(v, typedlit(planes(j)), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)
      when(dot > 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)

  /** The plane constants as SQL VALUES rows `(j, DOUBLE[])` — Java double
    * toString round-trips exactly WHEN parsed via strtod — so each
    * element rides as a VARCHAR cast to DOUBLE. (Bare decimal literals
    * go through DuckDB's DECIMAL type first and can lose the last ulp;
    * bucket signs tolerated that, but exactness costs nothing.)
    */
  private lazy val planesSqlValues: String =
    planes.zipWithIndex.map { case (p, j) =>
      s"($j, [${p.map(x => s"'$x'").mkString(", ")}])"
    }.mkString(", ")

  /** Shared oracle CTE: normalized vectors + per-vector LSH bucket. */
  private lazy val bucketCte: String =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       | n AS (SELECT vec_id, v,
       |   sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm FROM e),
       | pl AS (SELECT j, list_transform(ps, x -> CAST(x AS DOUBLE)) AS p FROM (VALUES $planesSqlValues) t(j, ps)),
       | dots AS (SELECT n.vec_id, pl.j,
       |   list_reduce(list_transform(list_zip(n.v, pl.p), q -> CAST(q[1] AS DOUBLE) * CAST(q[2] AS DOUBLE)), (x, y) -> x + y) AS dot
       |   FROM n CROSS JOIN pl),
       | bk AS (SELECT vec_id, CAST(sum(CASE WHEN dot > 0 THEN (1 << j) ELSE 0 END) AS INT) AS bucket
       |   FROM dots GROUP BY vec_id)""".stripMargin.replace("\n", "")

  def all: Map[String, Q] = Map(

    // Brute-force exact cosine top-5 for queries vec_id % 100 == 0.
    "q28_cosine_topk" -> Q(
      (s, dir) => {
        val n = normed(s, dir)
        val q = n.where(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("query_id"), col("v").as("qv"),
            col("nrm").as("qn"))
        val scored = broadcast(q).join(n, col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id").as("cand_id"),
            cosine(col("qv"), col("v"), col("qn"), col("nrm")).as("cosine"))
        // Top-k via the custom TopKPerGroup operator: each map task
        // pre-reduces to a k-heap per query, so the exchange carries
        // k x queries-per-task rows, not every scored candidate. The
        // rnk window then runs over the k survivors only — and the
        // final phase already clustered by query_id, so it adds a local
        // sort, never a second exchange.
        graft.plans.TopKPerGroup(scored, Seq("query_id"),
            Seq(("cosine", true), ("cand_id", false)), 5)
          .withColumn("rnk", row_number().over(Window.partitionBy("query_id")
            .orderBy(desc("cosine"), col("cand_id"))))
          .select("query_id", "rnk", "cand_id", "cosine")
          .orderBy("query_id", "rnk")
      },
      Some(
        """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
          | n AS (SELECT vec_id, v,
          |   sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm FROM e),
          | q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n WHERE vec_id % 100 = 0),
          | sc AS (SELECT q.query_id, n.vec_id AS cand_id,
          |   list_reduce(list_transform(list_zip(q.qv, n.v), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)
          |     / (q.qn * n.nrm) AS cosine
          |   FROM q JOIN n ON n.vec_id <> q.query_id),
          | r AS (SELECT query_id, cand_id, cosine,
          |   CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS INT) AS rnk FROM sc)
          | SELECT query_id, rnk, cand_id, cosine FROM r WHERE rnk <= 5
          | ORDER BY query_id, rnk""".stripMargin.replace("\n", ""))),

    // LSH bucket assignment (the scale path's blocking structure).
    // Oracle replays the seeded-gaussian planes from interpolated
    // literals with the same fold order, so buckets match exactly.
    "q29_ann_lsh_buckets" -> Q(
      (s, dir) => normed(s, dir)
        .select(col("vec_id"), lshBucket(col("v")).as("bucket"))
        .withColumn("n_in_bucket",
          count(lit(1)).over(Window.partitionBy("bucket")))
        .orderBy("vec_id"),
      Some(bucketCte +
        """, cnt AS (SELECT bucket, count(*) AS n_in_bucket FROM bk GROUP BY bucket)
          | SELECT bk.vec_id, bk.bucket, cnt.n_in_bucket
          | FROM bk JOIN cnt USING (bucket) ORDER BY vec_id""".stripMargin
          .replace("\n", ""))),

    // LSH-accelerated top-k: exact cosine only among bucket-mates.
    "q30_ann_lsh_topk" -> Q(
      (s, dir) => {
        val n = normed(s, dir).withColumn("bucket", lshBucket(col("v")))
        val q = n.where(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("query_id"), col("v").as("qv"),
            col("nrm").as("qn"), col("bucket").as("qbucket"))
        val scored = broadcast(q)
          .join(n, col("bucket") === col("qbucket") &&
            col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id").as("cand_id"),
            cosine(col("qv"), col("v"), col("qn"), col("nrm")).as("cosine"))
        // Same answer-proportional top-k shape as q28 (see note there).
        graft.plans.TopKPerGroup(scored, Seq("query_id"),
            Seq(("cosine", true), ("cand_id", false)), 5)
          .withColumn("rnk", row_number().over(Window.partitionBy("query_id")
            .orderBy(desc("cosine"), col("cand_id"))))
          .select("query_id", "rnk", "cand_id", "cosine")
          .orderBy("query_id", "rnk")
      },
      Some(bucketCte +
        """, nb AS (SELECT n.vec_id, n.v, n.nrm, bk.bucket FROM n JOIN bk USING (vec_id)),
          | q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn, bucket AS qbucket
          |   FROM nb WHERE vec_id % 100 = 0),
          | sc AS (SELECT q.query_id, nb.vec_id AS cand_id,
          |   list_reduce(list_transform(list_zip(q.qv, nb.v), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)
          |     / (q.qn * nb.nrm) AS cosine
          |   FROM q JOIN nb ON nb.bucket = q.qbucket AND nb.vec_id <> q.query_id),
          | r AS (SELECT query_id, cand_id, cosine,
          |   CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS INT) AS rnk FROM sc)
          | SELECT query_id, rnk, cand_id, cosine FROM r WHERE rnk <= 5
          | ORDER BY query_id, rnk""".stripMargin.replace("\n", ""))),

    // SEMANTIC decontamination: flag corpus vectors too close (cosine >
    // 0.3) to any held-out benchmark vector (vec_id % 97 == 0) — the
    // embedding-space complement of q86's n-gram decontamination, which
    // catches paraphrased benchmark leakage that shares no 3-gram.
    // ZERO-shuffle plan (the q101-argmin shape): the benchmark set
    // collapses to one sorted array-of-structs row, broadcasts, and
    // each corpus row folds its |bench| cosines in a single projection —
    // no N x |bench| row expansion, no per-vec re-aggregation exchange;
    // only the output sort shuffles. array_max / the hit count are
    // order-independent, so scores oracle-compare exactly.
    "q107_semantic_decontam" -> Q(
      (s, dir) => {
        val n = normed(s, dir)
        val benchArr = n.where(col("vec_id") % 97 === 0)
          .select(col("vec_id").as("bid"), col("v").as("bv"),
            col("nrm").as("bn"))
          .agg(sort_array(collect_list(
            struct(col("bid"), col("bv"), col("bn")))).as("bs"))
        n.where(col("vec_id") % 97 =!= 0)
          .crossJoin(broadcast(benchArr))
          // Empty-benchmark parity: the global collect_list still emits
          // ONE row (empty array) where the oracle's CROSS JOIN against
          // an empty bench emits none — drop the degenerate case so
          // both engines agree the result is empty.
          .where(size(col("bs")) > 0)
          .select(col("vec_id"),
            expr("transform(bs, b -> graft_dot(v, b.bv) / (nrm * b.bn))")
              .as("coss"))
          .select(col("vec_id"),
            array_max(col("coss")).as("max_cos"),
            expr("aggregate(coss, cast(0 as bigint), " +
              "(a, c) -> a + if(c > cast(0.3 as double), 1L, 0L))")
              .as("n_hits"))
          .select(col("vec_id"), col("max_cos"), col("n_hits"),
            (col("n_hits") > 0).cast("int").as("contaminated"))
          .orderBy("vec_id")
      },
      Some(
        """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
          | n AS (SELECT vec_id, v,
          |   sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm FROM e),
          | b AS (SELECT vec_id AS bid, v AS bv, nrm AS bn FROM n WHERE vec_id % 97 = 0),
          | p AS (SELECT n.vec_id,
          |   list_reduce(list_transform(list_zip(n.v, b.bv), q -> CAST(q[1] AS DOUBLE) * CAST(q[2] AS DOUBLE)), (x, y) -> x + y)
          |     / (n.nrm * b.bn) AS cos
          |   FROM n CROSS JOIN b WHERE n.vec_id % 97 <> 0)
          | SELECT vec_id, max(cos) AS max_cos,
          |   CAST(sum(CASE WHEN cos > 0.3 THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
          |   CAST(max(cos) > 0.3 AS INT) AS contaminated
          | FROM p GROUP BY vec_id ORDER BY vec_id""".stripMargin
          .replace("\n", ""))),

    // Approximate near-dup: LSH bucket blocking + exact cosine rescore —
    // the sub-quadratic scale path beside q27's exact tiled join.
    // Candidate pairs are bucket-mates (hash equi-join on the 6-bit
    // bucket, ~N^2/2^planes comparisons), each rescored with exact
    // cosine and thresholded. Recall vs the exact pair set is a
    // property of the data/threshold (measured in SketchAndRecallSpec);
    // CORRECTNESS is exact because the oracle replays the identical
    // seeded hyperplanes, so both engines compute the same blocked set.
    "q83_neardup_lsh_rescore" -> Q(
      (s, dir) => {
        val n = normed(s, dir).withColumn("bucket", lshBucket(col("v")))
        n.as("a").join(n.as("b"),
            col("a.bucket") === col("b.bucket") &&
              col("a.vec_id") < col("b.vec_id"))
          .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"),
            cosine(col("a.v"), col("b.v"), col("a.nrm"), col("b.nrm"))
              .as("cosine"))
          .where(col("cosine") > 0.3)
          .orderBy("v1", "v2")
      },
      Some(bucketCte +
        """, nb AS (SELECT n.vec_id, n.v, n.nrm, bk.bucket FROM n JOIN bk USING (vec_id)),
          | p AS (SELECT a.vec_id AS v1, b.vec_id AS v2,
          |   list_reduce(list_transform(list_zip(a.v, b.v), q -> CAST(q[1] AS DOUBLE) * CAST(q[2] AS DOUBLE)), (x, y) -> x + y)
          |     / (a.nrm * b.nrm) AS cosine
          |   FROM nb a JOIN nb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
          | SELECT v1, v2, cosine FROM p WHERE cosine > 0.3 ORDER BY v1, v2"""
          .stripMargin.replace("\n", ""))),

    // Fuzzy catalog search: rank part names against a query phrase by
    // Jaro-Winkler similarity — graft_jaro_winkler is a codegen'd
    // Catalyst expression pinned BIT-FOR-BIT to DuckDB's
    // jaro_winkler_similarity (20k-pair fuzz, zero bit mismatches), so
    // the double scores hash-match, not just the ranking. Scale shape:
    // one narrow scan + per-partition top-k (TakeOrdered), no shuffle
    // of the scored corpus.
    "q175_jaro_fuzzy_rank" -> Q(
      (s, dir) => {
        val query = "cold gadget"
        table(s, dir, "part")
          .select(col("p_partkey"), col("p_name"),
            graft.functions.JaroWinklerSim
              .jaroWinkler(col("p_name"), lit(query)).as("score"))
          .orderBy(col("score").desc, col("p_partkey"))
          .limit(20)
      },
      Some(
        """SELECT p_partkey, p_name,
          |   jaro_winkler_similarity(p_name, 'cold gadget') AS score
          | FROM part ORDER BY score DESC, p_partkey LIMIT 20"""
          .stripMargin.replace("\n", ""))),

    // Fuzzy near-dup NAME pairs, exact-collapse first: part names
    // repeat massively (64 distinct names across 20k parts at sf0.1),
    // so the corpus collapses to the distinct-name frame before any
    // similarity work — q110's collapse-then-near-dup-over-
    // representatives pattern. Pairs block on the type token (second
    // word) so the quadratic runs per block over REPRESENTATIVES (the
    // q121 blocking argument), and each surviving name pair carries its
    // part multiplicities (pair_count = the part-level pair cardinality
    // the naive quadratic would have materialized — reported, never
    // built). The jw >= 0.9 predicate agrees across engines because
    // the score bits do. The first cut of this query scored all
    // part-level pairs directly: ~27M Jaro-Winkler evaluations at
    // sf0.1 for the same 2k name pairs — 14 s where this shape takes
    // a fraction of one.
    "q176_jaro_block_pairs" -> Q(
      (s, dir) => {
        val names = table(s, dir, "part")
          .groupBy(col("p_name").as("name"))
          .agg(count(lit(1)).as("n_parts"))
          .withColumn("blk", element_at(split(col("name"), " "), 2))
        names.alias("a").join(names.alias("b"),
            col("a.blk") === col("b.blk") && col("a.name") < col("b.name"))
          .select(col("a.name").as("n1"), col("b.name").as("n2"),
            col("a.n_parts").as("parts_1"), col("b.n_parts").as("parts_2"),
            (col("a.n_parts") * col("b.n_parts")).as("pair_count"),
            graft.functions.JaroWinklerSim
              .jaroWinkler(col("a.name"), col("b.name")).as("score"))
          .where(col("score") >= 0.9)
          .orderBy("n1", "n2")
      },
      Some(
        """WITH nm AS (SELECT p_name AS name, CAST(count(*) AS BIGINT) AS n_parts,
          |     string_split(p_name, ' ')[2] AS blk FROM part GROUP BY p_name)
          | SELECT a.name AS n1, b.name AS n2, a.n_parts AS parts_1,
          |   b.n_parts AS parts_2, a.n_parts * b.n_parts AS pair_count,
          |   jaro_winkler_similarity(a.name, b.name) AS score
          | FROM nm a JOIN nm b ON a.blk = b.blk AND a.name < b.name
          | WHERE jaro_winkler_similarity(a.name, b.name) >= 0.9
          | ORDER BY n1, n2""".stripMargin.replace("\n", ""))),

    // Embedding-table data-quality audit: per-vector dimensionality,
    // L2-norm bands, zero-vector and NaN screens — the pre-flight any
    // ANN/IVF build runs before trusting 100 TB of vectors (a single
    // NaN poisons every cosine it touches; silent dim drift breaks
    // dot products). One narrow map-side pass (dim, norm2, nan flag
    // are codegen'd projections; norm2 reuses the graft_dot
    // left-to-right fold so the doubles match DuckDB's list_reduce
    // bit-for-bit), then a map-combinable rollup to <=20 band rows.
    // NaN vectors route to the SENTINEL band -1 before the bigint
    // cast: under ANSI mode CAST(NaN AS BIGINT) throws, so without
    // the guard the audit would crash on exactly the corrupt vectors
    // it exists to flag instead of reporting them in n_nan.
    "q219_embedding_audit" -> Q(
      (s, dir) => {
        val per = table(s, dir, "embeddings")
          .select(col("vec_id"),
            col("embedding").cast("array<double>").as("v"))
          .select(col("vec_id"), size(col("v")).cast("bigint").as("dim"),
            graft.functions.VectorFunctions.dot(col("v"), col("v"))
              .as("norm2"),
            exists(col("v"), x => isnan(x)).as("has_nan"))
        per
          .select(when(col("has_nan") || isnan(col("norm2")), lit(-1L))
            .otherwise(floor(sqrt(col("norm2"))).cast("bigint"))
            .as("norm_band"),
            col("dim"), col("norm2"), col("has_nan"))
          .groupBy("norm_band")
          .agg(count(lit(1)).as("n_vecs"),
            min("dim").as("min_dim"), max("dim").as("max_dim"),
            sum(when(col("norm2") === 0.0, 1L).otherwise(0L)).as("n_zero"),
            sum(when(col("has_nan"), 1L).otherwise(0L)).as("n_nan"),
            min("norm2").as("min_norm2"), max("norm2").as("max_norm2"))
          .orderBy("norm_band")
      },
      Some(
        """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
          | p AS (SELECT vec_id, CAST(len(v) AS BIGINT) AS dim,
          |     list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b) AS norm2,
          |     len(list_filter(v, x -> isnan(x))) > 0 AS has_nan
          |   FROM e)
          | SELECT CASE WHEN has_nan OR isnan(norm2) THEN CAST(-1 AS BIGINT)
          |   ELSE CAST(floor(sqrt(norm2)) AS BIGINT) END AS norm_band,
          |   CAST(count(*) AS BIGINT) AS n_vecs,
          |   CAST(min(dim) AS BIGINT) AS min_dim,
          |   CAST(max(dim) AS BIGINT) AS max_dim,
          |   CAST(sum(CASE WHEN norm2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
          |   CAST(sum(CASE WHEN has_nan THEN 1 ELSE 0 END) AS BIGINT) AS n_nan,
          |   min(norm2) AS min_norm2, max(norm2) AS max_norm2
          | FROM p GROUP BY 1 ORDER BY norm_band"""
          .stripMargin.replace("\n", ""))),

    // ANN quality evaluation: recall@5 and MRR of the single-probe LSH
    // top-5 (q30's index) against the exact cosine top-5 ground truth
    // (q28) — the report that decides whether an index's bucket count /
    // probe count is safe to ship before pointing it at 100 TB of
    // vectors. Reciprocal ranks ride as 60/rank (exact BIGINT — 60 is
    // divisible by every rank <= 5), so the MRR sum is integer-exact
    // and only the final per-query means are IEEE divisions. The
    // normed+bucketed frame is checkpointed ONCE and fans into both
    // scorings; the eval joins run over <= 5*|Q| row frames.
    "q223_ann_recall_eval" -> Q(
      (s, dir) => {
        val n = normed(s, dir).withColumn("bucket", lshBucket(col("v")))
          .localCheckpoint(eager = true)
        val q = n.where(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("query_id"), col("v").as("qv"),
            col("nrm").as("qn"), col("bucket").as("qbucket"))
        def top5(scored: org.apache.spark.sql.DataFrame) =
          graft.plans.TopKPerGroup(scored, Seq("query_id"),
              Seq(("cosine", true), ("cand_id", false)), 5)
            .withColumn("rnk",
              row_number().over(Window.partitionBy("query_id")
                .orderBy(desc("cosine"), col("cand_id"))))
            .select(col("query_id"), col("cand_id"), col("rnk"))
        // both top-5 frames (<= 5|Q| rows) fan into TWO eval joins each:
        // checkpoint so the full scoring pass runs once per side, not
        // once per consumer
        val exact5 = top5(broadcast(q)
          .join(n, col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id").as("cand_id"),
            cosine(col("qv"), col("v"), col("qn"), col("nrm"))
              .as("cosine")))
          .localCheckpoint(eager = true)
        val ann5 = top5(broadcast(q)
          .join(n, col("bucket") === col("qbucket") &&
            col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id").as("cand_id"),
            cosine(col("qv"), col("v"), col("qn"), col("nrm"))
              .as("cosine")))
          .withColumnRenamed("rnk", "ann_rnk")
          .localCheckpoint(eager = true)
        val hits = exact5.join(ann5, Seq("query_id", "cand_id"))
          .groupBy("query_id").agg(count(lit(1)).as("hits"))
        val nn1 = exact5.where(col("rnk") === 1)
          .join(ann5, Seq("query_id", "cand_id"))
          .select(col("query_id"),
            expr("CAST(60 div ann_rnk AS BIGINT)").as("rr60"))
        q.select("query_id")
          .join(hits, Seq("query_id"), "left")
          .join(nn1, Seq("query_id"), "left")
          .select(col("query_id"),
            coalesce(col("hits"), lit(0L)).as("hits"),
            coalesce(col("rr60"), lit(0L)).as("rr60"))
          .agg(count(lit(1)).as("n_queries"),
            sum("hits").as("sum_hits"),
            sum("rr60").as("mrr60_sum"),
            sum(when(col("rr60") === 60, 1L).otherwise(0L)).as("n_rank1"))
          .select(col("n_queries"), col("sum_hits"),
            (col("sum_hits").cast("double") /
              (col("n_queries") * 5).cast("double")).as("recall5"),
            col("mrr60_sum"),
            (col("mrr60_sum").cast("double") /
              (col("n_queries") * 60).cast("double")).as("mrr"),
            col("n_rank1"))
      },
      Some(bucketCte +
        """, nb AS (SELECT n.vec_id, n.v, n.nrm, bk.bucket FROM n JOIN bk USING (vec_id)),
          | q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn, bucket AS qbucket
          |   FROM nb WHERE vec_id % 100 = 0),
          | exsc AS (SELECT q.query_id, nb.vec_id AS cand_id,
          |   list_reduce(list_transform(list_zip(q.qv, nb.v), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)
          |     / (q.qn * nb.nrm) AS cosine
          |   FROM q JOIN nb ON nb.vec_id <> q.query_id),
          | ex AS (SELECT query_id, cand_id, rnk FROM (SELECT query_id, cand_id,
          |     CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS INT) AS rnk
          |   FROM exsc) WHERE rnk <= 5),
          | ansc AS (SELECT q.query_id, nb.vec_id AS cand_id,
          |   list_reduce(list_transform(list_zip(q.qv, nb.v), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)
          |     / (q.qn * nb.nrm) AS cosine
          |   FROM q JOIN nb ON nb.bucket = q.qbucket AND nb.vec_id <> q.query_id),
          | an AS (SELECT query_id, cand_id, ann_rnk FROM (SELECT query_id, cand_id,
          |     CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS INT) AS ann_rnk
          |   FROM ansc) WHERE ann_rnk <= 5),
          | h AS (SELECT ex.query_id, CAST(count(*) AS BIGINT) AS hits
          |   FROM ex JOIN an ON ex.query_id = an.query_id AND ex.cand_id = an.cand_id
          |   GROUP BY ex.query_id),
          | n1 AS (SELECT ex.query_id, CAST(60 // an.ann_rnk AS BIGINT) AS rr60
          |   FROM ex JOIN an ON ex.query_id = an.query_id AND ex.cand_id = an.cand_id
          |   WHERE ex.rnk = 1),
          | pq AS (SELECT q.query_id, coalesce(h.hits, 0) AS hits,
          |     coalesce(n1.rr60, 0) AS rr60
          |   FROM q LEFT JOIN h ON q.query_id = h.query_id
          |     LEFT JOIN n1 ON q.query_id = n1.query_id)
          | SELECT CAST(count(*) AS BIGINT) AS n_queries,
          |   CAST(sum(hits) AS BIGINT) AS sum_hits,
          |   CAST(sum(hits) AS DOUBLE) / CAST(count(*) * 5 AS DOUBLE) AS recall5,
          |   CAST(sum(rr60) AS BIGINT) AS mrr60_sum,
          |   CAST(sum(rr60) AS DOUBLE) / CAST(count(*) * 60 AS DOUBLE) AS mrr,
          |   CAST(sum(CASE WHEN rr60 = 60 THEN 1 ELSE 0 END) AS BIGINT) AS n_rank1
          | FROM pq""".stripMargin.replace("\n", "")))
  )
}
