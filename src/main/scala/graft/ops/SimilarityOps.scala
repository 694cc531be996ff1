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
          | ORDER BY n1, n2""".stripMargin.replace("\n", "")))
  )
}
