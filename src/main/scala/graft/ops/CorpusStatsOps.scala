package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import TestData._

/** Corpus-scaling statistics for a training-data pipeline: a Zipf
  * rank-frequency fit, a Heaps-law vocabulary-growth curve, and the
  * first BPE merge round (the highest-weight character-pair merges a
  * tokenizer-induction job would pick).
  *
  * Cross-engine exactness: the house no-libm-ln rule again. Both
  * "log-log" fits run in DYADIC log space — floor(log2 x) via the
  * length of the integer's binary rendering (`length(bin(x)) - 1`,
  * bit-identical in Spark and DuckDB) — so every OLS sum is integer
  * arithmetic and only the final slope/intercept are single IEEE
  * divisions of exact BIGINT products.
  *
  * Scale notes: all three aggregate the corpus once into a
  * vocabulary- or bucket-sized frame before any window. q168's rank
  * window sorts the VOCAB frame (≪ corpus; for a web-scale vocab the
  * dyadic buckets could be computed from freq alone, dropping rank
  * entirely). q169 never runs an inequality join against the corpus:
  * dyadic doc-buckets reduce the growth curve to a ~40-row cumsum.
  * q170's pair frame is bounded by the alphabet squared.
  */
object CorpusStatsOps {

  /** floor(log2(x)) for x >= 1, exact in both engines. */
  private def flog2(c: String): String = s"length(bin($c)) - 1"

  def all: Map[String, Q] = Map(

    // Zipf fit: rank words by frequency, OLS of floor(log2 freq) on
    // floor(log2 rank). slope ~ -1 on Zipfian text; on this synthetic
    // near-uniform vocab it is near 0 — the oracle pins exact values,
    // the spec pins the [-2, 0] range law.
    "q168_zipf_slope" -> Q(
      (s, dir) => {
        val vocab = table(s, dir, "documents")
          .select(explode(split(col("text"), " ")).as("word"))
          .where(length(col("word")) > 0)
          .groupBy("word").agg(count(lit(1)).as("freq"))
        val ranked = vocab.withColumn("rank",
          row_number().over(Window.orderBy(col("freq").desc, col("word"))))
          .select(expr(flog2("rank")).cast("bigint").as("x"),
            expr(flog2("freq")).cast("bigint").as("y"))
        ranked.agg(
          count(lit(1)).as("n_types"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"))
          .select(col("n_types"), col("sx"), col("sy"), col("sxx"),
            col("sxy"),
            ((col("n_types") * col("sxy") - col("sx") * col("sy"))
              .cast("double") /
              (col("n_types") * col("sxx") - col("sx") * col("sx"))
                .cast("double")).as("slope"),
            ((col("sy") * col("sxx") - col("sx") * col("sxy"))
              .cast("double") /
              (col("n_types") * col("sxx") - col("sx") * col("sx"))
                .cast("double")).as("intercept"))
      },
      Some(
        """WITH vocab AS (SELECT w AS word, CAST(count(*) AS BIGINT) AS freq
          |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
          |  WHERE length(w) > 0 GROUP BY w),
          | ranked AS (SELECT CAST(length(bin(CAST(row_number() OVER (ORDER BY freq DESC, word) AS BIGINT))) - 1 AS BIGINT) AS x,
          |  CAST(length(bin(freq)) - 1 AS BIGINT) AS y FROM vocab),
          | sums AS (SELECT CAST(count(*) AS BIGINT) AS n_types,
          |  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
          |  CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(x * y) AS BIGINT) AS sxy
          |  FROM ranked)
          | SELECT n_types, sx, sy, sxx, sxy,
          |  CAST(n_types * sxy - sx * sy AS DOUBLE) / CAST(n_types * sxx - sx * sx AS DOUBLE) AS slope,
          |  CAST(sy * sxx - sx * sxy AS DOUBLE) / CAST(n_types * sxx - sx * sx AS DOUBLE) AS intercept
          | FROM sums"""
          .stripMargin.replace("\n", ""))),

    // Heaps-law growth curve at dyadic corpus prefixes: bucket b rows
    // summarize the first min(2^(b+1) - 1, N) docs — cum_types is the
    // vocabulary seen, cum_tokens the words read. Each word contributes
    // its FIRST doc's bucket to the types curve (min(doc_id), the
    // "first seen" semantics an incremental ingest would observe).
    "q169_heaps_curve" -> Q(
      (s, dir) => {
        // consumed twice (doc curve + type curve) but NOT checkpointed:
        // the exploded token frame is corpus-sized, so materializing it
        // costs more than two pruned parquet scans — the opposite
        // trade-off from q148's bounded fingerprint frame
        val words = table(s, dir, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
          .where(length(col("word")) > 0)
        val docBuckets = words.groupBy("doc_id")
          .agg(count(lit(1)).as("toks"))
          .select(expr(flog2("doc_id + 1")).cast("bigint").as("bucket"),
            col("toks"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("docs"), sum("toks").as("tokens"))
        val typeBuckets = words.groupBy("word")
          .agg(min("doc_id").as("first_doc"))
          .select(expr(flog2("first_doc + 1")).cast("bigint").as("bucket"))
          .groupBy("bucket").agg(count(lit(1)).as("new_types"))
        val w = Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        docBuckets.join(typeBuckets, Seq("bucket"), "left")
          .na.fill(0L, Seq("new_types"))
          .select(col("bucket"), col("docs"), col("new_types"),
            sum("docs").over(w).as("cum_docs"),
            sum("tokens").over(w).as("cum_tokens"),
            sum("new_types").over(w).as("cum_types"))
          .orderBy("bucket")
      },
      Some(
        """WITH words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
          | wf AS (SELECT doc_id, word FROM words WHERE length(word) > 0),
          | db AS (SELECT CAST(length(bin(doc_id + 1)) - 1 AS BIGINT) AS bucket,
          |   CAST(count(*) AS BIGINT) AS docs, CAST(sum(toks) AS BIGINT) AS tokens
          |  FROM (SELECT doc_id, CAST(count(*) AS BIGINT) AS toks FROM wf GROUP BY doc_id)
          |  GROUP BY 1),
          | tb AS (SELECT CAST(length(bin(first_doc + 1)) - 1 AS BIGINT) AS bucket,
          |   CAST(count(*) AS BIGINT) AS new_types
          |  FROM (SELECT word, min(doc_id) AS first_doc FROM wf GROUP BY word)
          |  GROUP BY 1)
          | SELECT db.bucket, db.docs,
          |  CAST(coalesce(tb.new_types, 0) AS BIGINT) AS new_types,
          |  CAST(sum(db.docs) OVER (ORDER BY db.bucket) AS BIGINT) AS cum_docs,
          |  CAST(sum(db.tokens) OVER (ORDER BY db.bucket) AS BIGINT) AS cum_tokens,
          |  CAST(sum(coalesce(tb.new_types, 0)) OVER (ORDER BY db.bucket) AS BIGINT) AS cum_types
          | FROM db LEFT JOIN tb ON db.bucket = tb.bucket ORDER BY db.bucket"""
          .stripMargin.replace("\n", ""))),

    // First BPE merge round: weight every adjacent character pair by
    // the frequency of the word it occurs in (counting repeats within
    // a word, as BPE does), keep the top 20 merge candidates. The
    // corpus collapses to the vocab frame first, so pair extraction
    // runs once per TYPE, weighted by freq — the standard tokenizer-
    // induction trick that makes the corpus pass O(vocab) not O(tokens).
    "q170_bpe_pair_merge" -> Q(
      (s, dir) => {
        val vocab = table(s, dir, "documents")
          .select(explode(split(col("text"), " ")).as("word"))
          .where(length(col("word")) > 1)
          .groupBy("word").agg(count(lit(1)).as("freq"))
        val pairs = vocab
          .select(col("freq"), explode(expr(
            "transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))"))
            .as("pair"))
          .groupBy("pair").agg(sum("freq").as("weight"))
        pairs.withColumn("rank",
          row_number().over(Window.orderBy(col("weight").desc, col("pair"))))
          .where(col("rank") <= 20)
          .select(col("rank"), col("pair"), col("weight"))
          .orderBy("rank")
      },
      Some(
        """WITH vocab AS (SELECT w AS word, CAST(count(*) AS BIGINT) AS freq
          |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
          |  WHERE length(w) > 1 GROUP BY w),
          | pairs AS (SELECT p AS pair, CAST(sum(freq) AS BIGINT) AS weight
          |  FROM (SELECT freq, unnest(list_transform(range(1, length(word)), i -> substr(word, i, 2))) AS p FROM vocab)
          |  GROUP BY p),
          | ranked AS (SELECT CAST(row_number() OVER (ORDER BY weight DESC, pair) AS INT) AS rank, pair, weight FROM pairs)
          | SELECT rank, pair, weight FROM ranked WHERE rank <= 20 ORDER BY rank"""
          .stripMargin.replace("\n", ""))),

    // Per-source Flesch-style readability: syllables approximated as
    // maximal vowel runs (the standard heuristic), each doc treated as
    // one sentence (the corpus has no terminators). All counts
    // aggregate as integers; the score is computed ONCE per source
    // from exact sums — never summed as per-doc doubles (unordered
    // double sums don't reproduce across engines). Vowel runs via two
    // regexp_replace lengths, identical in both engines; literals
    // enter through correctly-rounded string->DOUBLE casts on the
    // DuckDB side (bare SQL decimals are DECIMAL there, not DOUBLE).
    "q178_readability" -> Q(
      (s, dir) => {
        val words = table(s, dir, "documents")
          .select(col("source"), col("doc_id"),
            explode(split(col("text"), " ")).as("w"))
          .where(length(col("w")) > 0)
          .select(col("source"), col("doc_id"),
            greatest(
              length(regexp_replace(col("w"), "[aeiou]+", "V")) -
                length(regexp_replace(col("w"), "[aeiou]+", "")),
              lit(1)).cast("bigint").as("syl"))
        words.groupBy("source")
          .agg(count_distinct(col("doc_id")).as("n_docs"),
            count(lit(1)).as("n_words"), sum("syl").as("n_syllables"))
          .select(col("source"), col("n_docs"), col("n_words"),
            col("n_syllables"),
            (lit(206.835) -
              lit(1.015) * (col("n_words").cast("double") /
                col("n_docs").cast("double")) -
              lit(84.6) * (col("n_syllables").cast("double") /
                col("n_words").cast("double"))).as("flesch"))
          .orderBy("source")
      },
      Some(
        """WITH w AS (SELECT source, doc_id,
          |     unnest(string_split(text, ' ')) AS w FROM documents),
          | syl AS (SELECT source, doc_id,
          |     CAST(greatest(length(regexp_replace(w, '[aeiou]+', 'V', 'g')) -
          |       length(regexp_replace(w, '[aeiou]+', '', 'g')), 1) AS BIGINT) AS syl
          |   FROM w WHERE length(w) > 0),
          | agg AS (SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
          |     CAST(count(*) AS BIGINT) AS n_words,
          |     CAST(sum(syl) AS BIGINT) AS n_syllables
          |   FROM syl GROUP BY source)
          | SELECT source, n_docs, n_words, n_syllables,
          |   CAST('206.835' AS DOUBLE) -
          |     CAST('1.015' AS DOUBLE) * (CAST(n_words AS DOUBLE) / CAST(n_docs AS DOUBLE)) -
          |     CAST('84.6' AS DOUBLE) * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)) AS flesch
          | FROM agg ORDER BY source"""
          .stripMargin.replace("\n", ""))),

    // Per-document 3-gram novelty: the fraction of a doc's distinct
    // word trigrams that first appear in THAT doc (first = min doc_id
    // — the order an incremental ingest observes). The diversity/
    // novelty curve a data-curation pipeline watches to detect a
    // source going stale. Gram extraction guards short docs explicitly
    // (Spark's sequence(1, 0) DESCENDS instead of returning empty —
    // the guard keeps both engines on the same gram set); the
    // first-seen pass is one gram-keyed aggregation, joined back
    // equi-keyed — no quadratic doc-vs-doc comparison anywhere.
    "q190_ngram_novelty" -> Q(
      (s, dir) => {
        // Gram grain = the shared 60-bit md5 word-3-gram hash
        // (graft_shingle_hashes): within-doc dedup happens in-row, so
        // the corpus-wide distinct — whose only effect was that dedup —
        // is gone, and the first-seen aggregation + join-back shuffle
        // 8-byte longs instead of ~25-byte gram strings. The oracle
        // replays the identical hash, so any 60-bit collision merges
        // the same grams in both engines.
        val grams = graft.ops.DedupOps
          .docShingleArrays(table(s, dir, "documents"))
          .select(col("doc_id"), explode(col("arr")).as("gram"))
          .localCheckpoint(eager = true)
        val firstSeen = grams.groupBy("gram")
          .agg(min("doc_id").as("first_doc"))
        grams.join(firstSeen, "gram")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_grams"),
            sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
              .as("n_novel"))
          .select(col("doc_id"), col("n_grams"), col("n_novel"),
            (col("n_novel").cast("double") / col("n_grams").cast("double"))
              .as("novelty"))
          .orderBy("doc_id")
      },
      Some(
        """WITH g0 AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
          | grams AS (SELECT DISTINCT doc_id,
          |     ('0x' || substr(md5(unnest(list_transform(range(1, length(w) - 1),
          |       i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]))), 1, 15))::BIGINT AS gram
          |   FROM g0 WHERE length(w) >= 3),
          | fs AS (SELECT gram, min(doc_id) AS first_doc FROM grams GROUP BY gram)
          | SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
          |   CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
          |   CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS DOUBLE) /
          |     CAST(count(*) AS DOUBLE) AS novelty
          | FROM grams JOIN fs USING (gram)
          | GROUP BY doc_id ORDER BY doc_id"""
          .stripMargin.replace("\n", ""))),

    // Exact-duplicate cluster-size distribution: group docs by the
    // catalog's canonical normalized fingerprint (TextOps.normalizedFp
    // — the single source q22/q96/streaming curation share), then
    // histogram the group sizes. The dedup-health view an ingest
    // pipeline watches: how much of the corpus sits in clusters of
    // size s, and how many docs dedup would drop. Two map-side-
    // combinable aggregations; output bounded by max cluster size.
    "q193_cluster_size_dist" -> Q(
      (s, dir) => {
        val groups = table(s, dir, "documents")
          .select(TextOps.normalizedFp.as("fp"))
          .groupBy("fp").agg(count(lit(1)).as("sz"))
        groups.groupBy(col("sz").as("cluster_size"))
          .agg(count(lit(1)).as("n_clusters"))
          .select(col("cluster_size"), col("n_clusters"),
            (col("cluster_size") * col("n_clusters")).as("docs"),
            ((col("cluster_size") - 1) * col("n_clusters"))
              .as("dedup_drops"))
          .orderBy("cluster_size")
      },
      Some(
        """WITH g AS (SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
          |     CAST(count(*) AS BIGINT) AS sz FROM documents GROUP BY 1)
          | SELECT sz AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
          |   sz * CAST(count(*) AS BIGINT) AS docs,
          |   (sz - 1) * CAST(count(*) AS BIGINT) AS dedup_drops
          | FROM g GROUP BY sz ORDER BY cluster_size"""
          .stripMargin.replace("\n", ""))),

    // Full CUBE over (source, lang): every rollup combination — per
    // cell, totals/subtotals/grand total — in ONE pass (Catalyst
    // expands the grouping sets map-side; a 4-query union would scan
    // the corpus four times). grouping_id() disambiguates real values
    // from subtotal rows; subtotal keys render as '<all>' so the
    // output is scalar-and-null-free on both engines.
    "q232_cube_corpus" -> Q(
      (s, dir) => table(s, dir, "documents")
        .select(col("source"), col("lang"),
          size(split(col("text"), " ")).cast("bigint").as("w"))
        .cube("source", "lang")
        .agg(count(lit(1)).as("n_docs"), sum("w").as("tokens"),
          grouping_id().cast("int").as("gid"))
        .select(coalesce(col("source"), lit("<all>")).as("source"),
          coalesce(col("lang"), lit("<all>")).as("lang"),
          col("gid"), col("n_docs"), col("tokens"))
        .orderBy("gid", "source", "lang"),
      Some(
        """SELECT coalesce(source, '<all>') AS source,
          |   coalesce(lang, '<all>') AS lang,
          |   CAST(GROUPING(source) * 2 + GROUPING(lang) AS INT) AS gid,
          |   CAST(count(*) AS BIGINT) AS n_docs,
          |   CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
          | FROM documents GROUP BY CUBE (source, lang)
          | ORDER BY gid, source, lang"""
          .stripMargin.replace("\n", ""))),

    // Exact Kolmogorov-Smirnov drift of each source's doc-length
    // distribution against the rest of the corpus — decided in pure
    // INTEGER arithmetic: D = max|F_s - F_rest| is evaluated as
    // max|cum_s*(N-n_s) - (cum_t-cum_s)*n_s| over the length grid, so
    // the max never compares floats (cross-multiplied CDF difference;
    // at 100 TB counts the products lift into DECIMAL(38,0), same
    // shape — q194's rule). The length grid is bounded (distinct
    // lengths x sources), so after one corpus rollup everything rides
    // windows over a tiny dense grid.
    "q241_ks_drift" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val base = table(s, dir, "documents")
          .select(col("source"),
            size(split(col("text"), " ")).cast("bigint").as("len"))
        val counts = base.groupBy("source", "len")
          .agg(count(lit(1)).as("cs"))
        val lens = counts.groupBy("len").agg(sum("cs").as("ct"))
        val sources = counts.groupBy("source").agg(sum("cs").as("ns"))
        val tot = base.agg(count(lit(1)).as("ntot"))
        val wCum = Window.partitionBy("source").orderBy("len")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        sources.crossJoin(lens)
          .join(counts, Seq("source", "len"), "left")
          .select(col("source"), col("ns"), col("len"), col("ct"),
            coalesce(col("cs"), lit(0L)).as("cs"))
          .withColumn("cum_s", sum("cs").over(wCum))
          .withColumn("cum_t", sum("ct").over(wCum))
          .crossJoin(broadcast(tot))
          .select(col("source"), col("ns"), col("ntot"),
            abs(col("cum_s") * (col("ntot") - col("ns")) -
              (col("cum_t") - col("cum_s")) * col("ns")).as("d"))
          .groupBy("source", "ns", "ntot")
          .agg(max("d").as("ks_num"))
          .select(col("source"), col("ns").as("n_docs"), col("ks_num"),
            (col("ns") * (col("ntot") - col("ns"))).as("ks_den"),
            (col("ks_num").cast("double") /
              (col("ns") * (col("ntot") - col("ns"))).cast("double"))
              .as("ks_stat"))
          .orderBy("source")
      },
      Some(
        """WITH base AS (SELECT source,
          |     CAST(len(string_split(text, ' ')) AS BIGINT) AS len
          |   FROM documents),
          | c AS (SELECT source, len, CAST(count(*) AS BIGINT) AS cs
          |   FROM base GROUP BY 1, 2),
          | l AS (SELECT len, CAST(sum(cs) AS BIGINT) AS ct FROM c GROUP BY len),
          | src AS (SELECT source, CAST(sum(cs) AS BIGINT) AS ns FROM c GROUP BY source),
          | t AS (SELECT CAST(count(*) AS BIGINT) AS ntot FROM base),
          | g AS (SELECT src.source, src.ns, l.len, l.ct,
          |     coalesce(c.cs, 0) AS cs
          |   FROM src CROSS JOIN l LEFT JOIN c ON c.source = src.source AND c.len = l.len),
          | m AS (SELECT source, ns, len, ct, cs,
          |     CAST(sum(cs) OVER (PARTITION BY source ORDER BY len) AS BIGINT) AS cum_s,
          |     CAST(sum(ct) OVER (PARTITION BY source ORDER BY len) AS BIGINT) AS cum_t
          |   FROM g),
          | d AS (SELECT source, ns, t.ntot,
          |     abs(cum_s * (t.ntot - ns) - (cum_t - cum_s) * ns) AS d
          |   FROM m, t)
          | SELECT source, ns AS n_docs, CAST(max(d) AS BIGINT) AS ks_num,
          |   ns * (ntot - ns) AS ks_den,
          |   CAST(max(d) AS DOUBLE) / CAST(ns * (ntot - ns) AS DOUBLE) AS ks_stat
          | FROM d GROUP BY source, ns, ntot ORDER BY source"""
          .stripMargin.replace("\n", ""))),

    // Hapax-legomena share per source: the fraction of a source's
    // vocabulary seen exactly once — the classic vocabulary-richness /
    // OCR-noise signal (clean prose runs ~40-60% hapax; machine spam
    // collapses it, OCR garbage inflates it). One token rollup (the
    // corpus-size shuffle), then a bounded per-source vocabulary
    // aggregate; shares exact bps.
    "q265_hapax_share" -> Q(
      (s, dir) => {
        val tf = table(s, dir, "documents")
          .select(col("source"), explode(split(col("text"), " ")).as("w"))
          .groupBy("source", "w").agg(count(lit(1)).as("tf"))
        tf.groupBy("source")
          .agg(count(lit(1)).as("vocab"),
            sum("tf").as("tokens"),
            sum(when(col("tf") === 1, 1L).otherwise(0L)).as("hapax"))
          .select(col("source"), col("vocab"), col("tokens"), col("hapax"),
            expr("hapax * 10000 div vocab").as("hapax_bps"),
            expr("vocab * 10000 div tokens").as("ttr_bps"))
          .orderBy("source")
      },
      Some(
        """WITH tf AS (SELECT source, w, CAST(count(*) AS BIGINT) AS tf
          |   FROM (SELECT source, unnest(string_split(text, ' ')) AS w
          |     FROM documents) GROUP BY 1, 2)
          | SELECT source, CAST(count(*) AS BIGINT) AS vocab,
          |   CAST(sum(tf) AS BIGINT) AS tokens,
          |   CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
          |   CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) * 10000 // count(*) AS BIGINT) AS hapax_bps,
          |   CAST(count(*) * 10000 // sum(tf) AS BIGINT) AS ttr_bps
          | FROM tf GROUP BY source ORDER BY source"""
          .stripMargin.replace("\n", "")))
  )
}
