package graft

import org.apache.spark.sql.functions._

/** Behavioral laws for the corpus-statistics batch (q168-q170): the
  * DuckDB oracle pins exact values; these pin scale-free invariants —
  * dyadic-OLS slope bounds, growth-curve monotonicity and conservation,
  * and BPE weight accounting.
  */
class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val tokens = graft.ops.TestData.table(spark, sf, "documents")
    .select(explode(split(col("text"), " ")).as("w"))
    .where(length(col("w")) > 0)

  test("q168 dyadic Zipf slope: finite, non-positive, types match vocab") {
    val r = run("q168_zipf_slope")
      .select("n_types", "slope", "intercept")
      .as[(Long, Double, Double)].collect().head
    val vocab = tokens.distinct().count()
    assert(r._1 == vocab, "n_types is the vocabulary size")
    // freq is non-increasing in rank, so the dyadic regression slope
    // can never be positive; -2 bounds any real corpus by a wide margin
    assert(r._2 <= 0.0 && r._2 >= -2.0, s"slope ${r._2}")
    assert(!r._3.isNaN && !r._3.isInfinite)
  }

  test("q169 Heaps curve: monotone, conserves totals, types<=tokens per prefix") {
    val rows = run("q169_heaps_curve")
      .select("bucket", "docs", "new_types", "cum_docs", "cum_tokens", "cum_types")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    val totalDocs = graft.ops.TestData.table(spark, sf, "documents").count()
    val totalTokens = tokens.count()
    val vocab = tokens.distinct().count()
    assert(rows.last._4 == totalDocs, "cum_docs reaches the corpus")
    assert(rows.last._5 == totalTokens, "cum_tokens reaches the token count")
    assert(rows.last._6 == vocab, "cum_types reaches the vocabulary")
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._4 > a._4 && b._5 > a._5 && b._6 >= a._6, "monotone growth")
        // dyadic prefixes: each bucket at most doubles the doc count + 1
        assert(b._4 <= 2 * a._4 + 1, s"dyadic doc growth at bucket ${b._1}")
      case _ =>
    }
    rows.foreach(r => assert(r._6 <= r._5, "cannot see more types than tokens"))
  }

  test("q170 BPE merges: ranked, weights consistent with an exact recount") {
    val rows = run("q170_bpe_pair_merge")
      .select("rank", "pair", "weight")
      .as[(Int, String, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1 to rows.length), "dense ranks from 1")
    assert(rows.length <= 20)
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._3 >= b._3, "non-increasing weight")
      case _ =>
    }
    rows.foreach { case (_, p, _) => assert(p.length == 2) }
    // recount the top pair directly from the token stream: the number
    // of occurrences of that adjacent pair across all tokens
    val top = rows.head
    val recount = tokens.select(
      size(expr(s"filter(transform(sequence(1, length(w) - 1), " +
        s"i -> substring(w, i, 2)), p -> p = '${top._2}')")).as("c"))
      .agg(sum("c")).as[Long].collect().head
    assert(recount == top._3, s"top pair ${top._2}: $recount vs ${top._3}")
  }

  test("q178 readability: integer accounting and score bounds") {
    val rows = run("q178_readability")
      .select("source", "n_docs", "n_words", "n_syllables", "flesch")
      .as[(String, Long, Long, Long, Double)].collect()
    val srcs = graft.ops.TestData.table(spark, sf, "documents")
      .select("source").distinct().count()
    assert(rows.length == srcs, "one row per source")
    assert(rows.map(_._3).sum == tokens.count(), "words conserved")
    rows.foreach { case (src, d, w, syl, f) =>
      assert(w >= d, s"$src: at least one word per doc")
      assert(syl >= w, s"$src: every word has >= 1 syllable")
      assert(!f.isNaN && !f.isInfinite && f < 206.835, s"$src: $f")
    }
  }

  test("q193 cluster sizes: docs conserved, drops consistent with q22-style dedup") {
    val rows = run("q193_cluster_size_dist")
      .select("cluster_size", "n_clusters", "docs", "dedup_drops")
      .as[(Long, Long, Long, Long)].collect()
    val docs = graft.ops.TestData.table(spark, sf, "documents")
    assert(rows.map(_._3).sum == docs.count(), "docs conserved")
    rows.foreach { case (sz, nc, d, drops) =>
      assert(d == sz * nc && drops == (sz - 1) * nc, s"size $sz arithmetic")
    }
    // total drops = corpus - distinct fingerprints
    val distinctFp = docs.select(graft.ops.TextOps.normalizedFp.as("fp"))
      .distinct().count()
    assert(rows.map(_._4).sum == docs.count() - distinctFp, "drop accounting")
  }
}
