package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.DedupOps

/** Joint properties of the two near-dup pair sources and the hub-shingle
  * df-cap (VERDICT r4 #1/#5), on a GENERATED corpus with known near-dup
  * structure:
  *
  *  - docs come in (2b, 2b+1) near-dup pairs differing in exactly one
  *    word (jaccard ~0.82 hub-free / 0.625 with hub / 0.60 capped — all
  *    comfortably above the 0.5 threshold, so NO pair's keep/drop
  *    decision rides the hub shingle);
  *  - the "hub" variant appends the same 3-word boilerplate tail to
  *    every doc, injecting one shingle with df = N (the license-header /
  *    navigation-chrome shape that makes the exact join's Sum df^2 cost
  *    quadratic in a single key at 100 TB).
  */
class PairSourceSpec extends SparkSpec {
  import spark.implicits._

  private val NDocs = 60 // 30 near-dup pairs

  /** doc 2b and 2b+1 share 11 of 12 base words (one substitution). */
  private def corpus(withHub: Boolean): DataFrame = {
    val rows = (0 until NDocs).map { i =>
      val base = i / 2
      val words = Seq.tabulate(12)(j => s"w${base}_$j")
      val txt = if (i % 2 == 1) words.init :+ s"alt$base" else words
      val full = if (withHub) txt ++ Seq("common", "hub", "tail") else txt
      (i.toLong, full.mkString(" "))
    }
    rows.toDF("doc_id", "text")
  }

  private def keepSet(kl: DataFrame): Set[Long] =
    kl.where(col("keep") === 1).select("doc_id").as[Long].collect().toSet

  private def dropSet(kl: DataFrame): Set[Long] =
    kl.where(col("keep") === 0).select("doc_id").as[Long].collect().toSet

  test("exact keep-list finds every constructed near-dup on both corpora") {
    Seq(false, true).foreach { hub =>
      val kl = DedupOps.keepList(corpus(hub), "exact")
      // every odd doc is a near-dup of its even partner -> dropped
      assert(dropSet(kl) == (0 until NDocs).filter(_ % 2 == 1)
        .map(_.toLong).toSet, s"withHub=$hub")
    }
  }

  test("df-cap leaves the keep-list identical when no pair rides capped shingles") {
    // Hub-free corpus: max df is 2 (shared pair shingles), so ANY cap
    // >= 2 must be a no-op — bitwise-identical keep-list.
    val hubFree = corpus(withHub = false)
    val uncapped = DedupOps.keepList(hubFree, "exact").collect().toSeq
    spark.conf.set("graft.shingle_df_cap", "2")
    try {
      val capped = DedupOps.keepList(hubFree, "exact").collect().toSeq
      assert(capped == uncapped, "cap changed a hub-free keep-list")
      // Hub corpus: the df=N boilerplate shingle IS capped away, but the
      // constructed pairs sit above 0.5 with or without it, so the
      // keep/drop decisions still match the uncapped run exactly.
      val hubbed = corpus(withHub = true)
      val cappedHub = DedupOps.keepList(hubbed, "exact")
      spark.conf.unset("graft.shingle_df_cap")
      val uncappedHub = DedupOps.keepList(hubbed, "exact")
      assert(cappedHub.collect().toSeq == uncappedHub.collect().toSeq,
        "cap flipped a keep/drop decision that does not ride the hub")
    } finally spark.conf.unset("graft.shingle_df_cap")
  }

  test("hub shingle blows up exact-join candidates; the cap defuses it") {
    // The exact pair source's cost driver is the pre-aggregation join
    // row count Sum_shingles df*(df-1)/2. One df=60 boilerplate shingle
    // adds 60*59/2 = 1770 join rows on its own; the cap removes exactly
    // that term. (Round-5 PLANS.md records these numbers.)
    def joinRows(docs: DataFrame, cap: Option[Long]): Long = {
      val sh0 = DedupOps.hashedShingles(docs)
      val sh = cap.map(DedupOps.capHubShingles(sh0, _)).getOrElse(sh0)
      sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .count()
    }
    val hubFreeRows = joinRows(corpus(withHub = false), None)
    val hubRows = joinRows(corpus(withHub = true), None)
    val cappedRows = joinRows(corpus(withHub = true), Some(2L))
    info(s"exact-join candidate rows: hub-free=$hubFreeRows, " +
      s"with-hub=$hubRows, with-hub capped=$cappedRows")
    val hubTerm = NDocs.toLong * (NDocs - 1) / 2
    assert(hubRows >= hubFreeRows + hubTerm,
      s"expected the df=$NDocs hub key to add >= $hubTerm join rows")
    // capping restores the hub-free candidate volume (boundary shingles
    // are df=1, contributing nothing to the join)
    assert(cappedRows == hubFreeRows,
      s"cap did not remove the hub term: $cappedRows vs $hubFreeRows")
  }

  test("LSH keep-list: dropped set is a subset of exact's with recall >= 0.8") {
    // lsh pairs are exact-rescored candidates, hence a SUBSET of the
    // exact pair set: any doc LSH drops, exact must drop too (precision
    // 1.0 by construction — assert it anyway), and the md5-affine hash
    // family is deterministic, so recall is a stable number, not a
    // flaky one. At jaccard ~0.625, 8 bands x 2 rows give ~0.98
    // per-pair candidate probability.
    val docs = corpus(withHub = true)
    val exactDrop = dropSet(DedupOps.keepList(docs, "exact"))
    val lshDrop = dropSet(DedupOps.keepList(docs, "lsh"))
    assert(lshDrop.subsetOf(exactDrop),
      s"LSH dropped non-duplicates: ${lshDrop -- exactDrop}")
    val recall = lshDrop.size.toDouble / exactDrop.size
    info(f"LSH keep-list recall: $recall%.3f (${lshDrop.size}/${exactDrop.size})")
    assert(recall >= 0.8, f"LSH keep-list recall $recall%.3f below bound")
  }

  test("q85/q96 pair source flips by config and stays consistent") {
    val docs = corpus(withHub = true)
    spark.conf.set("graft.pair_source", "lsh")
    try {
      val viaConf = DedupOps.keepList(docs, DedupOps.pairSource(spark))
      val explicit = DedupOps.keepList(docs, "lsh")
      assert(viaConf.collect().toSeq == explicit.collect().toSeq)
    } finally spark.conf.unset("graft.pair_source")
    intercept[IllegalArgumentException] {
      DedupOps.nearDupPairs(docs, "bogus").count()
    }
  }

  test("q151 prefix filtering loses no pair at the 0.5 threshold") {
    // recall-completeness of the PPJoin candidate source: the
    // prefix-filtered pair set must EQUAL the full shingle self-join's
    // pair set at jaccard >= 0.5 — on the real fixture corpus, where
    // the prefix join touches far fewer tokens.
    val sf = "/root/testdata/sf0.001"
    val full = DedupOps
      .jaccardPairs(graft.ops.TestData.table(spark, sf, "documents"))
      .where(col("jaccard") >= 0.5)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val pref = SparkEntry.queries("q151_prefix_filter_join")(spark, sf)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(pref == full,
      s"missing: ${(full -- pref).take(5)}; extra: ${(pref -- full).take(5)}")
    assert(pref.nonEmpty, "fixture corpus must contain near-dup pairs")
  }

  test("q196 one-sided prefix probe loses no containment pair at 3/4") {
    // recall-completeness of the asymmetric candidate source: the
    // probe-prefix join's qualifying (da, db) set must EQUAL the
    // brute-force set derived from the FULL shingle self-join — both
    // directions of every unordered pair judged against its own side's
    // set size. Also pins the threshold algebra: 4*inter >= 3*na with
    // integer inter/na, never a float ratio.
    val sf = "/root/testdata/sf0.001"
    val docs = graft.ops.TestData.table(spark, sf, "documents")
    val pairs = DedupOps.jaccardPairs(docs)
      .select("d1", "d2", "inter").as[(Long, Long, Long)].collect()
    val n = DedupOps.shingles(docs).groupBy("doc_id").count()
      .as[(Long, Long)].collect().toMap
    val brute = pairs.flatMap { case (d1, d2, inter) =>
      Seq((d1, d2, n(d1)), (d2, d1, n(d2))).collect {
        case (a, b, na) if 4 * inter >= 3 * na => (a, b)
      }
    }.toSet
    val got = SparkEntry.queries("q196_containment_pairs")(spark, sf)
      .select("da", "db").as[(Long, Long)].collect().toSet
    assert(got == brute,
      s"missing: ${(brute -- got).take(5)}; extra: ${(got -- brute).take(5)}")
    assert(got.nonEmpty, "fixture corpus must contain containment pairs")
    // (at sf0.001 the planted near-dups are size-balanced, so pairs may
    // all be mutual — the asymmetric direction is covered by the brute
    // equality above, which judges each direction against its own side)
    info(s"one-directional pairs: ${got.count(p => !got.contains(p.swap))}" +
      s" of ${got.size}")
  }
}
