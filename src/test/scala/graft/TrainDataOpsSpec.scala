package graft

import org.apache.spark.sql.functions._
import graft.ops.TrainDataOps

/** Semantics of the training-data curation operators on hand fixtures. */
class TrainDataOpsSpec extends SparkSpec {
  import spark.implicits._

  private val w8 = "w1 w2 w3 w4 w5 w6 w7 w8"

  test("chunk dedup: repeated 8-word chunk flagged, trailing partial kept") {
    val docs = Seq(
      (1L, s"$w8 t1 t2"),              // chunk0 = w8 block, chunk1 = "t1 t2"
      (2L, s"$w8 u1 u2 u3"),           // chunk0 duplicates doc 1's chunk0
      (3L, "a b c")                    // single partial chunk, unique
    ).toDF("doc_id", "text")
    val got = TrainDataOps.chunkDedupStats(docs)
      .orderBy("doc_id")
      .select("doc_id", "n_chunks", "n_dup")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 0L), (2L, 2L, 1L), (3L, 1L, 0L)))
  }

  test("chunk dedup: first occurrence is by (doc_id, chunk_idx) order") {
    // The same chunk at doc 1 idx 1 and doc 2 idx 0: doc 1 owns it.
    val docs = Seq(
      (1L, s"a1 a2 a3 a4 a5 a6 a7 a8 $w8"),
      (2L, w8)
    ).toDF("doc_id", "text")
    val dup = TrainDataOps.chunkDedupStats(docs)
      .where(col("n_dup") > 0).select("doc_id")
      .as[Long].collect().toSeq
    assert(dup == Seq(2L))
  }

  test("bm25: tf saturation and df damping behave like BM25") {
    // Same doc length everywhere; only tf('spark') varies, no other
    // query term appears — so scores isolate one term's saturation.
    val docs = Seq(
      (1L, "spark spark spark x y"),
      (2L, "spark a b c d"),
      (3L, "p q r s t")
    ).toDF("doc_id", "text")
    val got = TrainDataOps.bm25(docs)
      .select("doc_id", "tf_spark", "bm25")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L)._3 > got(2L)._3 && got(2L)._3 > got(3L)._3)
    assert(got(3L)._3 == 0.0)
    // saturation: tripling tf must NOT triple the score (k1 damping).
    assert(got(1L)._3 < 3.0 * got(2L)._3)
  }

  test("random projection: 16 dims, zero maps to zero, exact 2x linearity") {
    val emb = Seq(
      (0L, Array.fill(64)(0.0f)),
      (1L, Array.tabulate(64)(i => (i % 7 - 3) * 0.25f)),
      (2L, Array.tabulate(64)(i => (i % 7 - 3) * 0.5f))
    ).toDF("vec_id", "embedding")
    val got = TrainDataOps.projectEmbeddings(emb)
      .orderBy("vec_id").as[(Long, Seq[Double])].collect()
    assert(got.forall(_._2.length == 16))
    assert(got(0)._2.forall(_ == 0.0))
    // scaling by 2 is an exponent shift: proj(2v) == 2 * proj(v) exactly.
    assert(got(2)._2 == got(1)._2.map(_ * 2.0))
  }

  test("pii redaction: email, phone, and ip all scrubbed") {
    val red = Seq("reach user77@example.com call +1-555-0042 from 10.0.3.7 now")
      .toDF("t").select(TrainDataOps.redactPii(col("t"))).as[String].head()
    assert(red == "reach <EMAIL> call <PHONE> from <IP> now")
  }

  test("pii redaction: clean text untouched") {
    val t = "plain words only here"
    val red = Seq(t).toDF("t")
      .select(TrainDataOps.redactPii(col("t"))).as[String].head()
    assert(red == t)
  }

  test("rare bigrams: relative threshold separates unique from common") {
    // 99 copies of "a b" + 1 "x y": count('x y') * 50 = 50 <= 100 docs
    // (rare), count('a b') * 50 = 4950 > 100 (common).
    val docs = ((1L to 99L).map(i => (i, "a b")) :+ (100L, "x y"))
      .toDF("doc_id", "text")
    val got = TrainDataOps.rareBigrams(docs)
      .select("doc_id", "n_rare").as[(Long, Long)].collect().toMap
    assert(got(100L) == 1L)
    assert((1L to 99L).forall(got(_) == 0L))
  }

  test("incremental dedup: corpus dup beats batch dup beats new") {
    val prefix = "p1 p2 p3 p4 p5 p6 p7 p8"
    val docs = Seq(
      (3L, s"$prefix corpus tail"),     // corpus owner of the prefix
      (9L, "n1 n2 n3 n4 n5 n6 n7 n8"),  // batch, unique -> new
      (19L, s"$prefix other tail"),     // batch, matches corpus 3
      (29L, "n1 n2 n3 n4 n5 n6 n7 n8 x") // batch, matches batch 9
    ).toDF("doc_id", "text")
    val got = TrainDataOps.incrementalDedup(docs)
      .select("doc_id", "status", "dup_of")
      .collect().map(r => (r.getLong(0),
        (r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
    assert(got(9L) == ("new", -1L))
    assert(got(19L) == ("dup_corpus", 3L))
    assert(got(29L) == ("dup_batch", 9L))
  }

  test("curation pipeline: final keep is the AND of all gates") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.SparkEntry.queries("q96_curation_pipeline")(spark, dir)
      .select("doc_id", "q_keep", "dedup_keep", "contam", "final_keep")
      .as[(Long, Int, Int, Int, Int)].collect()
    assert(out.length == 500)
    assert(out.forall { case (id, q, d, c, f) =>
      f == (if (q == 1 && d == 1 && c == 0 && id % 97 != 0) 1 else 0)
    })
    // every gate fires somewhere on this corpus
    assert(out.exists(_._2 == 0) && out.exists(_._3 == 0) &&
      out.exists(_._4 == 1) && out.exists(_._5 == 1))
  }

  test("training shuffle: bijective interleave, bounded shards, stable") {
    val dir = "/root/testdata/sf0.001"
    val run = graft.SparkEntry.queries("q97_training_shuffle")(spark, dir)
      .select("doc_id", "shard", "global_ord")
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    assert(run.length == 500)
    assert(run.map(_._3).distinct.length == 500) // interleave is injective
    assert(run.forall(r => r._2 >= 0 && r._2 < 8))
    val rerun = graft.SparkEntry.queries("q97_training_shuffle")(spark, dir)
      .select("doc_id", "shard", "global_ord")
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    assert(run.toSeq == rerun.toSeq) // deterministic across runs
  }

  test("leak-safe split: duplicate docs land in the same split") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "  alpha  beta gamma "), // same after normalization -> canon 1
      (7L, "alpha beta gamma"),     // exact dup -> canon 1
      (3L, "delta epsilon zeta")
    ).toDF("doc_id", "text")
    val got = TrainDataOps.leakSafeSplit(docs)
      .select("doc_id", "canonical_id", "split")
      .as[(Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(got(1L)._2 == 1L && got(2L)._2 == 1L && got(7L)._2 == 1L)
    assert(got(1L)._3 == got(2L)._3 && got(2L)._3 == got(7L)._3)
    assert(got(3L)._2 == 3L)
  }

  test("leak-safe split: all three splits materialize on the corpus") {
    val dir = "/root/testdata/sf0.001"
    val splits = graft.SparkEntry.queries("q98_leak_safe_split")(spark, dir)
      .groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(splits.keySet == Set("train", "val", "test"))
    assert(splits("train") > splits("val") && splits("train") > splits("test"))
  }

  test("segmentation: stride-24 starts, 32-cap lengths, full coverage") {
    val dir = "/root/testdata/sf0.001"
    val segs = graft.SparkEntry.queries("q99_segment_docs")(spark, dir)
      .select("doc_id", "seg_idx", "seg_start", "seg_len")
      .as[(Long, Int, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val nWords = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "size(split(text, ' ')) AS n")
      .as[(Long, Int)].collect().toMap
    segs.foreach { case (id, ss) =>
      ss.foreach { case (_, idx, start, len) =>
        assert(start == 24L * idx + 1)
        assert(len == math.min(32L, nWords(id) - start + 1))
      }
      // the last segment reaches the final word; one segment per stride
      val (_, _, lastStart, lastLen) = ss.last
      assert(lastStart + lastLen - 1 == nWords(id))
      assert(ss.length == (nWords(id) - 1) / 24 + 1)
    }
  }

  test("kmeans: assignment is argmin, update is the exact cluster mean") {
    val pts = Seq(
      (0L, Array(0.0, 0.0)), (1L, Array(10.0, 10.0)),   // initial centroids
      (2L, Array(1.0, 1.0)), (3L, Array(9.0, 9.0)),
      (4L, Array(0.0, 2.0))
    ).toDF("vec_id", "v")
    val init = pts.where(col("vec_id") < 2)
      .select(col("vec_id").cast("int").as("cid"), col("v").as("c"))
    val a = TrainDataOps.kmeansAssign(pts, init)
      .select("vec_id", "cid").as[(Long, Int)].collect().toMap
    assert(a == Map(0L -> 0, 1L -> 1, 2L -> 0, 3L -> 1, 4L -> 0))
    val c1 = TrainDataOps.kmeansUpdate(TrainDataOps.kmeansAssign(pts, init))
      .select("cid", "c").as[(Int, Seq[Double])].collect().toMap
    // cluster 0 = {(0,0),(1,1),(0,2)} -> mean (1/3, 1): micros sums are
    // exact, the final division is one correctly-rounded double op
    assert(c1(0) == Seq(1.0 / 3, 1.0))
    assert(c1(1) == Seq(9.5, 9.5))
  }

  test("semantic dedup: dup_of is an earlier in-cell vector") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.SparkEntry.queries("q102_semantic_dedup")(spark, dir)
      .select("vec_id", "cid", "dup_of", "keep")
      .collect().map(r => (r.getLong(0), r.getInt(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getInt(3)))
    val cell = out.map(r => r._1 -> r._2).toMap
    assert(out.exists(_._4 == 0) && out.exists(_._4 == 1))
    out.foreach { case (id, cid, dupOf, keep) =>
      assert((keep == 1) == (dupOf == -1L))
      if (dupOf >= 0) {
        assert(dupOf < id)             // points at an earlier vector
        assert(cell(dupOf) == cid)     // in the same k-means cell
      }
    }
  }

  test("hard negatives exclude same-label candidates") {
    val dir = "/root/testdata/sf0.001"
    val q = graft.SparkEntry.queries("q93_hard_negatives")(spark, dir)
    val rows = q.select("query_id", "cand_id").as[(Long, Long)].collect()
    val labels = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "label").as[(Long, Int)].collect().toMap
    assert(rows.nonEmpty)
    assert(rows.forall { case (qid, cid) => labels(qid) != labels(cid) })
  }

  test("q200 DSIR weights: total coverage, ratio bounds, target ranks up") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q200_dsir_weights")(spark, dir)
      .select("doc_id", "lang", "n_words", "ratio_sum", "per_word")
      .as[(Long, String, Long, Long, Double)].collect()
    val docs = graft.ops.TestData.table(spark, dir, "documents")
    assert(rows.length == docs.count(), "one weight per document")
    // word-count conservation against a direct recount
    val totalWords = docs
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(col("text"), " ")).as("w"))
      .where(org.apache.spark.sql.functions.length(col("w")) > 0).count()
    assert(rows.map(_._3).sum == totalWords, "n_words conservation")
    // smoothed ppm ratios stay near 1e6 on a shared-vocab corpus; the
    // sanity band catches unit mistakes (ppm vs raw, div direction)
    rows.foreach { r =>
      assert(r._5 > 5e5 && r._5 < 2e6, s"per_word out of band: $r")
      assert(math.abs(r._5 - r._4.toDouble / r._3) < 1e-9)
    }
    // E_target[p/q] >= E_corpus[p/q]: the target language's mean weight
    // must top every other language's mean on the deterministic fixture
    val byLang = rows.groupBy(_._2).map { case (l, rs) =>
      l -> rs.map(_._5).sum / rs.length
    }
    byLang.filter(_._1 != "en").foreach { case (l, m) =>
      assert(byLang("en") > m, s"en mean ${byLang("en")} !> $l mean $m")
    }
  }

  test("q206 held-out coverage: train is its own vocabulary, held-out is not") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q206_heldout_coverage")(spark, dir)
      .select("split", "n_grams", "unseen_grams", "unseen_bps")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(rows.keySet == Set("train", "val", "test"))
    assert(rows("train")._3 == 0, "train 4-grams are all in the train set")
    Seq("val", "test").foreach { sp =>
      val r = rows(sp)
      assert(r._3 > 0 && r._3 <= r._2, s"$sp unseen accounting")
      assert(r._4 == r._3 * 10000 / r._2, s"$sp bps accounting")
    }
    // gram conservation vs a direct recount
    val total = graft.ops.TestData.table(spark, dir, "documents")
      .select(split(col("text"), " ").as("w")).where(size(col("w")) >= 4)
      .select((size(col("w")) - 3).cast("long").as("k"))
      .agg(sum("k")).as[Long].collect().head
    assert(rows.values.map(_._2).sum == total, "4-gram conservation")
  }
}
