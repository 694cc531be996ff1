package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.{DedupOps, TrainDataOps}

/** Property-based invariants of the training-data curation helpers on
  * seeded random corpora (deterministic — fixed ScalaCheck seeds).
  */
class TrainDataPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int, seed: Long = 7L): List[A] =
    Gen.listOfN(n, g)(Gen.Parameters.default, Seed(seed)).get

  /** Random small-vocab word-soup docs (collisions guaranteed). */
  private def corpus(n: Int, seed: Long): org.apache.spark.sql.DataFrame = {
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee")
    val doc = Gen.chooseNum(1, 30).flatMap(k =>
      Gen.listOfN(k, word).map(_.mkString(" ")))
    sample(doc, n, seed).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("chunk dedup: kept occurrences == distinct chunks in the corpus") {
    val docs = corpus(60, seed = 11L)
    val stats = TrainDataOps.chunkDedupStats(docs)
      .agg(sum(col("n_chunks") - col("n_dup")), sum("n_chunks"))
      .as[(Long, Long)].head()
    val distinctChunks = TrainDataOps.chunkOccurrences(docs)
      .select("ch").distinct().count()
    assert(stats._1 == distinctChunks) // one keeper per distinct chunk
    assert(stats._2 == TrainDataOps.chunkOccurrences(docs).count())
  }

  test("bm25: score is zero iff no query term occurs") {
    val docs = corpus(40, seed = 13L) // vocab disjoint from query terms
      .unionByName(Seq((1000L, "spark aa bb cc dd")).toDF("doc_id", "text"))
    val scored = TrainDataOps.bm25(docs)
      .select("doc_id", "bm25").as[(Long, Double)].collect().toMap
    assert(scored(1000L) > 0.0)
    scored.filterNot(_._1 == 1000L).values.foreach(s => assert(s == 0.0))
  }

  test("incremental dedup: every dup_of points at an earlier kept doc") {
    val docs = corpus(80, seed = 17L)
    val out = TrainDataOps.incrementalDedup(docs)
      .select("doc_id", "status", "dup_of")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(out.nonEmpty)
    out.foreach { case (id, status, dupOf) =>
      if (status == "new") assert(dupOf == -1L)
      else if (status == "dup_batch") {
        // within-batch dups DO point at a strictly earlier batch member
        assert(dupOf >= 0 && dupOf < id && dupOf % 10 == 9)
      } else {
        // corpus dups point at the corpus min-id for the fingerprint,
        // which may be on either side of this batch doc's id
        assert(status == "dup_corpus" && dupOf >= 0 && dupOf % 10 != 9)
      }
    }
  }

  test("leak-safe split: split is a pure function of the canonical id") {
    val docs = corpus(120, seed = 19L)
    val out = TrainDataOps.leakSafeSplit(docs)
      .select("canonical_id", "split").as[(Long, String)].collect()
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).distinct.length == 1)
    }
  }

  test("jaccard pairs: symmetric-free, bounded, and exact on dup docs") {
    val docs = corpus(50, seed = 23L)
    val pairs = DedupOps.jaccardPairs(docs)
      .select("d1", "d2", "jaccard").as[(Long, Long, Double)].collect()
    pairs.foreach { case (d1, d2, j) =>
      assert(d1 < d2)              // each unordered pair appears once
      assert(j > 0.0 && j <= 1.0)
    }
    // identical shingle sets -> jaccard exactly 1.0
    val dup = Seq((1L, "x1 x2 x3 x4 x5"), (2L, "x1 x2 x3 x4 x5"))
      .toDF("doc_id", "text")
    val j12 = DedupOps.jaccardPairs(dup).select("jaccard").as[Double].head()
    assert(j12 == 1.0)
  }
}
