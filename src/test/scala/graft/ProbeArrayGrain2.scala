package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B probe for the second array-grain wave: the exact-Jaccard pair
  * source (q24/q64/q85/q96/q110/q198's shared core) at exploded vs
  * array grain, and q139's exact side (candidate x shingle join +
  * count exchange + left-join/coalesce -> two array joins + sorted
  * merge). Verdict: q139 array grain ADOPTED (wins every block); the
  * pair source's array grain REJECTED (loses 1-7% every block — the
  * double re-explode outweighs the removed count exchange when the
  * exploded frame was checkpointed anyway). Checksums compared before
  * timing; min-of-3 per mode, alternating blocks x3.
  *
  * Run: SPARK_TEST_MEM=16g sbt "Test/runMain graft.ProbeArrayGrain2"
  */
object ProbeArrayGrain2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def docs = ops.TestData.table(spark, dir, "documents")

    // SHIPPED exact pair source: exploded checkpoint + count exchange.
    def pairsOld(): DataFrame = ops.DedupOps.jaccardPairs(docs)
    // REJECTED variant: checkpoint per-doc arrays, derive the join
    // sides by explode, counts from size(arr). Measured 1-7% SLOWER
    // than the pre-exploded checkpoint (the double re-explode costs
    // more than the count exchange it removes) — kept here as the
    // re-runnable negative result.
    def pairsNew(): DataFrame = {
      val da = ops.DedupOps.docShingleArrays(docs)
        .localCheckpoint(eager = true)
      val sh = da.select(col("doc_id"), explode(col("arr")).as("s"))
      val cnt = da.select(col("doc_id"),
        size(col("arr")).cast("long").as("n"))
      val pairs = sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("inter"))
      pairs
        .join(cnt.as("ca"), col("d1") === col("ca.doc_id"))
        .join(cnt.as("cb"), col("d2") === col("cb.doc_id"))
        .select(col("d1"), col("d2"), col("inter"),
          (col("inter") * lit(1.0) /
            (col("ca.n") + col("cb.n") - col("inter"))).as("jaccard"))
    }

    def q139Old(): DataFrame = {
      val sig = ops.DedupOps.docSignatures(docs).localCheckpoint()
      val cand = ops.DedupOps.bandedCandidates(sig, 4)
      val hs = ops.DedupOps.hashedShingles(docs).localCheckpoint()
      val cnt = hs.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = cand
        .join(hs.as("ha"), col("d1") === col("ha.doc_id"))
        .join(hs.as("hb"),
          col("d2") === col("hb.doc_id") && col("ha.s") === col("hb.s"))
        .groupBy("d1", "d2").agg(count(lit(1)).as("inter"))
      val agree = aggregate(
        zip_with(col("sa.sig"), col("sb.sig"),
          (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, x) => acc + x)
      val scored = cand
        .join(sig.as("sa"), col("d1") === col("sa.doc_id"))
        .join(sig.as("sb"), col("d2") === col("sb.doc_id"))
        .join(cnt.as("ca"), col("d1") === col("ca.doc_id"))
        .join(cnt.as("cb"), col("d2") === col("cb.doc_id"))
        .join(inter, Seq("d1", "d2"), "left")
        .select(agree.as("agree"),
          coalesce(col("inter"), lit(0L)).as("inter"),
          (col("ca.n") + col("cb.n") - coalesce(col("inter"), lit(0L)))
            .as("uni"))
        .select(
          expr("abs(agree * uni - 16 * inter) * 10000 div (16 * uni)")
            .as("err_bps"),
          expr("agree * 10000 div 16").as("est_bps"),
          expr("inter * 10000 div uni").as("exact_bps"))
      scored
        .withColumn("err_bucket", expr("err_bps div 1000"))
        .groupBy("err_bucket")
        .agg(count(lit(1)).as("n_pairs"),
          expr("sum(est_bps) div count(1)").as("avg_est_bps"),
          expr("sum(exact_bps) div count(1)").as("avg_exact_bps"),
          max("err_bps").as("max_err_bps"))
        .orderBy("err_bucket")
    }
    def q139New(): DataFrame =
      SparkEntry.queries("q139_minhash_calibration")(spark, dir)

    def checksum(df: DataFrame): (Long, Long) = {
      val r = df.select(expr(
        s"bit_xor(xxhash64(${df.columns.sorted.mkString(", ")}))").as("h"),
        count(lit(1)).as("n")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    // pairs: compare rounded jaccard to dodge double-formation order
    // (sum order differs between shapes only via join order; values are
    // exact ratios of longs, so they are equal — but hash on stable
    // integers to be safe).
    def pairKey(df: DataFrame): DataFrame = df.select(col("d1"), col("d2"),
      col("inter"), round(col("jaccard") * 10000).cast("long").as("jbps"))
    val po = checksum(pairKey(pairsOld())); val pn = checksum(pairKey(pairsNew()))
    val qo = checksum(q139Old()); val qn = checksum(q139New())
    println(s"[probe] pairs old=$po new=$pn | q139 old=$qo new=$qn " +
      s"| equal=${po == pn && qo == qn}")
    require(po == pn && qo == qn, "array-grain wave-2 output differs")

    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().select(count(lit(1))).collect()
      (System.nanoTime() - t0) / 1e9
    }
    def min3(f: () => DataFrame): Double = (1 to 3).map(_ => time(f)).min
    (1 to 3).foreach { k =>
      val ap = min3(pairsOld); val bp = min3(pairsNew)
      val aq = min3(q139Old); val bq = min3(q139New)
      println(f"[probe] block $k: pairs old=$ap%.3f new=$bp%.3f " +
        f"(${bp / ap}%.2f) | q139 old=$aq%.3f new=$bq%.3f (${bq / aq}%.2f)")
    }
    spark.stop()
  }
}
