package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B: q111's winnow-fingerprint self-join re-evaluates the per-doc
  * md5 winnowing on BOTH join sides (no common-subexpression reuse
  * across a self-join in Spark); an eager localCheckpoint of the
  * (doc_id, fp) frame — the q24/q121 discipline, measured there —
  * should roughly halve the expensive leaf. Adopt only on an A/B x3
  * win with identical output (the standing rule).
  *
  * Run: SPARK_TEST_MEM=16g sbt "Test/runMain graft.ProbeQ111Ckpt"
  */
object ProbeQ111Ckpt {
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

    def clear(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      org.apache.spark.graft.BenchInternals.removeAllBroadcasts()
      System.gc()
    }

    def fingerprints() = {
      val docs = ops.TestData.table(spark, dir, "documents")
      val hs = expr(
        "transform(sequence(1, size(w) - 3), " +
          "i -> cast(conv(substring(md5(array_join(slice(w, i, 4), ' ')), 1, 15), 16, 10) as bigint))")
      val fps = expr(
        "array_distinct(transform(sequence(1, greatest(size(hs) - 4, 1)), " +
          "j -> array_min(slice(hs, j, 5))))")
      docs.select(col("doc_id"), split(col("text"), " ").as("w"))
        .where(size(col("w")) >= 4)
        .select(col("doc_id"), hs.as("hs"))
        .select(col("doc_id"), explode(fps).as("fp"))
    }

    def q111(ckpt: Boolean) = {
      val f0 = fingerprints()
      val f = if (ckpt) f0.localCheckpoint(eager = true) else f0
      f.as("a").join(f.as("b"),
          col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("n_shared"))
        .orderBy(desc("n_shared"), col("d1"), col("d2"))
        .limit(20)
    }

    val a0 = q111(false).collect().map(_.toSeq).toSeq
    val b0 = q111(true).collect().map(_.toSeq).toSeq
    require(a0 == b0, s"outputs differ: $a0 vs $b0")
    println(s"[q111ckpt] identical output, rows=${a0.size}")

    def timed(label: String)(thunk: => Long): Double = {
      clear()
      val t0 = System.nanoTime()
      val n = thunk
      val w = (System.nanoTime() - t0) / 1e9
      println(f"[q111ckpt] $label: $w%.3f s (n=$n)")
      w
    }
    q111(false).count(); q111(true).count()
    val walls = (1 to 3).map { i =>
      val wa = timed(s"A(no-ckpt)#$i")(q111(false).count())
      val wb = timed(s"B(ckpt)#$i")(q111(true).count())
      (wa, wb)
    }
    println(f"[q111ckpt] best A=${walls.map(_._1).min}%.3f s, " +
      f"best B=${walls.map(_._2).min}%.3f s, pairwise B<A: ${
        walls.count(p => p._2 < p._1)}/3")
    spark.stop()
  }
}
