package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe for VERDICT r11 #5: q121's candidate stage currently
  * shuffles the full variant frame (vh, custkey, nationkey, mktsegment,
  * c_name) on BOTH sides of the shuffled-hash self-join, with the
  * banded Levenshtein verify as the join residual. The candidate
  * alternative slims the variant frame to (vh, block keys, custkey) —
  * shedding c_name, ~18 of ~48 bytes per variant row — and fetches
  * names per DISTINCT candidate pair afterwards (broadcast joins
  * against the 15k-row customer base at sf0.1), verifying Levenshtein
  * on the slim candidates. The r6 finding (verify-inside-join beat the
  * name re-joins at 4.3 candidates per true pair) predates the
  * shuffled-hash conversion and the pre-verify distinct, so the
  * question is re-measured, not re-argued.
  *
  * Adoption rule (the r11 shingle-join template): adopt only on a
  * clear A/B win with identical pair sets; a wash or a loss is
  * recorded in PLANS.md and the current shape stays.
  *
  * Run: SPARK_TEST_MEM=16g sbt "Test/runMain graft.ProbeQ121Slim"
  */
object ProbeQ121Slim {
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

    val c = ops.TestData.table(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"),
        col("c_nationkey"), col("c_mktsegment"))

    // A: the shipped shape — name rides the variant frame, Levenshtein
    // is the join residual, distinct dedups verified pairs.
    def shapeA() = {
      val variants = ops.ExtendedOps.deletionVariants(c, "c_name",
          Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment"))
        .localCheckpoint(eager = true)
      variants.as("a").hint("shuffle_hash")
        .join(variants.as("b"),
          col("a.vh") === col("b.vh") &&
            col("a.c_nationkey") === col("b.c_nationkey") &&
            col("a.c_mktsegment") === col("b.c_mktsegment") &&
            col("a.c_custkey") < col("b.c_custkey") &&
            graft.functions.LevWithin.levWithin(
              col("a.c_name"), col("b.c_name"), 2))
        .select(col("a.c_custkey").as("d1"), col("b.c_custkey").as("d2"))
        .distinct()
    }

    // B: slim variants (no c_name), distinct candidates first, then
    // broadcast name fetch + Levenshtein verify.
    def shapeB() = {
      val variants = ops.ExtendedOps.deletionVariants(c, "c_name",
          Seq("c_custkey", "c_nationkey", "c_mktsegment"))
        .localCheckpoint(eager = true)
      val cand = variants.as("a").hint("shuffle_hash")
        .join(variants.as("b"),
          col("a.vh") === col("b.vh") &&
            col("a.c_nationkey") === col("b.c_nationkey") &&
            col("a.c_mktsegment") === col("b.c_mktsegment") &&
            col("a.c_custkey") < col("b.c_custkey"))
        .select(col("a.c_custkey").as("d1"), col("b.c_custkey").as("d2"))
        .distinct()
      val names = c.select(col("c_custkey"), col("c_name"))
      cand
        .join(broadcast(names.select(col("c_custkey").as("d1"),
          col("c_name").as("n1"))), "d1")
        .join(broadcast(names.select(col("c_custkey").as("d2"),
          col("c_name").as("n2"))), "d2")
        .where(graft.functions.LevWithin.levWithin(col("n1"), col("n2"), 2))
        .select(col("d1"), col("d2"))
    }

    // Identity check once: the two shapes must produce the same pairs.
    val a0 = shapeA().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b0 = shapeB().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    require(a0 == b0, s"pair sets differ: A-only=${(a0 -- b0).take(5)} " +
      s"B-only=${(b0 -- a0).take(5)}")
    println(s"[q121slim] identical pair sets, n=${a0.size}")

    // Warmup both, then alternate A/B x3.
    shapeA().count(); shapeB().count()
    def timed(label: String)(thunk: => Long): Double = {
      clear()
      val t0 = System.nanoTime()
      val n = thunk
      val w = (System.nanoTime() - t0) / 1e9
      println(f"[q121slim] $label: $w%.3f s (n=$n)")
      w
    }
    val walls = (1 to 3).map { i =>
      val wa = timed(s"A#$i")(shapeA().count())
      val wb = timed(s"B#$i")(shapeB().count())
      (wa, wb)
    }
    val bestA = walls.map(_._1).min
    val bestB = walls.map(_._2).min
    println(f"[q121slim] best A=$bestA%.3f s, best B=$bestB%.3f s, " +
      f"B/A=${bestB / bestA}%.2f")
    spark.stop()
  }
}
