package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** ADVICE r12 (low): the adopted q121 shape omits the explicit
  * broadcast hints that the winning ProbeQ121Slim shape B was measured
  * with — production relies on the optimizer's auto-broadcast of the
  * 15k-row name frames, deliberately, so the same plan degrades
  * gracefully at corpus scale. This probe re-times the pair stage in
  * BOTH forms (hinted vs hint-free name fetch) to confirm the adopted
  * plan's win was not an artifact of the hints. Expected: a wash — the
  * optimizer auto-broadcasts the same frames at bench SFs, so the
  * physical plans should coincide; the probe asserts that too.
  *
  * Run: SPARK_TEST_MEM=16g sbt "Test/runMain graft.ProbeQ121HintFree"
  */
object ProbeQ121HintFree {
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

    def pairs(hinted: Boolean) = {
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
      def side(k: String, n: String) = {
        val f = names.select(col("c_custkey").as(k), col("c_name").as(n))
        if (hinted) broadcast(f) else f
      }
      cand.join(side("d1", "n1"), "d1").join(side("d2", "n2"), "d2")
        .where(graft.functions.LevWithin.levWithin(col("n1"), col("n2"), 2))
        .select(col("d1"), col("d2"))
    }

    val pHinted = pairs(hinted = true)
    val pFree = pairs(hinted = false)
    val samePhysical = pHinted.queryExecution.executedPlan.canonicalized ==
      pFree.queryExecution.executedPlan.canonicalized
    println(s"[q121hintfree] physical plans identical: $samePhysical")
    val a0 = pHinted.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b0 = pFree.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    require(a0 == b0, "pair sets differ between hinted and hint-free")
    println(s"[q121hintfree] identical pair sets, n=${a0.size}")

    def timed(label: String)(thunk: => Long): Double = {
      clear()
      val t0 = System.nanoTime()
      val n = thunk
      val w = (System.nanoTime() - t0) / 1e9
      println(f"[q121hintfree] $label: $w%.3f s (n=$n)")
      w
    }
    pairs(hinted = true).count(); pairs(hinted = false).count()
    val walls = (1 to 3).map { i =>
      val wa = timed(s"hinted#$i")(pairs(hinted = true).count())
      val wb = timed(s"hint-free#$i")(pairs(hinted = false).count())
      (wa, wb)
    }
    println(f"[q121hintfree] best hinted=${walls.map(_._1).min}%.3f s, " +
      f"best hint-free=${walls.map(_._2).min}%.3f s")
    spark.stop()
  }
}
