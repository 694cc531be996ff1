package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe: q151's prefix-token self-join (inside
  * DedupOps.prefixFilterCandidates) runs as sort-merge; both sides are
  * the same derived prefix frame shuffled on `s`, so Catalyst reuses
  * one exchange but still pays two sorts whose ordering nothing
  * downstream uses — the exact shape the r11 shuffled-hash conversions
  * (q121 candidates, the lineitem co-purchase bases) won on.
  * Adoption rule unchanged: identical pair sets asserted once, then
  * alternate A/B x3; adopt only a consistent win.
  *
  * Run: SPARK_TEST_MEM=16g sbt "Test/runMain graft.ProbeQ151Shj"
  */
object ProbeQ151Shj {
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

    def sh() = ops.DedupOps.hashedShingles(
        ops.TestData.table(spark, dir, "documents"))
      .localCheckpoint(eager = true)

    def pre(shF: org.apache.spark.sql.DataFrame) = {
      import org.apache.spark.sql.expressions.Window
      val cnt = shF.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val dfreq = shF.groupBy("s").agg(count(lit(1)).as("df"))
      shF.join(dfreq, "s")
        .withColumn("rk", row_number().over(
          Window.partitionBy("doc_id").orderBy("df", "s")))
        .join(cnt, "doc_id")
        .where(col("rk") <= expr("n div 2 + 1"))
        .select(col("doc_id"), col("s"))
    }

    def shapeA() = { // shipped: sort-merge self-join
      val p = pre(sh())
      p.as("a").join(p.as("b"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .distinct()
    }
    def shapeB() = { // shuffled-hash hint
      val p = pre(sh())
      p.as("a").hint("shuffle_hash").join(p.as("b"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .distinct()
    }

    val a0 = shapeA().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b0 = shapeB().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    require(a0 == b0, s"pair sets differ: ${(a0 -- b0).take(3)} / ${(b0 -- a0).take(3)}")
    println(s"[q151shj] identical pair sets, n=${a0.size}")
    println("[q151shj] B plan joins: " + shapeB().queryExecution.executedPlan
      .toString.linesIterator.filter(_.contains("Join")).map(_.trim.take(60))
      .mkString(" | "))

    shapeA().count(); shapeB().count() // warm
    def timed(label: String)(thunk: => Long): Double = {
      clear()
      val t0 = System.nanoTime()
      val n = thunk
      val w = (System.nanoTime() - t0) / 1e9
      println(f"[q151shj] $label: $w%.3f s (n=$n)")
      w
    }
    val walls = (1 to 3).map { i =>
      (timed(s"A#$i")(shapeA().count()), timed(s"B#$i")(shapeB().count()))
    }
    println(f"[q151shj] best A=${walls.map(_._1).min}%.3f s, " +
      f"best B=${walls.map(_._2).min}%.3f s, " +
      f"B/A=${walls.map(_._2).min / walls.map(_._1).min}%.2f")
    spark.stop()
  }
}
