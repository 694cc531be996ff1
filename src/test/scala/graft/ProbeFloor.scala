package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the per-query FLOOR at sf0.1 — what a catalog entry costs
  * before it does any distinctive work: (a) count over the cached
  * relation (scan+schedule only), (b) one-shuffle groupBy count,
  * (c) two-shuffle groupBy + orderBy. 228 of 279 catalog queries run
  * at <= 0.5 s and sum to ~37 s of the ~103 s total; this probe pins
  * how much of that is Spark's stage floor rather than shavable work.
  *
  * Run: SPARK_TEST_MEM=16g sbt "Test/runMain graft.ProbeFloor"
  */
object ProbeFloor {
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

    def li = ops.TestData.table(spark, dir, "lineitem")
    def shapes: Seq[(String, () => Long)] = Seq(
      "scan_count" -> (() => li.count()),
      "one_shuffle" -> (() =>
        li.groupBy("l_returnflag").agg(count(lit(1))).count()),
      "two_shuffle_sort" -> (() =>
        li.groupBy("l_partkey").agg(sum("l_quantity").as("q"))
          .orderBy(desc("q")).limit(10).count()),
      "docs_scan_texthash" -> (() =>
        ops.TestData.table(spark, dir, "documents")
          .select(xxhash64(col("text")).as("h")).agg(max("h")).count())
    )
    // Warmup all shapes, then 5 timed rounds each.
    shapes.foreach(_._2())
    val t = shapes.map { case (name, f) =>
      val ws = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }
      println(f"[floor] $name: min=${ws.min}%.3f median=${ws.sorted.apply(2)}%.3f s")
      name -> ws.min
    }
    println(f"[floor] implied 279-query floor at scan_count grain: ${
      t.head._2 * 279}%.1f s")
    spark.stop()
  }
}
