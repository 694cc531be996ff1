package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 probe: q152 k-core runs 7 blocking checkpoints (pairs,
  * edges0, deg0, deg1..deg4) for ~0.25-0.33 s of work each — the wall
  * is barrier latency, not compute (ProbeR15Jobs: 20 jobs, 0.75 s
  * driver gap). Two structural cuts, composable:
  *
  *  B = edges0 LAZY: the symmetrized union is a pure map over the
  *      pairs checkpoint; materializing it is a barrier + 2E rows of
  *      storage. Each consumer (deg0 + 4 peel rounds) re-runs the
  *      narrow union map over the materialized pairs leaf instead.
  *  C = B + TWO peel rounds per checkpoint: round r+1's alive set
  *      broadcasts the LAZY deg_r aggregate inside the same job (one
  *      job, two passes over the edge map), halving the round
  *      barriers (4 -> 2). The lazy nesting is ONE level deep —
  *      bounded, unlike the r14 lazy chain this family removed.
  *
  * Identity-checked (full d4 output), A/B/C x3 alternating, noop sink.
  *
  * Run: sbt "Test/runMain graft.ProbeR16Kc"
  */
object ProbeR16Kc {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.sql.codegen.cache.maxEntries", "4000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def kcA(): DataFrame = SparkEntry.queries("q152_kcore")(spark, dir)

    def kcVariant(fuse: Boolean): DataFrame = {
      val pairs0 = ops.WarehouseOps.coPurchasePairs(spark, dir)
      val edges0 = pairs0.select(col("u").as("a"), col("v").as("b"))
        .unionAll(pairs0.select(col("v").as("a"), col("u").as("b")))
      var deg = edges0.groupBy("a").agg(count(lit(1)).as("deg"))
        .localCheckpoint(eager = true)
      if (fuse) {
        for (_ <- 1 to 2) {
          val mid = ops.WarehouseOps.kcorePeel(edges0, deg, 3)
            .groupBy("a").agg(count(lit(1)).as("deg"))
          deg = ops.WarehouseOps.kcorePeel(edges0, mid, 3)
            .groupBy("a").agg(count(lit(1)).as("deg"))
            .localCheckpoint(eager = true)
        }
      } else {
        for (_ <- 1 to 4) {
          deg = ops.WarehouseOps.kcorePeel(edges0, deg, 3)
            .groupBy("a").agg(count(lit(1)).as("deg"))
            .localCheckpoint(eager = true)
        }
      }
      deg.select(col("a").as("part"), col("deg").as("core_deg"))
        .orderBy("part")
    }
    def kcB(): DataFrame = kcVariant(fuse = false)
    def kcC(): DataFrame = kcVariant(fuse = true)

    def canon(df: DataFrame): Seq[Seq[Any]] =
      df.collect().map(_.toSeq).toSeq

    val a0 = canon(kcA())
    require(a0 == canon(kcB()), "q152 A/B diverge")
    require(a0 == canon(kcC()), "q152 A/C diverge")
    println(s"[kc] q152 A/B/C identical (${a0.size} rows)")

    def timed(label: String)(f: () => DataFrame): Double = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      val w = (System.nanoTime() - t0) / 1e9
      println(f"[kc] $label: $w%.3f s")
      w
    }
    (1 to 3).foreach { i =>
      timed(s"q152 A#$i")(kcA)
      timed(s"q152 B#$i")(kcB)
      timed(s"q152 C#$i")(kcC)
    }
    spark.stop()
  }
}
