package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-JVM A/B of the q152 peeling loop shapes: OLD (edges threaded
  * through a lazy nested semi-join chain, 2+4+6+8 semi layers) vs NEW
  * (flat: every round filters the one checkpointed e0 by the current
  * alive set, 8 semi layers). Identity-checked, then alternating x3.
  *
  * Run: sbt "Test/runMain graft.ProbeR15Kcore"
  */
object ProbeR15Kcore {
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

    def edges0(): DataFrame = {
      val pairs0 = ops.WarehouseOps.coPurchasePairs(spark, dir)
      pairs0.select(col("u").as("a"), col("v").as("b"))
        .unionAll(pairs0.select(col("v").as("a"), col("u").as("b")))
        .localCheckpoint(eager = true)
    }

    def oldLoop(): DataFrame = {
      var edges = edges0()
      var deg = edges.groupBy("a").agg(count(lit(1)).as("deg"))
        .localCheckpoint(eager = true)
      for (_ <- 1 to 4) {
        edges = ops.WarehouseOps.kcorePeel(edges, deg, 3)
        deg = edges.groupBy("a").agg(count(lit(1)).as("deg"))
          .localCheckpoint(eager = true)
      }
      deg.select(col("a").as("part"), col("deg").as("core_deg"))
        .orderBy("part")
    }

    def newLoop(): DataFrame = {
      val e0 = edges0()
      var deg = e0.groupBy("a").agg(count(lit(1)).as("deg"))
        .localCheckpoint(eager = true)
      for (_ <- 1 to 4) {
        deg = ops.WarehouseOps.kcorePeel(e0, deg, 3)
          .groupBy("a").agg(count(lit(1)).as("deg"))
          .localCheckpoint(eager = true)
      }
      deg.select(col("a").as("part"), col("deg").as("core_deg"))
        .orderBy("part")
    }

    def canon(df: DataFrame): Seq[Seq[Any]] = df.collect().map(_.toSeq).toSeq
    require(canon(oldLoop()) == canon(newLoop()), "kcore A/B diverge")
    println("[kcore] identical outputs")

    def timed(label: String)(f: () => DataFrame): Double = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
      val t0 = System.nanoTime()
      f().count()
      val w = (System.nanoTime() - t0) / 1e9
      println(f"[kcore] $label: $w%.3f s")
      w
    }
    (1 to 3).foreach { i =>
      timed(s"old#$i")(oldLoop)
      timed(s"new#$i")(newLoop)
    }
    spark.stop()
  }
}
