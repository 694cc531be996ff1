package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot diagnostic for the q121 x8 growth anomaly surfaced by
  * GrowthCurves (wall 2.9x for 2x data from x4 to x8 while cpu_wall
  * FELL 6.9 -> 4.2 on a quiet box — engine-side, not host load).
  * Breaks the query into its stages at x4 and x8 replication and
  * times each with GC deltas, so the superlinear stage is named
  * instead of guessed. Requires /tmp/growth/x{4,8} from GrowthCurves.
  *
  * Run: sbt "Test/runMain graft.ProbeQ121Growth"
  */
object ProbeQ121Growth {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def gcMs(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(b.getCollectionTime, 0L)).sum
    }
    def clear(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      org.apache.spark.graft.BenchInternals.removeAllBroadcasts()
      System.gc()
    }
    def timed[A](label: String)(thunk: => A): A = {
      val g0 = gcMs(); val t0 = System.nanoTime()
      val a = thunk
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[q121probe] $label: $wall%.2f s (gc ${(gcMs() - g0) / 1000.0}%.2f s)")
      a
    }

    Seq("x4", "x8").foreach { x =>
      val dir = s"/tmp/growth/$x"
      println(s"[q121probe] === $x ===")
      clear()
      val c = ops.TestData.table(spark, dir, "customer")
        .select(col("c_custkey"), col("c_name"),
          col("c_nationkey"), col("c_mktsegment"))
      val variants = timed(s"$x variants checkpoint")(
        ops.ExtendedOps.deletionVariants(c, "c_name",
          Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment"))
          .localCheckpoint(eager = true))
      println(s"[q121probe] $x variant rows: " + timed(s"$x variants count")(
        variants.count()))
      val pairs = variants.as("a").join(variants.as("b"),
          col("a.vh") === col("b.vh") &&
            col("a.c_nationkey") === col("b.c_nationkey") &&
            col("a.c_mktsegment") === col("b.c_mktsegment") &&
            col("a.c_custkey") < col("b.c_custkey") &&
            graft.functions.LevWithin.levWithin(
              col("a.c_name"), col("b.c_name"), 2))
        .select(col("a.c_custkey").as("d1"), col("b.c_custkey").as("d2"))
        .distinct()
      val nPairs = timed(s"$x candidate join + distinct")(pairs.count())
      println(s"[q121probe] $x verified pairs: $nPairs")
      val pc = pairs.localCheckpoint(eager = true)
      val comp = ops.DedupOps.connectedComponents(pc)
      val nComp = timed(s"$x connected components")(comp.count())
      println(s"[q121probe] $x component rows: $nComp")
      timed(s"$x full q121")(
        SparkEntry.queries("q121_entity_resolution")(spark, dir).count())
      timed(s"$x full q121 run2")(
        SparkEntry.queries("q121_entity_resolution")(spark, dir).count())
    }
    spark.stop()
  }
}
