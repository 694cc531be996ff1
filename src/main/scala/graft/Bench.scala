package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every catalog query against
  * SPARK_GRAFT_SF_DIR (default sf0.1) and prints one JSON line with
  * total + per-query seconds. Each query is fully materialized via
  * count() after a cache-free plan.
  *
  * Warm-up: every query runs once at the smallest scale factor first
  * (sf0.001 when present, else the bench dir). The generated code for a
  * plan is identical across scale factors, so this drives Janino
  * compilation AND HotSpot JIT of each fused stage on tiny data; the
  * timed sf pass then measures data-proportional throughput — the
  * number that extrapolates to a long-lived cluster — rather than
  * one-time JVM warm-up (measured ~11 s of the CSV-ETL query's first
  * run on 32 cores was JIT, 2.8 s was work).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val warmDir = {
      val d = new java.io.File("/root/testdata/sf0.001")
      if (d.isDirectory) d.getPath else sfDir
    }
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Warm-up: JVM/codegen/parquet-footer costs out of the measurements.
    // NonFatal only: after an OOM/LinkageError the JVM's state is
    // unreliable and every later "best of 2" would be garbage — abort.
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
      try fn(spark, warmDir).count()
      catch { case scala.util.control.NonFatal(_) => () }
    }

    // Best of 2 timed runs per query (fresh DataFrame each run, so no
    // AQE stage reuse): the box runs other tenants and single-run totals
    // swing 2-4x with external load; the min estimates engine cost.
    // Drop leftover cached/checkpointed blocks between queries so one
    // query's state (e.g. the clustering loop's localCheckpoints) can't
    // pressure a later query's GC.
    def clearState(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to 2).map { _ =>
        clearState()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { // failure marker, never a time; fatal errors propagate
          case scala.util.control.NonFatal(_) => -1.0
        }
      }
      // min over SUCCESSFUL runs; a query that failed both runs reports
      // -1 so breakage can't masquerade as a speedup.
      name -> times.filter(_ >= 0).minOption.getOrElse(-1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
