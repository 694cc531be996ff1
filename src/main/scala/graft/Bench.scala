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

    // Timed runs with a LOAD GUARD (round-3 lesson: a co-tenant-loaded
    // box published a bench artifact 2-27x off the engine's real cost,
    // with nothing in the JSON to tell a regression from a busy
    // machine). Three structural fixes:
    //  1. /proc/loadavg is recorded at start and end of the timed pass;
    //  2. every query records cpu-vs-wall for its reported run — our own
    //     process CPU over wall time. On an idle box a parallel query
    //     runs many CPU-seconds per wall-second; when co-tenants steal
    //     cores, wall inflates while our CPU doesn't, so a LOW ratio on
    //     a query that should parallelize flags an untrustworthy number
    //     in the artifact itself;
    //  3. a query whose two samples diverge >2x re-runs (up to 2 extra
    //     samples) — transient load spikes get re-measured instead of
    //     published.
    // Fresh DataFrame each run (no AQE stage reuse); leftover
    // cached/checkpointed blocks dropped between queries so one query's
    // state can't pressure a later query's GC.
    def clearState(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
      // Settle the heap between queries: without this, one query's
      // garbage is collected DURING the next query's timed window and
      // books its GC storm onto an innocent timing.
      System.gc()
    }
    def loadavg1m(): Double =
      try scala.io.Source.fromFile("/proc/loadavg").getLines()
        .next().split(" ")(0).toDouble
      catch { case scala.util.control.NonFatal(_) => -1.0 }
    val osBean = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean match {
      case b: com.sun.management.OperatingSystemMXBean => Some(b)
      case _ => None
    }
    def procCpuNanos(): Long = osBean.map(_.getProcessCpuTime).getOrElse(0L)
    // Cumulative stop-the-world GC milliseconds: a query whose reported
    // run spent a big fraction of wall in GC is flagged by the artifact
    // itself (GC threads inflate cpu_wall, so the two together separate
    // "parallel work" from "heap thrash").
    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(b.getCollectionTime, 0L)).sum
    }

    // Idle-box gate (round-4 lesson: two rounds published floors off a
    // box whose loadavg climbed to ~6 mid-run): wait for the 1-minute
    // loadavg to drop below 2 before the timed pass, up to 10 minutes,
    // then proceed regardless — the artifact records how long we waited
    // and the start/end loadavg, so a still-loaded run is self-flagging.
    var loadWaitSec = 0
    while (loadavg1m() >= 2.0 && loadWaitSec < 600) {
      Thread.sleep(15000)
      loadWaitSec += 15
    }

    val loadStart = loadavg1m()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // (wall secs, cpu/wall, gc/wall); wall = -1 marks a failed run.
      def sample(): (Double, Double, Double) = {
        clearState()
        val g0 = gcMillis()
        val c0 = procCpuNanos()
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          val wall = (System.nanoTime() - t0) / 1e9
          val cpu = (procCpuNanos() - c0) / 1e9
          val gc = (gcMillis() - g0) / 1e3
          (wall, if (wall > 0) cpu / wall else 0.0,
            if (wall > 0) gc / wall else 0.0)
        } catch { // failure marker, never a time; fatal errors propagate
          case scala.util.control.NonFatal(_) => (-1.0, 0.0, 0.0)
        }
      }
      var samples = List(sample(), sample())
      def ok = samples.map(_._1).filter(_ >= 0).sorted
      // Divergent = the two FASTEST successful samples disagree >2x; a
      // load-poisoned outlier then triggers a re-run, but once two fresh
      // samples agree the loop stops (comparing global max/min instead
      // would burn the whole retry budget on every outlier, since the
      // poisoned sample never leaves the list).
      var retries = 0
      def divergent = {
        val s = ok
        s.size >= 2 && s(1) / math.max(s(0), 1e-9) > 2.0
      }
      while (retries < 2 && divergent) {
        samples ::= sample()
        retries += 1
      }
      val best = samples.filter(_._1 >= 0).sortBy(_._1).headOption
      // min over SUCCESSFUL runs; a query that failed every run reports
      // -1 so breakage can't masquerade as a speedup.
      (name, best.map(_._1).getOrElse(-1.0), best.map(_._2).getOrElse(0.0),
        best.map(_._3).getOrElse(0.0), samples.count(_._1 >= 0))
    }
    val loadEnd = loadavg1m()
    val qs = results.map { case (k, v, _, _, _) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val cw = results.map { case (k, _, r, _, _) => "\"" + k + f"\":$r%.2f" }
      .mkString("{", ",", "}")
    val gw = results.map { case (k, _, _, g, _) => "\"" + k + f"\":$g%.2f" }
      .mkString("{", ",", "}")
    val runs = results.map { case (k, _, _, _, n) => "\"" + k + s"""":$n""" }
      .mkString("{", ",", "}")
    val total = results.map { case (_, v, _, _, _) => v }.sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","loadavg_start":$loadStart%.2f,"loadavg_end":$loadEnd%.2f,"load_wait_sec":$loadWaitSec,"cpu_wall":$cw,"gc_wall":$gw,"runs":$runs}""")
    // Tail-proof summary (round-4 lesson: the driver's tail-capture
    // window kept only the END of the full line above, publishing
    // `"parsed": null`). This second line is SHORT — total, slowest 10,
    // load context, worst gc fraction — so any bounded tail window
    // still contains one complete, parseable JSON object.
    val slow10 = results.sortBy(-_._2).take(10)
      .map { case (k, v, _, _, _) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val maxGc = results.map(_._4).foldLeft(0.0)(math.max)
    println(f"""{"metric":"summary","value":$total%.3f,"unit":"sec","n_queries":${results.size},"slowest":$slow10,"sf":"$sfDir","loadavg_start":$loadStart%.2f,"loadavg_end":$loadEnd%.2f,"load_wait_sec":$loadWaitSec,"max_gc_wall":$maxGc%.2f}""")
    spark.stop()
  }
}
