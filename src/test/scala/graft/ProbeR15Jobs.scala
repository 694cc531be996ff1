package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Round-15 instrumentation: per-JOB wall breakdown of one invocation
  * of each named heavy query, plus the dead time between jobs (driver
  * planning / analysis / checkpoint bookkeeping). Separates
  * "few big parallel jobs — optimize compute" from "many small
  * sequential jobs — cut job count" from "gaps — cut plan complexity".
  *
  * Run: sbt "Test/runMain graft.ProbeR15Jobs q121,q64,q129"
  */
object ProbeR15Jobs {
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
    val names = args.headOption.map(_.split(",").toSeq)
      .getOrElse(Seq("q121", "q64"))

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.put(js.jobId, (js.time, -1L))
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val cur = jobs.get(je.jobId)
        if (cur != null) jobs.put(je.jobId, (cur._1, je.time))
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val catalog = SparkEntry.queries.toSeq.sortBy(_._1)
    names.foreach { sub =>
      catalog.filter(_._1.contains(sub)).foreach { case (name, fn) =>
        // warm twice (JIT/codegen), measure the third
        (1 to 2).foreach { _ =>
          fn(spark, dir).count()
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = true))
        }
        jobs.clear()
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        // listener bus is async; give it a moment to drain
        Thread.sleep(300)
        import scala.jdk.CollectionConverters._
        val js = jobs.asScala.toSeq.sortBy(_._2._1)
        val jobSum = js.map { case (_, (s, e)) => (e - s) / 1e3 }.sum
        println(f"[jobs] $name wall=$wall%.3f s, ${js.size} jobs, job-sum=$jobSum%.3f s, gap=${wall - jobSum}%.3f s")
        js.foreach { case (id, (s, e)) =>
          println(f"[jobs]   job $id%3d  ${(e - s) / 1e3}%7.3f s") }
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
      }
    }
    spark.stop()
  }
}
