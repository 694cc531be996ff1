package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftbridge.Bridge

/** Discovery probe for the global-window grain lint (VERDICT r14 #4):
  * list every catalog query the new lint flags at sf0.001, with the
  * flagged window's MEASURED input rows at sf0.001 and sf0.01 — the
  * numbers the allowlist bounds must carry.
  *
  * Run: sbt "Test/runMain graft.ProbeGlobalWindow"
  */
object ProbeGlobalWindow {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val bounded = ScaleLint.boundedDomainCols(spark)
    val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfs.head).queryExecution.optimizedPlan
        val hits = ScaleLint.globalWindowFlagged(name, plan, bounded)
        if (hits.nonEmpty) {
          val counts = sfs.map { sf =>
            val p = fn(spark, sf).queryExecution.optimizedPlan
            ScaleLint.globalWindowFlagged(name, p, bounded).map { case (_, w) =>
              Bridge.ofRows(spark, w.child).count()
            }
          }
          println(s"[gw] $name sigs=${hits.map(_._1).mkString(",")} " +
            s"inputRows@sf0.001=${counts.head.mkString(",")} " +
            s"@sf0.01=${counts(1).mkString(",")}")
        }
      } catch {
        case e: Throwable => println(s"[gw] $name ERROR ${e.getMessage}")
      }
    }
    println("[gw] done")
    spark.stop()
  }
}
