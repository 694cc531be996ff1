package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for the named catalog queries to
  * plans/r15/<query>_<suffix>.txt — the round-15 optimization
  * deliverable (before/after plan evidence).
  *
  * Run: sbt "Test/runMain graft.ProbeR15Plans before q121,q64"
  */
object ProbeR15Plans {
  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("before")
    val only = args.lift(1).map(_.split(",").toSeq).getOrElse(Seq())
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
    new java.io.File("plans/r15").mkdirs()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only.exists(n.contains) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, dir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"plans/r15/${name}_$suffix.txt"), txt)
          println(s"[plans] wrote $name ($suffix)")
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = true))
        } catch { case scala.util.control.NonFatal(e) =>
          println(s"[plans] $name FAILED: $e")
        }
      }
    spark.stop()
  }
}
