package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for the named catalog queries to
  * plans/r16/<query>_<suffix>.txt — the round-16 plan evidence.
  *
  * Special names, beyond catalog substrings:
  *  - `copurchase_base` / `repeat_base`: the LAZY co-purchase /
  *    repeat-co-purchase base plans (the checkpointed consumers
  *    truncate them out of every returned frame, so the base fusion is
  *    only visible on the construction plan itself);
  *  - `rounds`: sets `graft.dump_round_plans` and runs q110/q275/q118
  *    once so the CC / labelprop / pagerank loops write ONE round's
  *    plan each from inside the loop (VERDICT r15 #1).
  *
  * Run: sbt "Test/runMain graft.ProbeR16Plans after q129,copurchase_base,rounds"
  */
object ProbeR16Plans {
  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("after")
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
    new java.io.File("plans/r16").mkdirs()
    def write(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"plans/r16/${name}_$suffix.txt"), txt)
      println(s"[plans] wrote $name ($suffix)")
    }
    if (only.contains("copurchase_base"))
      write("copurchase_base", ops.WarehouseOps.coPurchasePairsPlan(spark, dir))
    if (only.contains("repeat_base"))
      write("repeat_base", ops.WarehouseOps.repeatCoPurchasePairs(spark, dir))
    if (only.contains("rounds")) {
      spark.conf.set("graft.dump_round_plans", "plans/r16")
      Seq("q110_full_dedup", "q275_labelprop_settle", "q118_pagerank")
        .foreach { q =>
          SparkEntry.queries(q)(spark, dir).count()
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = true))
        }
      spark.conf.unset("graft.dump_round_plans")
      println("[plans] wrote cc_round / labelprop_round / pagerank_round")
    }
    val special = Set("copurchase_base", "repeat_base", "rounds")
    val subs = only.filterNot(special)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => subs.exists(n.contains) }
      .foreach { case (name, fn) =>
        try {
          write(name, fn(spark, dir))
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = true))
        } catch { case scala.util.control.NonFatal(e) =>
          println(s"[plans] $name FAILED: $e")
        }
      }
    spark.stop()
  }
}
