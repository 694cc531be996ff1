package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 probe: q121's candidate stage (deletion-variant self-join).
  * VERDICT r16 asked for (a) length-bucketed blocking — REJECTED from
  * the data alone: every c_name at every SF is exactly 18 chars
  * (Customer#%09d), so a |len(a)-len(b)| <= 2 band admits 100% of
  * candidates and the predicate is pure overhead; and (b) a BROADCAST
  * of the deletion dictionary — probed here: B broadcasts one side of
  * the variant self-join (the frame is ~2.5M rows / tens of MB at
  * sf0.1), removing both shuffle exchanges of the candidate join at
  * the cost of building one in-memory hash relation.
  *
  * Identity-checked on the candidate pair set, then A/B x3, noop sink.
  *
  * Run: sbt "Test/runMain graft.ProbeR16Ent"
  */
object ProbeR16Ent {
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

    def customers(): DataFrame =
      ops.TestData.table(spark, dir, "customer")
        .select(col("c_custkey"), col("c_name"),
          col("c_nationkey"), col("c_mktsegment"))

    def candStage(bcast: Boolean): DataFrame = {
      val variants = ops.ExtendedOps.deletionVariants(customers(), "c_name",
          Seq("c_custkey", "c_nationkey", "c_mktsegment"))
        .localCheckpoint(eager = true)
      val b0 = variants.as("b")
      val lhs = variants.as("a")
      val joined =
        if (bcast) lhs.join(broadcast(b0),
          col("a.vh") === col("b.vh") &&
            col("a.c_nationkey") === col("b.c_nationkey") &&
            col("a.c_mktsegment") === col("b.c_mktsegment") &&
            col("a.c_custkey") < col("b.c_custkey"))
        else lhs.hint("shuffle_hash").join(b0,
          col("a.vh") === col("b.vh") &&
            col("a.c_nationkey") === col("b.c_nationkey") &&
            col("a.c_mktsegment") === col("b.c_mktsegment") &&
            col("a.c_custkey") < col("b.c_custkey"))
      joined
        .select(col("a.c_custkey").as("d1"), col("b.c_custkey").as("d2"))
        .distinct()
    }

    def canon(df: DataFrame): Seq[Seq[Any]] =
      df.collect().map(_.toSeq).toSeq.sortBy(_.mkString(","))

    require(canon(candStage(false)) == canon(candStage(true)),
      "candidate sets diverge")
    println("[ent] candidate sets identical")

    def timed(label: String)(f: () => DataFrame): Double = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      org.apache.spark.graft.BenchInternals.removeAllBroadcasts()
      System.gc()
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      val w = (System.nanoTime() - t0) / 1e9
      println(f"[ent] $label: $w%.3f s")
      w
    }
    (1 to 3).foreach { i =>
      timed(s"cand A(shj)#$i")(() => candStage(false))
      timed(s"cand B(bcast)#$i")(() => candStage(true))
    }
    spark.stop()
  }
}
