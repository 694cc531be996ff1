package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 probe: is the shared shingle/co-purchase self-join
  * parallelism-starved under AQE? The join's INPUT is a few MB (AQE
  * coalesces reducers by input bytes), but its OUTPUT explodes df^2
  * per key, so the exploding probe+aggregate work can land on 1-4
  * tasks while 28 cores idle. A/B: shipped shape vs an explicit
  * REPARTITION_BY_NUM on the join key at spark.sql.shuffle.partitions
  * (cluster-scaled conf, never a local constant; REPARTITION_BY_NUM is
  * exempt from AQE coalescing by contract).
  *
  * Run: sbt "Test/runMain graft.ProbeR15Par"
  */
object ProbeR15Par {
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
    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt

    val docs = ops.TestData.table(spark, dir, "documents")

    // A: shipped jaccardPairs; B: same but the checkpointed shingle
    // frame is REPARTITION_BY_NUM'd on the join key first.
    def pairsA(): DataFrame = ops.DedupOps.jaccardPairs(docs)
    def pairsB(): DataFrame = {
      val sh = ops.DedupOps.hashedShingles(docs)
        .localCheckpoint(eager = true)
      val shP = sh.repartition(n, col("s"))
      val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val p = shP.as("a").join(shP.as("b"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("inter"))
      p.join(cnt.as("ca"), col("d1") === col("ca.doc_id"))
        .join(cnt.as("cb"), col("d2") === col("cb.doc_id"))
        .select(col("d1"), col("d2"), col("inter"),
          (col("inter") * lit(1.0) /
            (col("ca.n") + col("cb.n") - col("inter"))).as("jaccard"))
    }

    // co-purchase: shipped vs repartitioned-on-o self-join.
    def coA(): DataFrame = ops.WarehouseOps.coPurchasePairsPlan(spark, dir)
    def coB(): DataFrame = {
      val li = ops.TestData.table(spark, dir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
        .repartition(n, col("o"))
      li.alias("a").hint("shuffle_hash").join(li.alias("b"),
          col("a.o") === col("b.o") && col("a.p") < col("b.p"))
        .select(col("a.p").as("u"), col("b.p").as("v"))
        .distinct()
    }

    def canon(df: DataFrame): Seq[Seq[Any]] =
      df.collect().map(_.toSeq).toSeq.sortBy(_.mkString(","))

    require(canon(pairsA()) == canon(pairsB()), "pairs A/B diverge")
    println("[par] jaccardPairs identical")
    require(canon(coA()) == canon(coB()), "copurchase A/B diverge")
    println("[par] coPurchase identical")

    def timed(label: String)(f: () => DataFrame): Double = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      val w = (System.nanoTime() - t0) / 1e9
      println(f"[par] $label: $w%.3f s")
      w
    }
    (1 to 3).foreach { i =>
      timed(s"jaccard A#$i")(pairsA)
      timed(s"jaccard B#$i")(pairsB)
    }
    (1 to 3).foreach { i =>
      timed(s"copurchase A#$i")(coA)
      timed(s"copurchase B#$i")(coB)
    }
    spark.stop()
  }
}
