package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 probe: pageRank round shape — shipped (contrib join ->
  * groupBy -> deg join-back per round) vs union-formulated (contrib
  * messages UNION per-vertex deg rows -> ONE aggregate carrying both
  * the rank sum and the degree), the same message-aggregate rewrite
  * adopted for connectedComponents/labelPropSettle. Every vertex of
  * the symmetric graph has deg >= 1 and receives >= 1 contribution,
  * so the row sets are identical by construction; checked anyway.
  *
  * Run: sbt "Test/runMain graft.ProbeR15PR"
  */
object ProbeR15PR {

  private def pageRankUnion(pairs: DataFrame, iters: Int): DataFrame = {
    val scale = 1000000000000L
    val edges = pairs.toDF("d1", "d2").unionByName(
      pairs.toDF("d2", "d1").select(col("d1"), col("d2")))
      .toDF("src", "dst")
      .repartition(col("src"))
      .localCheckpoint(eager = true)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      .localCheckpoint(eager = true)
    val n = deg.count()
    require(n > 0, "pagerank on an empty graph")
    val base = 15L * scale / (100L * n)
    var ranks = deg.select(col("src").as("v"), lit(scale / n).as("r"),
      col("deg"))
    for (_ <- 1 to iters) {
      val msgs = edges.join(ranks, edges("src") === ranks("v"))
        .select(col("dst").as("v"), expr("r div deg").as("c"),
          lit(null).cast("long").as("dg"))
        .unionByName(deg.select(col("src").as("v"),
          lit(null).cast("long").as("c"), col("deg").as("dg")))
      ranks = msgs.groupBy("v")
        .agg(sum("c").as("m"), max("dg").as("deg"))
        .select(col("v"), (lit(base) + expr("(85 * m) div 100")).as("r"),
          col("deg"))
        .localCheckpoint(eager = true)
    }
    ranks.select(col("v").as("doc_id"), col("deg"), col("r").as("rank_fp"))
  }

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

    val jp = ops.DedupOps.jaccardPairs(
        ops.TestData.table(spark, dir, "documents"))
      .where(col("jaccard") >= 0.5).select("d1", "d2")
      .localCheckpoint(eager = true)

    def canon(df: DataFrame): Seq[Seq[Any]] =
      df.collect().map(_.toSeq).toSeq.sortBy(_.mkString(","))
    require(canon(ops.DedupOps.pageRank(jp, 3)) ==
      canon(pageRankUnion(jp, 3)), "pagerank A/B diverge")
    println("[pr] identical")

    def timed(label: String)(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      val out = f()
      out.count()
      val w = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graftbridge.Bridge.releaseCheckpoints(out)
      println(f"[pr] $label: $w%.3f s")
      w
    }
    (1 to 3).foreach { i =>
      timed(s"A#$i")(() => ops.DedupOps.pageRank(jp, 3))
      timed(s"B#$i")(() => pageRankUnion(jp, 3))
    }
    spark.stop()
  }
}
