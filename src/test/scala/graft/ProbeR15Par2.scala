package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 parallelism probe #2: three more stages whose INPUT is
  * small (so AQE coalesces, or a checkpoint inherits few partitions)
  * but whose WORK explodes downstream of it:
  *   - q121's deletion-variant self-join + Levenshtein verify
  *   - q129's edge->adjacency-intersect stage (e checkpoint feeds a
  *     broadcast join + per-row sorted-intersect over neighbor arrays)
  *   - q158's pair->adjacency-intersect stage
  * A/B: shipped vs REPARTITION_BY_NUM at spark.sql.shuffle.partitions
  * on the frame feeding the exploding stage.
  *
  * Run: sbt "Test/runMain graft.ProbeR15Par2"
  */
object ProbeR15Par2 {
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

    // --- q121 candidate stage (through the Levenshtein verify) ---
    def q121Pairs(rep: Boolean): DataFrame = {
      val c = ops.TestData.table(spark, dir, "customer")
        .select(col("c_custkey"), col("c_name"),
          col("c_nationkey"), col("c_mktsegment"))
      val v0 = ops.ExtendedOps.deletionVariants(c, "c_name",
          Seq("c_custkey", "c_nationkey", "c_mktsegment"))
        .localCheckpoint(eager = true)
      val variants = if (rep) v0.repartition(n, col("vh")) else v0
      val cand = variants.as("a").hint("shuffle_hash")
        .join(variants.as("b"),
          col("a.vh") === col("b.vh") &&
            col("a.c_nationkey") === col("b.c_nationkey") &&
            col("a.c_mktsegment") === col("b.c_mktsegment") &&
            col("a.c_custkey") < col("b.c_custkey"))
        .select(col("a.c_custkey").as("d1"), col("b.c_custkey").as("d2"))
        .distinct()
      val names = c.select(col("c_custkey"), col("c_name"))
      cand
        .join(names.select(col("c_custkey").as("d1"), col("c_name").as("n1")), "d1")
        .join(names.select(col("c_custkey").as("d2"), col("c_name").as("n2")), "d2")
        .where(graft.functions.LevWithin.levWithin(col("n1"), col("n2"), 2))
        .select(col("d1"), col("d2"))
    }

    // --- q129 triangle body, parameterized on the e-checkpoint layout ---
    def q129Tri(rep: Boolean): DataFrame = {
      val pairs = ops.WarehouseOps.coPurchasePairs(spark, dir)
      val deg = pairs.select(col("u").as("n"))
        .unionAll(pairs.select(col("v").as("n")))
        .groupBy("n").agg(count(lit(1)).as("deg"))
      val e0 = pairs
        .join(deg.select(col("n").as("u"), col("deg").as("du")), "u")
        .join(deg.select(col("n").as("v"), col("deg").as("dv")), "v")
        .select(
          when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")),
            col("u")).otherwise(col("v")).as("src"),
          when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")),
            col("v")).otherwise(col("u")).as("dst"))
      val e = (if (rep) e0.repartition(n, col("src"), col("dst")) else e0)
        .localCheckpoint(eager = true)
      val adj = e.groupBy(col("src"))
        .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
        .localCheckpoint(eager = true)
      val tri = e
        .join(ops.WarehouseOps.graphHint(
          adj.select(col("src").as("ju"), col("nbrs").as("nu"))),
          col("src") === col("ju"))
        .join(ops.WarehouseOps.graphHint(
          adj.select(col("src").as("jv"), col("nbrs").as("nv"))),
          col("dst") === col("jv"))
        .select(col("src").as("ta"), col("dst").as("tb"),
          explode(graft.functions.SortedIntersect
            .interArray(spark, col("nu"), col("nv"))).as("tc"))
      tri.select(explode(array(col("ta"), col("tb"), col("tc"))).as("part"))
        .groupBy("part").agg(count(lit(1)).as("triangles"))
        .join(deg.select(col("n").as("part"), col("deg")), "part")
        .orderBy(col("triangles").desc, col("part"))
        .limit(20)
        .select(col("part"), col("triangles"), col("deg"))
        .orderBy(col("triangles").desc, col("part"))
    }

    def canon(df: DataFrame): Seq[Seq[Any]] =
      df.collect().map(_.toSeq).toSeq.sortBy(_.mkString(","))

    require(canon(q121Pairs(false)) == canon(q121Pairs(true)),
      "q121 A/B diverge")
    println("[par2] q121 pairs identical")
    require(canon(q129Tri(false)) == canon(q129Tri(true)),
      "q129 A/B diverge")
    println("[par2] q129 tri identical")

    def timed(label: String)(f: () => DataFrame): Double = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      val w = (System.nanoTime() - t0) / 1e9
      println(f"[par2] $label: $w%.3f s")
      w
    }
    (1 to 3).foreach { i =>
      timed(s"q121 A#$i")(() => q121Pairs(false))
      timed(s"q121 B#$i")(() => q121Pairs(true))
    }
    (1 to 3).foreach { i =>
      timed(s"q129 A#$i")(() => q129Tri(false))
      timed(s"q129 B#$i")(() => q129Tri(true))
    }
    spark.stop()
  }
}
