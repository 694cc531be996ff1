package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 probe: q129 triangle count — attack the remaining
  * structure around the (already degree-oriented, already
  * intersect-verified) core:
  *
  *  B = + deg CHECKPOINTED (it is recomputed from the pairs checkpoint
  *      in the final plan today — one extra 2E-row exchange), the
  *      oriented edge list LAZY (its orientation joins are broadcasts
  *      of the deg checkpoint, pure map work over the pairs checkpoint,
  *      so materializing it buys nothing but a barrier), and the top-20
  *      LIMIT applied BEFORE the deg join (the join is 1:1 on part —
  *      every triangle part is a graph node — so top-20-then-join is
  *      the same 20 rows, V-row join -> 20-row join).
  *  C = B but with the e checkpoint kept (isolates the lazy-e call).
  *
  * Identity-checked (full 20-row output) before timing; A/B/C
  * alternating x3, noop sink.
  *
  * Run: sbt "Test/runMain graft.ProbeR16Tri"
  */
object ProbeR16Tri {
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

    def triA(): DataFrame =
      SparkEntry.queries("q129_triangle_count")(spark, dir)

    def triVariant(ckptE: Boolean): DataFrame = {
      val pairs = ops.WarehouseOps.coPurchasePairs(spark, dir)
      val deg = pairs.select(col("u").as("n"))
        .unionAll(pairs.select(col("v").as("n")))
        .groupBy("n").agg(count(lit(1)).as("deg"))
        .localCheckpoint(eager = true)
      val e0 = pairs
        .join(ops.WarehouseOps.graphHint(
          deg.select(col("n").as("u"), col("deg").as("du"))), "u")
        .join(ops.WarehouseOps.graphHint(
          deg.select(col("n").as("v"), col("deg").as("dv"))), "v")
        .select(
          when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")),
            col("u")).otherwise(col("v")).as("src"),
          when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")),
            col("v")).otherwise(col("u")).as("dst"))
      val e = if (ckptE) e0.localCheckpoint(eager = true) else e0
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
        .orderBy(col("triangles").desc, col("part"))
        .limit(20)
        .join(ops.WarehouseOps.graphHint(
          deg.select(col("n").as("part"), col("deg"))), "part")
        .select(col("part"), col("triangles"), col("deg"))
        .orderBy(col("triangles").desc, col("part"))
    }
    def triB(): DataFrame = triVariant(ckptE = false)
    def triC(): DataFrame = triVariant(ckptE = true)

    def canon(df: DataFrame): Seq[Seq[Any]] =
      df.collect().map(_.toSeq).toSeq

    val a0 = canon(triA())
    require(a0 == canon(triB()), "q129 A/B diverge")
    require(a0 == canon(triC()), "q129 A/C diverge")
    println(s"[tri] q129 A/B/C identical (${a0.size} rows)")

    def timed(label: String)(f: () => DataFrame): Double = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      val w = (System.nanoTime() - t0) / 1e9
      println(f"[tri] $label: $w%.3f s")
      w
    }
    (1 to 3).foreach { i =>
      timed(s"q129 A#$i")(triA)
      timed(s"q129 B#$i")(triB)
      timed(s"q129 C#$i")(triC)
    }
    spark.stop()
  }
}
