package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 probe: q158 neighbor similarity currently intersects the
  * FULL (unoriented) adjacency arrays per edge — Σ_v deg(v)^2 array
  * touches (~340M at sf0.1, avg deg 120). But |N(u) ∩ N(v)| for an
  * edge {u,v} IS the number of triangles on that edge, and the
  * degree-ORIENTED enumeration (q129's core) lists each triangle once
  * with Σ out-deg^2 touches (~143M, avg out-deg 60, the classic
  * O(E^1.5) bound). B therefore: enumerate oriented triangles, explode
  * each into its 3 undirected edges, count per edge = common; degrees
  * come from the same deg frame; `common >= 1` is implicit (edges
  * without triangles produce no row, exactly the rows A's filter
  * drops).
  *
  * Identity-checked on the full pre-limit frame, then A/B x3 with the
  * noop sink on the real top-20 query.
  *
  * Run: sbt "Test/runMain graft.ProbeR16Nbr"
  */
object ProbeR16Nbr {
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

    def nbrA(): DataFrame =
      SparkEntry.queries("q158_neighbor_similarity")(spark, dir)

    def nbrBFull(): DataFrame = {
      val pairs = ops.WarehouseOps.coPurchasePairs(spark, dir)
      val deg = pairs.select(col("u").as("n"))
        .unionAll(pairs.select(col("v").as("n")))
        .groupBy("n").agg(count(lit(1)).as("deg"))
        .localCheckpoint(eager = true)
      val e = pairs
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
      val common = tri.select(explode(array(
          struct(least(col("ta"), col("tb")).as("u"),
            greatest(col("ta"), col("tb")).as("v")),
          struct(least(col("ta"), col("tc")).as("u"),
            greatest(col("ta"), col("tc")).as("v")),
          struct(least(col("tb"), col("tc")).as("u"),
            greatest(col("tb"), col("tc")).as("v")))).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
        .groupBy("u", "v").agg(count(lit(1)).as("common"))
      common
        .join(ops.WarehouseOps.graphHint(
          deg.select(col("n").as("u"), col("deg").as("du"))), "u")
        .join(ops.WarehouseOps.graphHint(
          deg.select(col("n").as("v"), col("deg").as("dv"))), "v")
        .where(col("du") >= 3 && col("dv") >= 3)
        .select(col("u"), col("v"), col("du"), col("dv"), col("common"))
        .withColumn("jaccard_bps",
          expr("common * 10000 div (du + dv - common)"))
    }
    def nbrB(): DataFrame =
      nbrBFull()
        .orderBy(col("jaccard_bps").desc, col("u"), col("v"))
        .limit(20)
        .select("u", "v", "du", "dv", "common", "jaccard_bps")
        .orderBy(col("jaccard_bps").desc, col("u"), col("v"))

    // identity on the FULL pre-limit frame, not just the top 20: A's
    // pre-limit frame (common >= 1 rows with deg floor) must equal B's.
    def aFull(): DataFrame = {
      val pairs = ops.WarehouseOps.coPurchasePairs(spark, dir)
      val e = pairs.select(col("u").as("a"), col("v").as("b"))
        .unionAll(pairs.select(col("v").as("a"), col("u").as("b")))
      val adj = e.groupBy(col("a"))
        .agg(sort_array(collect_list(col("b"))).as("nbrs"),
          count(lit(1)).as("deg"))
        .localCheckpoint(eager = true)
      pairs
        .join(ops.WarehouseOps.graphHint(adj.select(col("a").as("ju"),
          col("nbrs").as("nu"), col("deg").as("du"))), col("u") === col("ju"))
        .join(ops.WarehouseOps.graphHint(adj.select(col("a").as("jv"),
          col("nbrs").as("nv"), col("deg").as("dv"))), col("v") === col("jv"))
        .where(col("du") >= 3 && col("dv") >= 3)
        .select(col("u"), col("v"), col("du"), col("dv"),
          graft.functions.SortedIntersect
            .interCountBig(spark, col("nu"), col("nv")).as("common"))
        .where(col("common") >= 1)
        .withColumn("jaccard_bps",
          expr("common * 10000 div (du + dv - common)"))
    }

    def canon(df: DataFrame): Seq[Seq[Any]] =
      df.collect().map(_.toSeq).toSeq.sortBy(_.mkString(","))

    require(canon(aFull()) == canon(nbrBFull()), "q158 full frames diverge")
    println("[nbr] q158 full pre-limit frames identical")
    require(nbrA().collect().map(_.toSeq).toSeq ==
      nbrB().collect().map(_.toSeq).toSeq, "q158 top-20 diverge")
    println("[nbr] q158 top-20 identical")

    def timed(label: String)(f: () => DataFrame): Double = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      val w = (System.nanoTime() - t0) / 1e9
      println(f"[nbr] $label: $w%.3f s")
      w
    }
    (1 to 3).foreach { i =>
      timed(s"q158 A#$i")(nbrA)
      timed(s"q158 B#$i")(nbrB)
    }
    spark.stop()
  }
}
