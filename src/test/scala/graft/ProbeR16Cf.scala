package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-16 probe: apply the fused single-exchange dedup layout
  * (ProbeR16CoP) to the remaining li-distinct consumers:
  *
  *  - q179 item-CF and q174 assoc rules: their private li frame is
  *    eagerly checkpointed and then self-joined on `o` — the
  *    checkpoint's LogicalRDD carries no partitioning, so the join
  *    re-exchanges BOTH sides. Fused: repartition(conf, o) + distinct,
  *    NO checkpoint — one exchange, reused by both join sides (the
  *    dedup aggregate re-runs per consumer in-stage, which is cheap;
  *    the scan feeds the exchange once).
  *  - q234 a-priori: its `li` feeds fi (groupBy p) AND liF (join on p)
  *    — BOTH key on p, so repartition(conf, p) + distinct serves the
  *    dedup, the frequent-item aggregate, and the liF join with zero
  *    further exchanges; the li checkpoint (a barrier + an unkeyed
  *    materialization) disappears. liF's checkpoint stays (it feeds
  *    the three o-keyed self-joins).
  *
  * Identity-checked, then A/B x3 alternating, noop sink.
  *
  * Run: sbt "Test/runMain graft.ProbeR16Cf"
  */
object ProbeR16Cf {
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

    def liFused(key: String): DataFrame =
      ops.PartitionedCheckpoint.repartitionByConf(
        ops.TestData.table(spark, dir, "lineitem")
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p")),
        col(key))
        .distinct()

    def cfA(): DataFrame = SparkEntry.queries("q179_item_cf")(spark, dir)
    def cfB(): DataFrame = {
      val li = liFused("o")
      val pairCnt = li.alias("a").join(li.alias("b"),
          col("a.o") === col("b.o") && col("a.p") < col("b.p"))
        .groupBy(col("a.p").as("u"), col("b.p").as("v"))
        .agg(count(lit(1)).as("pair_orders"))
        .where(col("pair_orders") >= 2)
      val both = pairCnt.unionByName(pairCnt.select(
        col("v").as("u"), col("u").as("v"), col("pair_orders")))
      val itemCnt = li.groupBy(col("p")).agg(count(lit(1)).as("cnt"))
      val scored = both
        .join(itemCnt.select(col("p").as("u"), col("cnt").as("cnt_u")), "u")
        .join(itemCnt.select(col("p").as("v"), col("cnt").as("cnt_v")), "v")
        .select(col("u").as("item"), col("v").as("neighbor"),
          col("pair_orders"),
          (col("pair_orders").cast("double") /
            (sqrt(col("cnt_u").cast("double")) *
              sqrt(col("cnt_v").cast("double")))).as("cosine"))
      scored.withColumn("rank", row_number().over(
          Window.partitionBy("item")
            .orderBy(col("cosine").desc, col("neighbor"))))
        .where(col("rank") <= 3)
        .select(col("item"), col("rank"), col("neighbor"),
          col("pair_orders"), col("cosine"))
        .orderBy("item", "rank")
    }

    def arA(): DataFrame = SparkEntry.queries("q174_assoc_rules")(spark, dir)
    def arB(): DataFrame = {
      val li = liFused("o")
      val pairCnt = li.alias("a").join(li.alias("b"),
          col("a.o") === col("b.o") && col("a.p") < col("b.p"))
        .groupBy(col("a.p").as("u"), col("b.p").as("v"))
        .agg(count(lit(1)).as("pair_orders"))
        .where(col("pair_orders") >= 2)
      val itemCnt = li.groupBy(col("p")).agg(count(lit(1)).as("item_orders"))
      val nOrders = li.select("o").distinct()
        .agg(count(lit(1)).as("n_orders"))
      val rules = pairCnt
        .join(itemCnt.select(col("p").as("u"), col("item_orders").as("cnt_u")), "u")
        .join(itemCnt.select(col("p").as("v"), col("item_orders").as("cnt_v")), "v")
        .crossJoin(broadcast(nOrders))
        .select(col("u"), col("v"), col("pair_orders"), col("cnt_u"),
          col("cnt_v"),
          (col("pair_orders").cast("double") / col("n_orders").cast("double"))
            .as("support"),
          (col("pair_orders").cast("double") / col("cnt_u").cast("double"))
            .as("conf_u_v"),
          (col("pair_orders").cast("double") / col("cnt_v").cast("double"))
            .as("conf_v_u"),
          ((col("pair_orders") * col("n_orders")).cast("double") /
            (col("cnt_u") * col("cnt_v")).cast("double")).as("lift"))
      rules.withColumn("rank", row_number().over(
          Window.orderBy(col("lift").desc, col("u"), col("v"))))
        .where(col("rank") <= 20)
        .select(col("rank"), col("u"), col("v"), col("pair_orders"),
          col("cnt_u"), col("cnt_v"), col("support"), col("conf_u_v"),
          col("conf_v_u"), col("lift"))
        .orderBy("rank")
    }

    def apA(): DataFrame =
      SparkEntry.queries("q234_frequent_triples")(spark, dir)
    def apB(): DataFrame = {
      val li = liFused("p")
      val fi = li.groupBy("p").agg(count(lit(1)).as("c"))
        .where(col("c") >= 2).select("p")
      val liF = li.join(fi, "p").select("o", "p")
        .localCheckpoint(eager = true)
      val fp = liF.alias("a").join(liF.alias("b"),
          col("a.o") === col("b.o") && col("a.p") < col("b.p"))
        .groupBy(col("a.p").as("u"), col("b.p").as("v"))
        .agg(count(lit(1)).as("c")).where(col("c") >= 2)
        .select("u", "v")
        .localCheckpoint(eager = true)
      val ab = liF.alias("a")
        .join(liF.alias("b"),
          col("a.o") === col("b.o") && col("a.p") < col("b.p"))
        .select(col("a.o").as("o"), col("a.p").as("p1"),
          col("b.p").as("p2"))
        .join(fp.select(col("u").as("p1"), col("v").as("p2")),
          Seq("p1", "p2"), "left_semi")
      val triples = ab.alias("ab")
        .join(liF.alias("c"),
          col("ab.o") === col("c.o") && col("ab.p2") < col("c.p"))
        .select(col("ab.p1").as("p1"), col("ab.p2").as("p2"),
          col("c.p").as("p3"))
        .join(fp.select(col("u").as("p1"), col("v").as("p3")),
          Seq("p1", "p3"), "left_semi")
        .join(fp.select(col("u").as("p2"), col("v").as("p3")),
          Seq("p2", "p3"), "left_semi")
      val nOrders = li.select("o").distinct()
        .agg(count(lit(1)).as("n_orders"))
      val tr = triples
        .groupBy("p1", "p2", "p3").agg(count(lit(1)).as("orders_cnt"))
        .where(col("orders_cnt") >= 2)
      tr.crossJoin(broadcast(nOrders))
        .withColumn("rank", row_number().over(Window.orderBy(
          col("orders_cnt").desc, col("p1"), col("p2"), col("p3"))))
        .where(col("rank") <= 20)
        .select(col("rank"), col("p1"), col("p2"), col("p3"),
          col("orders_cnt"),
          (col("orders_cnt").cast("double") /
            col("n_orders").cast("double")).as("support"))
        .orderBy("rank")
    }

    def canon(df: DataFrame): Seq[Seq[Any]] =
      df.collect().map(_.toSeq).toSeq

    require(canon(cfA()) == canon(cfB()), "q179 A/B diverge")
    println("[cf] q179 identical")
    require(canon(arA()) == canon(arB()), "q174 A/B diverge")
    println("[cf] q174 identical")
    require(canon(apA()) == canon(apB()), "q234 A/B diverge")
    println("[cf] q234 identical")

    def timed(label: String)(f: () => DataFrame): Double = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      val w = (System.nanoTime() - t0) / 1e9
      println(f"[cf] $label: $w%.3f s")
      w
    }
    (1 to 3).foreach { i =>
      timed(s"q179 A#$i")(cfA)
      timed(s"q179 B#$i")(cfB)
    }
    (1 to 3).foreach { i =>
      timed(s"q174 A#$i")(arA)
      timed(s"q174 B#$i")(arB)
    }
    (1 to 3).foreach { i =>
      timed(s"q234 A#$i")(apA)
      timed(s"q234 B#$i")(apB)
    }
    spark.stop()
  }
}
