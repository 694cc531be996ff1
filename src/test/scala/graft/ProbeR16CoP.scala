package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 probe: the co-purchase base stage pays TWO full exchanges
  * of the (o, p) frame — Exchange(hash(o,p)) for the `.distinct()` and
  * Exchange(hash(o)) for the order self-join. HashPartitioning(o)
  * satisfies ClusteredDistribution(o, p) (same o => same partition), so
  * ONE repartition on `o` can serve both: repartition(n, o) ->
  * groupBy(o, p) dedup (no exchange) -> self-join on o (no exchange,
  * both sides carry hash(o)). This REPLACES the distinct's exchange
  * rather than adding one on top, which is why it is not the r15
  * ProbeR15Par coB variant (distinct + an EXTRA repartition; 0/3).
  *
  * A/B for both coPurchasePairsPlan (q129/q152/q158/q267) and
  * repeatCoPurchasePairs (q268/q275); identity-checked first.
  *
  * Run: sbt "Test/runMain graft.ProbeR16CoP"
  */
object ProbeR16CoP {
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

    def liDedup(): DataFrame =
      ops.TestData.table(spark, dir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .repartition(n, col("o"))
        // distinct = Aggregate(o, p): ClusteredDistribution(o, p) is
        // satisfied by the hash(o) layout, so NO second exchange.
        .distinct()

    def coA(): DataFrame = ops.WarehouseOps.coPurchasePairsPlan(spark, dir)
    def coB(): DataFrame = {
      val li = liDedup()
      li.alias("a").hint("shuffle_hash").join(li.alias("b"),
          col("a.o") === col("b.o") && col("a.p") < col("b.p"))
        .select(col("a.p").as("u"), col("b.p").as("v"))
        .distinct()
    }

    def rpA(): DataFrame = ops.WarehouseOps.repeatCoPurchasePairs(spark, dir)
    def rpB(): DataFrame = {
      val li = liDedup()
      li.alias("x").hint("shuffle_hash").join(li.alias("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .groupBy(col("x.p").as("u"), col("y.p").as("v"))
        .agg(count(lit(1)).as("w"))
        .where(col("w") >= 2)
        .select("u", "v")
    }

    def canon(df: DataFrame): Seq[Seq[Any]] =
      df.collect().map(_.toSeq).toSeq.sortBy(_.mkString(","))

    require(canon(coA()) == canon(coB()), "coPurchase A/B diverge")
    println("[cop] coPurchase identical")
    require(canon(rpA()) == canon(rpB()), "repeat A/B diverge")
    println("[cop] repeatCoPurchase identical")

    def timed(label: String)(f: () => DataFrame): Double = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      val w = (System.nanoTime() - t0) / 1e9
      println(f"[cop] $label: $w%.3f s")
      w
    }
    (1 to 3).foreach { i =>
      timed(s"copurchase A#$i")(coA)
      timed(s"copurchase B#$i")(coB)
    }
    (1 to 3).foreach { i =>
      timed(s"repeat A#$i")(rpA)
      timed(s"repeat B#$i")(rpB)
    }
    // plan evidence: exchanges in each
    Seq("coA" -> coA(), "coB" -> coB(), "rpA" -> rpA(), "rpB" -> rpB())
      .foreach { case (l, df) =>
        val p = df.queryExecution.executedPlan.toString
        val ex = "Exchange".r.findAllIn(p).length
        println(s"[cop] $l initial-plan Exchange count: $ex")
      }
    spark.stop()
  }
}
