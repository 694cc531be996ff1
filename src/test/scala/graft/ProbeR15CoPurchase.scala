package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 probe: co-purchase pair generation — self-join vs
  * basket-array generate. The shipped shape self-joins the distinct
  * (order, part) frame on the order key (shuffle_hash). The candidate
  * replaces the join with ONE groupBy(order) -> sorted part array ->
  * in-row pair Generate (arrays are <= order width, pairs emit
  * directly inside the stage): one exchange + no hash relation, and
  * the sorted array gives u < v for free.
  *
  * Run: sbt "Test/runMain graft.ProbeR15CoPurchase"
  */
object ProbeR15CoPurchase {
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

    def li() = ops.TestData.table(spark, dir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()

    // A: shipped (self-join + distinct)
    def coA(): DataFrame = ops.WarehouseOps.coPurchasePairsPlan(spark, dir)

    // B: basket-array generate + distinct
    def coB(): DataFrame =
      li().groupBy("o").agg(sort_array(collect_list(col("p"))).as("ps"))
        .where(size(col("ps")) >= 2)
        .select(explode(expr(
          "flatten(transform(sequence(1, size(ps) - 1), " +
            "i -> transform(slice(ps, i + 1, size(ps) - i), " +
            "x -> struct(element_at(ps, i) AS u, x AS v))))")).as("pr"))
        .select(col("pr.u").as("u"), col("pr.v").as("v"))
        .distinct()

    // repeat variant: weight >= 2
    def rpA(): DataFrame = ops.WarehouseOps.repeatCoPurchasePairs(spark, dir)
    def rpB(): DataFrame =
      li().groupBy("o").agg(sort_array(collect_list(col("p"))).as("ps"))
        .where(size(col("ps")) >= 2)
        .select(explode(expr(
          "flatten(transform(sequence(1, size(ps) - 1), " +
            "i -> transform(slice(ps, i + 1, size(ps) - i), " +
            "x -> struct(element_at(ps, i) AS u, x AS v))))")).as("pr"))
        .groupBy(col("pr.u").as("u"), col("pr.v").as("v"))
        .agg(count(lit(1)).as("w"))
        .where(col("w") >= 2)
        .select("u", "v")

    def canon(df: DataFrame): Seq[Seq[Any]] =
      df.collect().map(_.toSeq).toSeq.sortBy(_.mkString(","))
    require(canon(coA()) == canon(coB()), "co A/B diverge")
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
      timed(s"co A#$i")(coA)
      timed(s"co B#$i")(coB)
    }
    (1 to 3).foreach { i =>
      timed(s"rp A#$i")(rpA)
      timed(s"rp B#$i")(rpB)
    }
    spark.stop()
  }
}
