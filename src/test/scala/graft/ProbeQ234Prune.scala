package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q234 A-priori placement probe. The shipped shape generates ALL
  * per-order a<b<c triples in the 3-way basket join and only then
  * applies the three frequent-pair semi-joins; textbook A-priori
  * prunes (p1, p2) candidates BEFORE extending with the third item, so
  * the 3rd join's left side carries only frequent-pair rows — on a
  * wide-basket corpus at 100 TB that bounds the dominant fanout by
  * |frequent pairs per order| instead of C(width, 2). Two questions:
  *  (1) does Catalyst's PushLeftSemiLeftAntiThroughJoin already push
  *      the shipped semi-joins below the c-join (plans coincide)?
  *  (2) if not, does the explicit early-prune shape win at sf0.1?
  * Both shapes must produce the identical triple set (same groupBy +
  * support cut), asserted before timing.
  *
  * Run: SPARK_TEST_MEM=16g sbt "Test/runMain graft.ProbeQ234Prune"
  */
object ProbeQ234Prune {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def clear(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      org.apache.spark.graft.BenchInternals.removeAllBroadcasts()
      System.gc()
    }

    // Shared prefix, rebuilt per invocation exactly as q234 does.
    def base(): (DataFrame, DataFrame) = {
      val li = ops.TestData.table(spark, dir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
        .localCheckpoint(eager = true)
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
      (liF, fp)
    }

    // A: shipped — 3-way join, then three semi-joins.
    def shippedPre(liF: DataFrame, fp: DataFrame): DataFrame =
      liF.alias("a")
        .join(liF.alias("b"),
          col("a.o") === col("b.o") && col("a.p") < col("b.p"))
        .join(liF.alias("c"),
          col("b.o") === col("c.o") && col("b.p") < col("c.p"))
        .select(col("a.o").as("o"), col("a.p").as("p1"),
          col("b.p").as("p2"), col("c.p").as("p3"))
        .join(fp.select(col("u").as("p1"), col("v").as("p2")),
          Seq("p1", "p2"), "left_semi")
        .join(fp.select(col("u").as("p1"), col("v").as("p3")),
          Seq("p1", "p3"), "left_semi")
        .join(fp.select(col("u").as("p2"), col("v").as("p3")),
          Seq("p2", "p3"), "left_semi")
        .groupBy("p1", "p2", "p3").agg(count(lit(1)).as("orders_cnt"))

    def shipped(liF: DataFrame, fp: DataFrame): DataFrame =
      shippedPre(liF, fp).where(col("orders_cnt") >= 2)

    // B: early prune — (p1, p2) semi-join before the third basket join.
    def earlyPrunePre(liF: DataFrame, fp: DataFrame): DataFrame = {
      val ab = liF.alias("a")
        .join(liF.alias("b"),
          col("a.o") === col("b.o") && col("a.p") < col("b.p"))
        .select(col("a.o").as("o"), col("a.p").as("p1"),
          col("b.p").as("p2"))
        .join(fp.select(col("u").as("p1"), col("v").as("p2")),
          Seq("p1", "p2"), "left_semi")
      ab.alias("ab").join(liF.alias("c"),
          col("ab.o") === col("c.o") && col("ab.p2") < col("c.p"))
        .select(col("ab.p1").as("p1"), col("ab.p2").as("p2"),
          col("c.p").as("p3"))
        .join(fp.select(col("u").as("p1"), col("v").as("p3")),
          Seq("p1", "p3"), "left_semi")
        .join(fp.select(col("u").as("p2"), col("v").as("p3")),
          Seq("p2", "p3"), "left_semi")
        .groupBy("p1", "p2", "p3").agg(count(lit(1)).as("orders_cnt"))
    }

    def earlyPrune(liF: DataFrame, fp: DataFrame): DataFrame =
      earlyPrunePre(liF, fp).where(col("orders_cnt") >= 2)

    val (liF0, fp0) = base()
    val pA = shipped(liF0, fp0)
    val pB = earlyPrune(liF0, fp0)
    val same = pA.queryExecution.executedPlan.canonicalized ==
      pB.queryExecution.executedPlan.canonicalized
    println(s"[q234prune] physical plans identical: $same")
    println("[q234prune] shipped plan joins:")
    println(pA.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange"))
      .map(_.take(120)).mkString("\n"))
    println("[q234prune] early-prune plan joins:")
    println(pB.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange"))
      .map(_.take(120)).mkString("\n"))
    val sA = pA.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3))).toSet
    val sB = pB.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3))).toSet
    require(sA == sB, s"triple sets differ: ${sA.size} vs ${sB.size}")
    println(s"[q234prune] identical triple sets, n=${sA.size}")
    // The post-support-cut set is EMPTY at bench SFs, which would make
    // the equality above vacuous — also compare the PRE-cut candidate
    // counts (every surviving a<b<c triple with its order count), which
    // is where the two shapes could actually diverge.
    def preCut(df: DataFrame): Set[(Long, Long, Long, Long)] = df
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val qA = preCut(shippedPre(liF0, fp0))
    val qB = preCut(earlyPrunePre(liF0, fp0))
    require(qA == qB, s"pre-cut sets differ: ${qA.size} vs ${qB.size}")
    println(s"[q234prune] identical PRE-cut candidate counts, n=${qA.size}")

    def timed(label: String)(thunk: => Long): Double = {
      clear()
      val t0 = System.nanoTime()
      val n = thunk
      val w = (System.nanoTime() - t0) / 1e9
      println(f"[q234prune] $label: $w%.3f s (n=$n)")
      w
    }
    // Warm both full shapes (base + triples) once.
    { val (l, f) = base(); shipped(l, f).count() }
    { val (l, f) = base(); earlyPrune(l, f).count() }
    val walls = (1 to 3).map { i =>
      val wa = timed(s"shipped#$i") {
        val (l, f) = base(); shipped(l, f).count()
      }
      val wb = timed(s"early#$i") {
        val (l, f) = base(); earlyPrune(l, f).count()
      }
      (wa, wb)
    }
    println(f"[q234prune] best shipped=${walls.map(_._1).min}%.3f s, " +
      f"best early=${walls.map(_._2).min}%.3f s")
    spark.stop()
  }
}
