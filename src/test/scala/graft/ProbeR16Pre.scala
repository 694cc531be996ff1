package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-16 probe: apply the r15 §4 repartition recipe (pin the
  * exploding self-join's exchange at spark.sql.shuffle.partitions,
  * which AQE's input-byte coalescing cannot size for an output
  * explosion) to the three candidate-bounded similarity joins VERDICT
  * r15 scoped: q151's prefix self-join, q196's one-sided prefix
  * probe join, and q111's winnow-fingerprint self-join.
  *
  * Each A/B is identity-checked first, then alternating x3 in one JVM
  * with the noop sink.
  *
  * Run: sbt "Test/runMain graft.ProbeR16Pre"
  */
object ProbeR16Pre {
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

    // ---- q151: prefix-filter candidate self-join ----
    def candA(): DataFrame = {
      val da = ops.DedupOps.docShingleArrays(docs)
        .localCheckpoint(eager = true)
      val sh = da.select(col("doc_id"), explode(col("arr")).as("s"))
      ops.DedupOps.prefixFilterCandidates(sh)
    }
    def candB(): DataFrame = {
      val da = ops.DedupOps.docShingleArrays(docs)
        .localCheckpoint(eager = true)
      val sh = da.select(col("doc_id"), explode(col("arr")).as("s"))
      val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val dfreq = sh.groupBy("s").agg(count(lit(1)).as("df"))
      val pre = sh.join(dfreq, "s")
        .withColumn("rk", row_number().over(
          Window.partitionBy("doc_id").orderBy("df", "s")))
        .join(cnt, "doc_id")
        .where(col("rk") <= expr("n div 2 + 1"))
        .select(col("doc_id"), col("s"))
      val preP = pre.repartition(n, col("s"))
      preP.as("a").join(preP.as("b"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .distinct()
    }

    // ---- q196: one-sided prefix probe join ----
    def contA(): DataFrame = {
      val da = ops.DedupOps.docShingleArrays(docs)
        .localCheckpoint(eager = true)
      val sh = da.select(col("doc_id"), explode(col("arr")).as("s"))
      val cnt = da.select(col("doc_id"),
        size(col("arr")).cast("long").as("n"))
      val dfreq = sh.groupBy("s").agg(count(lit(1)).as("df"))
      val pre = sh.join(dfreq, "s")
        .withColumn("rk", row_number().over(
          Window.partitionBy("doc_id").orderBy("df", "s")))
        .join(cnt, "doc_id")
        .where(col("rk") <= expr("n div 4 + 1"))
        .select(col("doc_id"), col("s"))
      pre.as("a").join(sh.as("b"),
          col("a.s") === col("b.s") && col("a.doc_id") =!= col("b.doc_id"))
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .distinct()
    }
    def contB(): DataFrame = {
      val da = ops.DedupOps.docShingleArrays(docs)
        .localCheckpoint(eager = true)
      val sh = da.select(col("doc_id"), explode(col("arr")).as("s"))
      val cnt = da.select(col("doc_id"),
        size(col("arr")).cast("long").as("n"))
      val dfreq = sh.groupBy("s").agg(count(lit(1)).as("df"))
      val pre = sh.join(dfreq, "s")
        .withColumn("rk", row_number().over(
          Window.partitionBy("doc_id").orderBy("df", "s")))
        .join(cnt, "doc_id")
        .where(col("rk") <= expr("n div 4 + 1"))
        .select(col("doc_id"), col("s"))
      pre.repartition(n, col("s")).as("a")
        .join(sh.repartition(n, col("s")).as("b"),
          col("a.s") === col("b.s") && col("a.doc_id") =!= col("b.doc_id"))
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .distinct()
    }

    // ---- q111: winnow-fingerprint self-join (full query) ----
    def winA(): DataFrame = {
      val f = ops.TrainDataOps.winnowFingerprints(docs)
        .localCheckpoint(eager = true)
      f.as("a").join(f.as("b"),
          col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("n_shared"))
        .orderBy(desc("n_shared"), col("d1"), col("d2"))
        .limit(20)
    }
    def winB(): DataFrame = {
      val f = ops.TrainDataOps.winnowFingerprints(docs)
        .localCheckpoint(eager = true)
      val fP = f.repartition(n, col("fp"))
      fP.as("a").join(fP.as("b"),
          col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("n_shared"))
        .orderBy(desc("n_shared"), col("d1"), col("d2"))
        .limit(20)
    }

    def canon(df: DataFrame): Seq[Seq[Any]] =
      df.collect().map(_.toSeq).toSeq.sortBy(_.mkString(","))

    require(canon(candA()) == canon(candB()), "q151 cand A/B diverge")
    println("[pre] q151 candidates identical")
    require(canon(contA()) == canon(contB()), "q196 cand A/B diverge")
    println("[pre] q196 candidates identical")
    require(canon(winA()) == canon(winB()), "q111 A/B diverge")
    println("[pre] q111 top-20 identical")

    def timed(label: String)(f: () => DataFrame): Double = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      val w = (System.nanoTime() - t0) / 1e9
      println(f"[pre] $label: $w%.3f s")
      w
    }
    (1 to 3).foreach { i =>
      timed(s"q151 A#$i")(candA)
      timed(s"q151 B#$i")(candB)
    }
    (1 to 3).foreach { i =>
      timed(s"q196 A#$i")(contA)
      timed(s"q196 B#$i")(contB)
    }
    (1 to 3).foreach { i =>
      timed(s"q111 A#$i")(winA)
      timed(s"q111 B#$i")(winB)
    }
    spark.stop()
  }
}
