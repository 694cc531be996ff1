package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B probe for the array-grain adoption in q151/q196: the OLD shape
  * (checkpoint the exploded hashed-shingle frame; rebuild per-doc
  * counts and sorted arrays with a groupBy exchange each) vs the NEW
  * catalog shape (checkpoint the per-doc array frame once; counts and
  * arrays are maps, the exploded view is a derived explode). Outputs
  * are checksum-compared before timing; min-of-3 per mode per
  * alternating block x3.
  *
  * Run: SPARK_TEST_MEM=16g sbt "Test/runMain graft.ProbeArrayGrain"
  */
object ProbeArrayGrain {
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

    // OLD q151: exploded grain, cnt + arrs each a groupBy over sh.
    def q151Old(): DataFrame = {
      val sh = ops.DedupOps.hashedShingles(
        ops.TestData.table(spark, dir, "documents"))
        .localCheckpoint(eager = true)
      val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val cand = ops.DedupOps.prefixFilterCandidates(sh)
        .localCheckpoint(eager = true)
      val arrs = sh.groupBy("doc_id")
        .agg(sort_array(collect_list(col("s"))).as("arr"))
      val inter = cand
        .join(arrs.select(col("doc_id").as("d1"), col("arr").as("sa")), "d1")
        .join(arrs.select(col("doc_id").as("d2"), col("arr").as("sb")), "d2")
        .select(col("d1"), col("d2"),
          graft.functions.SortedIntersect
            .interCountBig(spark, col("sa"), col("sb")).as("inter"))
      inter
        .join(cnt.as("ca"), col("d1") === col("ca.doc_id"))
        .join(cnt.as("cb"), col("d2") === col("cb.doc_id"))
        .withColumn("union_n", col("ca.n") + col("cb.n") - col("inter"))
        .where(col("inter") * 2 >= col("union_n"))
        .select(col("d1"), col("d2"), col("inter"),
          expr("inter * 10000 div union_n").as("jaccard_bps"))
        .orderBy("d1", "d2")
    }
    def q151New(): DataFrame =
      SparkEntry.queries("q151_prefix_filter_join")(spark, dir)

    // OLD q196: exploded grain, cnt + dfreq + arrs over sh.
    def q196Old(): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val sh = ops.DedupOps.hashedShingles(
        ops.TestData.table(spark, dir, "documents"))
        .localCheckpoint(eager = true)
      val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val dfreq = sh.groupBy("s").agg(count(lit(1)).as("df"))
      val pre = sh.join(dfreq, "s")
        .withColumn("rk", row_number().over(
          Window.partitionBy("doc_id").orderBy("df", "s")))
        .join(cnt, "doc_id")
        .where(col("rk") <= expr("n div 4 + 1"))
        .select(col("doc_id"), col("s"))
      val cand = pre.as("a").join(sh.as("b"),
          col("a.s") === col("b.s") && col("a.doc_id") =!= col("b.doc_id"))
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .distinct()
        .localCheckpoint(eager = true)
      val sized = cand
        .join(cnt.select(col("doc_id").as("da"), col("n").as("pna")), "da")
        .join(cnt.select(col("doc_id").as("db"), col("n").as("pnb")), "db")
        .where(col("pnb") * 4 >= col("pna") * 3)
        .select("da", "db")
      val arrs = sh.groupBy("doc_id")
        .agg(sort_array(collect_list(col("s"))).as("arr"))
      sized
        .join(arrs.select(col("doc_id").as("da"), col("arr").as("sa")), "da")
        .join(arrs.select(col("doc_id").as("db"), col("arr").as("sb")), "db")
        .select(col("da"), col("db"),
          size(col("sa")).cast("bigint").as("na"),
          size(col("sb")).cast("bigint").as("nb"),
          graft.functions.SortedIntersect
            .interCountBig(spark, col("sa"), col("sb")).as("inter"))
        .where(col("inter") * 4 >= col("na") * 3)
        .select(col("da"), col("db"), col("na"), col("nb"), col("inter"),
          expr("inter * 10000 div na").as("containment_bps"))
        .orderBy("da", "db")
    }
    def q196New(): DataFrame =
      SparkEntry.queries("q196_containment_pairs")(spark, dir)

    def checksum(df: DataFrame): (Long, Long) = {
      val r = df.select(expr(
        s"bit_xor(xxhash64(${df.columns.sorted.mkString(", ")}))").as("h"),
        count(lit(1)).as("n")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val o151 = checksum(q151Old()); val n151 = checksum(q151New())
    val o196 = checksum(q196Old()); val n196 = checksum(q196New())
    println(s"[probe] q151 old=$o151 new=$n151 | q196 old=$o196 new=$n196 " +
      s"| equal=${o151 == n151 && o196 == n196}")
    require(o151 == n151 && o196 == n196, "array-grain output differs")

    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().select(count(lit(1))).collect()
      (System.nanoTime() - t0) / 1e9
    }
    def min3(f: () => DataFrame): Double = (1 to 3).map(_ => time(f)).min
    (1 to 3).foreach { k =>
      val a151 = min3(q151Old); val b151 = min3(q151New)
      val a196 = min3(q196Old); val b196 = min3(q196New)
      println(f"[probe] block $k: q151 old=$a151%.3f new=$b151%.3f " +
        f"(${b151 / a151}%.2f) | q196 old=$a196%.3f new=$b196%.3f " +
        f"(${b196 / a196}%.2f)")
    }
    spark.stop()
  }
}
