package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B probe for the array-grain LSH rescore (q105's cost center): the
  * OLD shape (candidate x shingles/doc equi-join + groupBy for
  * intersections, a separate count aggregate for denominators, both
  * over the exploded hashed-shingle frame) vs the NEW catalog shape
  * (candidates join the per-doc sorted-array frame once per side;
  * intersection = codegen'd sorted merge; denominators = size(arr)).
  * The full q105 keep-list is the timed unit; outputs are
  * checksum-compared first.
  *
  * Run: SPARK_TEST_MEM=16g sbt "Test/runMain graft.ProbeLshRescore"
  */
object ProbeLshRescore {
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
    def docs = ops.TestData.table(spark, dir, "documents")

    // OLD exploded-grain rescore, reconstructed verbatim, driven
    // through the same keep-list tail the catalog uses.
    def rescoreOld(cand: DataFrame, sh: DataFrame): DataFrame = {
      val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = cand
        .join(sh.as("a"), col("d1") === col("a.doc_id"))
        .select(col("d1"), col("d2"), col("a.s").as("s1"))
        .join(sh.as("b"),
          col("s1") === col("b.s") && col("d2") === col("b.doc_id"))
        .groupBy("d1", "d2").agg(count(lit(1)).as("inter"))
      inter
        .join(cnt.as("ca"), col("d1") === col("ca.doc_id"))
        .join(cnt.as("cb"), col("d2") === col("cb.doc_id"))
        .select(col("d1"), col("d2"), col("inter"),
          (col("inter") * lit(1.0) /
            (col("ca.n") + col("cb.n") - col("inter"))).as("jaccard"))
    }
    def pairsOld(): DataFrame = {
      val sh = ops.DedupOps.hashedShingles(docs)
        .localCheckpoint(eager = true)
      rescoreOld(
        ops.DedupOps.bandedCandidates(ops.DedupOps.docSignatures(docs), 2),
        sh)
        .where(col("jaccard") >= 0.5).select("d1", "d2")
    }
    def q105Old(): DataFrame = {
      val comp = ops.DedupOps.connectedComponents(pairsOld())
      docs.select("doc_id")
        .join(comp, col("doc_id") === col("v"), "left")
        .select(col("doc_id"),
          coalesce(col("c"), col("doc_id")).as("canonical_id"))
        .withColumn("keep",
          (col("doc_id") === col("canonical_id")).cast("int"))
        .orderBy("doc_id")
    }
    def q105New(): DataFrame =
      SparkEntry.queries("q105_keeplist_lsh")(spark, dir)

    def checksum(df: DataFrame): (Long, Long) = {
      val r = df.select(expr(
        s"bit_xor(xxhash64(${df.columns.sorted.mkString(", ")}))").as("h"),
        count(lit(1)).as("n")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val o = checksum(q105Old()); val n = checksum(q105New())
    println(s"[probe] q105 old=$o new=$n | equal=${o == n}")
    require(o == n, "array-grain LSH rescore output differs")

    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().select(count(lit(1))).collect()
      (System.nanoTime() - t0) / 1e9
    }
    def min3(f: () => DataFrame): Double = (1 to 3).map(_ => time(f)).min
    (1 to 3).foreach { k =>
      val a = min3(q105Old); val b = min3(q105New)
      println(f"[probe] block $k: q105 old=$a%.3f new=$b%.3f (${b / a}%.2f)")
    }
    spark.stop()
  }
}
