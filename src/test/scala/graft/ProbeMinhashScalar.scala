package graft

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** A/B probe: the minhash signature stage as it ships today
  * (rawShingles explode -> groupBy(doc_id) -> MinHashAgg, an exchange
  * whose partial aggregation is a no-op because doc_id is unique per
  * input row) vs a per-row SCALAR computation of the identical
  * signature (split -> shingle -> md5-head32 -> affine minima, all
  * inside one row, no Generate / no hash-agg / no exchange).
  *
  * The scalar side here is a deliberately naive Scala UDF — if even a
  * non-codegen UDF beats the shipped path, a proper Catalyst
  * expression is a floor on the win. Output equality is asserted by
  * checksum (sum over docs of xxhash64(doc_id, sig...)) before timing.
  *
  * Run: SPARK_TEST_MEM=16g sbt "Test/runMain graft.ProbeMinhashScalar"
  */
object ProbeMinhashScalar {
  private val NumHashes = 16

  private def scalarSig(text: String): Array[Long] = {
    if (text == null) return null
    val w = text.split(" ", -1)
    if (w.length < 3) return null
    val md = MessageDigest.getInstance("MD5")
    val buf = Array.fill(NumHashes)(Long.MaxValue)
    var i = 0
    while (i <= w.length - 3) {
      md.reset()
      val d = md.digest(
        UTF8String.fromString(w(i) + " " + w(i + 1) + " " + w(i + 2)).getBytes)
      val x = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
        ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
      var j = 0
      while (j < NumHashes) {
        val h = (graft.functions.MinHashAgg.As(j) * x +
          graft.functions.MinHashAgg.Bs(j)) % graft.functions.MinHashAgg.P
        if (h < buf(j)) buf(j) = h
        j += 1
      }
      i += 1
    }
    buf
  }

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
    val docs = ops.TestData.table(spark, dir, "documents")

    val sigUdf = udf(scalarSig _)

    // rawShingles inlined (it is file-private in DedupOps): the exact
    // shipped explode shape feeding MinHashAgg.
    def rawShingles: DataFrame = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .where(size(col("w")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(w) - 2), " +
          "i -> concat(element_at(w, i), ' ', element_at(w, i + 1), ' ', element_at(w, i + 2)))"))
        .as("s"))
    def aggPath(): DataFrame = ops.DedupOps.minhashSignatures(rawShingles)
    def exprPath(): DataFrame = docs
      .select(col("doc_id"),
        graft.functions.MinHashSig.sigCol(col("text")).as("sig"))
      .where(col("sig").isNotNull)
    def udfPath(): DataFrame = docs
      .select(col("doc_id"), sigUdf(col("text")).as("sig"))
      .where(col("sig").isNotNull)

    def checksum(df: DataFrame): (Long, Long) = {
      val r = df.select(
        expr("bit_xor(xxhash64(doc_id, sig))").as("h"),
        count(lit(1)).as("n")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val (ha, na) = checksum(aggPath())
    val (hb, nb) = checksum(udfPath())
    val (hc, nc) = checksum(exprPath())
    println(s"[probe] agg=$ha/$na udf=$hb/$nb expr=$hc/$nc " +
      s"| equal=${ha == hb && hb == hc && na == nb && nb == nc}")
    require(ha == hb && hb == hc && na == nb && nb == nc,
      "scalar signature differs from MinHashAgg")

    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().select(sum(element_at(col("sig"), 1)),
        sum(element_at(col("sig"), NumHashes))).collect()
      (System.nanoTime() - t0) / 1e9
    }
    // Warmup all, then alternate 3 timed triples.
    time(aggPath); time(udfPath); time(exprPath)
    (1 to 3).foreach { k =>
      val a = time(aggPath)
      val b = time(udfPath)
      val c = time(exprPath)
      println(f"[probe] triple $k: agg=$a%.3f s udf=$b%.3f s expr=$c%.3f s " +
        f"expr/agg=${c / a}%.2f")
    }
    spark.stop()
  }
}
