package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B probe for the per-row hashed-shingle frame: times two
  * representative hashedShingles consumers — the exact Jaccard pair
  * join (q24/q64's core, 3 references to sh) and the keep-list
  * composition (q85's default path) — under the shipped scalar shape
  * vs `graft.shingle_hashes=explode` (the old explode -> md5 ->
  * corpus-wide distinct). Output equality is asserted by checksum
  * before timing.
  *
  * Run: SPARK_TEST_MEM=16g sbt "Test/runMain graft.ProbeShingleScalar"
  */
object ProbeShingleScalar {
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

    def setMode(m: String): Unit =
      if (m == "explode") spark.conf.set("graft.shingle_hashes", "explode")
      else spark.conf.unset("graft.shingle_hashes")

    def jacc(): (Long, Long) = {
      val r = ops.DedupOps.jaccardPairs(docs)
        .select(expr("bit_xor(xxhash64(d1, d2, inter))").as("h"),
          count(lit(1)).as("n")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    def keep(): (Long, Long) = {
      val r = ops.DedupOps.keepList(docs, "exact")
        .select(expr("bit_xor(xxhash64(doc_id, canonical_id))").as("h"),
          count(lit(1)).as("n")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }

    // Equality first.
    setMode("scalar"); val (j1, jn1) = jacc(); val (k1, kn1) = keep()
    setMode("explode"); val (j2, jn2) = jacc(); val (k2, kn2) = keep()
    println(s"[probe] jacc scalar=$j1/$jn1 explode=$j2/$jn2 " +
      s"keep scalar=$k1/$kn1 explode=$k2/$kn2 " +
      s"| equal=${j1 == j2 && jn1 == jn2 && k1 == k2 && kn1 == kn2}")
    require(j1 == j2 && jn1 == jn2 && k1 == k2 && kn1 == kn2,
      "scalar hashed-shingle outputs differ from the explode pipeline")

    def time(f: () => (Long, Long)): Double = {
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }
    // min-of-3 per mode per alternating block: the single-run walls on
    // this box swing 2-5x with background load; min-of-3 inside each
    // block recovers the floor both modes can hit.
    def min3(f: () => (Long, Long)): Double =
      (1 to 3).map(_ => time(f)).min
    (1 to 3).foreach { k =>
      setMode("explode"); val je = min3(jacc); val ke = min3(keep)
      setMode("scalar"); val js = min3(jacc); val ks = min3(keep)
      println(f"[probe] block $k: jacc explode=$je%.3f scalar=$js%.3f " +
        f"(${js / je}%.2f) | keep explode=$ke%.3f scalar=$ks%.3f (${ks / ke}%.2f)")
    }
    spark.stop()
  }
}
