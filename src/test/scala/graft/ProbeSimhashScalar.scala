package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B probe for the scalar SimHash signature: the full q26 and q163
  * catalog queries under the shipped per-row expression vs
  * `graft.simhash=agg` (explode -> groupBy(doc_id) -> 32/60-column
  * bit-sum aggregate -> majority assembly). Outputs checksum-compared
  * before timing; min-of-3 per mode, alternating blocks x3.
  *
  * Run: SPARK_TEST_MEM=16g sbt "Test/runMain graft.ProbeSimhashScalar"
  */
object ProbeSimhashScalar {
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

    def setMode(m: String): Unit =
      if (m == "agg") spark.conf.set("graft.simhash", "agg")
      else spark.conf.unset("graft.simhash")

    def q26(): DataFrame = SparkEntry.queries("q26_simhash")(spark, dir)
    def q163(): DataFrame =
      SparkEntry.queries("q163_simhash_hamming")(spark, dir)

    def checksum(df: DataFrame): (Long, Long) = {
      val r = df.select(expr(
        s"bit_xor(xxhash64(${df.columns.sorted.mkString(", ")}))").as("h"),
        count(lit(1)).as("n")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    setMode("scalar"); val a26 = checksum(q26()); val a163 = checksum(q163())
    setMode("agg"); val b26 = checksum(q26()); val b163 = checksum(q163())
    println(s"[probe] q26 scalar=$a26 agg=$b26 | q163 scalar=$a163 agg=$b163 " +
      s"| equal=${a26 == b26 && a163 == b163}")
    require(a26 == b26 && a163 == b163, "scalar simhash differs from agg")

    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().select(count(lit(1))).collect()
      (System.nanoTime() - t0) / 1e9
    }
    def min3(f: () => DataFrame): Double = (1 to 3).map(_ => time(f)).min
    (1 to 3).foreach { k =>
      setMode("agg"); val x26 = min3(q26); val x163 = min3(q163)
      setMode("scalar"); val y26 = min3(q26); val y163 = min3(q163)
      println(f"[probe] block $k: q26 agg=$x26%.3f scalar=$y26%.3f " +
        f"(${y26 / x26}%.2f) | q163 agg=$x163%.3f scalar=$y163%.3f " +
        f"(${y163 / x163}%.2f)")
    }
    spark.stop()
  }
}
