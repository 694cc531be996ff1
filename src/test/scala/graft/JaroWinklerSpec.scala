package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.JaroWinklerSim

/** Laws for graft_jaro_winkler. The cross-engine contract (bit-equality
  * with DuckDB's jaro_winkler_similarity) was established by a 20k-pair
  * fuzz at build time and is continuously enforced by the q175/q176
  * oracles; here we pin golden DuckDB values, algebraic laws, and the
  * codegen path.
  */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinklerSim.sim(UTF8String.fromString(a), UTF8String.fromString(b))

  test("golden values match DuckDB jaro_winkler_similarity bit-for-bit") {
    // values read off DuckDB 1.x during the build-time fuzz
    val golden = Seq(
      ("martha", "marhta") -> 0.9611111111111111,
      ("dixon", "dicksonx") -> 0.8133333333333332,
      ("jellyfish", "smellyfish") -> 0.8962962962962964, // no common prefix
      ("crate", "trace") -> 0.7333333333333334, // boost gated: prefix 0
      ("abcdxxxx", "abcdyyyy") -> 0.6666666666666666, // jaro <= 0.7: no boost
      ("abcdefxx", "abcdefyy") -> 0.9, // prefix capped at 4
      ("ab", "ba") -> 0.0, // window 0
      ("ab", "a") -> 0.8500000000000001,
      ("", "") -> 0.0, // DuckDB scores two empties 0, not 1
      ("x", "") -> 0.0)
    golden.foreach { case ((a, b), expect) =>
      assert(java.lang.Double.doubleToLongBits(jw(a, b)) ==
        java.lang.Double.doubleToLongBits(expect), s"jw($a, $b)")
    }
  }

  test("algebraic laws on random pairs") {
    val rnd = new scala.util.Random(7)
    def word(n: Int, alpha: String) =
      (1 to n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    for (_ <- 1 to 2000) {
      val alpha = Seq("ab", "abcd", "abcdefgh")(rnd.nextInt(3))
      val a = word(rnd.nextInt(12), alpha)
      val b = word(rnd.nextInt(12), alpha)
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0, s"range: jw($a, $b) = $s")
      assert(jw(a, b) == jw(b, a), s"symmetry: $a / $b")
      if (a.nonEmpty) assert(jw(a, a) == 1.0, s"reflexivity: $a")
    }
  }

  test("SQL registration and codegen path agree with the static impl") {
    val df = Seq(("martha", "marhta"), ("crate", "trace"), ("", "x"))
      .toDF("a", "b")
    val viaSql = df.selectExpr("graft_jaro_winkler(a, b) AS s")
      .as[Double].collect().toSeq
    val viaCol = df.select(
        JaroWinklerSim.jaroWinkler(col("a"), col("b")).as("s"))
      .as[Double].collect().toSeq
    val direct = Seq(jw("martha", "marhta"), jw("crate", "trace"), jw("", "x"))
    assert(viaSql == direct && viaCol == direct)
    // filter position exercises doGenCode inside a codegen'd predicate
    val n = df.where(expr("graft_jaro_winkler(a, b) > 0.9")).count()
    assert(n == 1)
  }
}
