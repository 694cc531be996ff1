package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.etl.BankExprs
import graft.pipeline.BankingPipeline

/** Property-based invariants (SURVEY.md §5.2.2): totality of the scoring
  * functions, segment monotonicity, row conservation through the error
  * topology, and engagement-score bounds. Uses ScalaCheck generators with
  * a fixed seed (deterministic — the driver re-runs these per round).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int, seed: Long = 42L): List[A] =
    Gen.listOfN(n, g)(Gen.Parameters.default, Seed(seed)).get

  test("scoring functions are total: every int maps to one score in 1..5") {
    val vs = sample(Gen.chooseNum(-100000, 100000), 500) ++
      Seq(-1, 0, 3, 5, 7, 10, 30, 90, 180, 5000, 10000, 25000, 50000)
    val rows = vs.toDF("v").select(
      BankExprs.recencyScore(col("v")).as("r"),
      BankExprs.frequencyScore(col("v")).as("f"),
      BankExprs.monetaryScore(col("v").cast("double")).as("m"))
      .collect()
    rows.foreach { row =>
      assert((1 to 5).contains(row.getInt(0)))
      assert((1 to 5).contains(row.getInt(1)))
      assert((1 to 5).contains(row.getInt(2)))
    }
  }

  test("segment is monotone in the total score") {
    val order = Seq("low_value", "medium_value", "high_value", "premium")
    val triples = for { r <- 1 to 5; f <- 1 to 5; m <- 1 to 5 } yield (r, f, m)
    val got = triples.toDF("r", "f", "m")
      .select(col("r") + col("f") + col("m"),
        BankExprs.customerSegment(col("r"), col("f"), col("m")))
      .collect()
      .map(x => (x.getInt(0), x.getString(1)))
      .sortBy(_._1)
    got.sliding(2).foreach {
      case Array((s1, g1), (s2, g2)) =>
        assert(order.indexOf(g1) <= order.indexOf(g2),
          s"segment not monotone: sum $s1 -> $g1 vs sum $s2 -> $g2")
      case _ =>
    }
  }

  test("every generated CSV line lands in exactly one output (conservation)") {
    val lineGen: Gen[String] = for {
      age <- Gen.oneOf(Gen.chooseNum(-5, 120).map(_.toString), Gen.const("xx"))
      bal <- Gen.oneOf(Gen.chooseNum(-1000000, 1000000).map(_.toString),
        Gen.const("n/a"))
      extra <- Gen.oneOf("", ";z")
      dur <- Gen.chooseNum(0, 5000)
    } yield s"$age;job;m;e;no;$bal;yes;no;c;5;may;$dur;2;-1;0;u;no$extra"
    val lines = sample(lineGen, 300)
    val res = BankingPipeline.fromLines(lines.toDF("value"))
    assert(res.processed.count() + res.errors.count() == lines.size)
  }

  test("engagement score bounded in [-0.075, 1] on the natural domain") {
    val gen = for {
      p <- Gen.chooseNum(-1, 1000); c <- Gen.chooseNum(0, 1000)
      d <- Gen.chooseNum(0, 100000); y <- Gen.oneOf("yes", "no")
    } yield (p, c, d, y)
    val got = sample(gen, 500).toDF("p", "c", "d", "y")
      .select(BankExprs.engagementScore(col("p"), col("c"), col("d"),
        col("y"))).collect().map(_.getDouble(0))
    got.foreach(v => assert(v >= -0.075 && v <= 1.0, s"out of bounds: $v"))
  }
}
