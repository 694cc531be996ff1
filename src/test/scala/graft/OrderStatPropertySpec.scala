package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.OrderStat

/** ScalaCheck equivalence laws for the OrderStat building blocks that
  * now carry the catalog's order-statistic surface (15+ queries after
  * the round-8 scale-lint sweep): each distributed two-level scan must
  * equal the single-window (or in-JVM) reference on ARBITRARY data —
  * groups of any size, negative values, heavy ties, singleton groups.
  * Fixed seeds keep the suite deterministic across driver re-runs.
  *
  * The chunk key used throughout is `v div 8` — an integer coarsening
  * of the leading sort key, trunc-division being monotone
  * non-decreasing, so it satisfies the documented chunk-key contract
  * while still splitting groups across many chunks.
  */
/** Top-level row type: Spark cannot derive an Encoder for a case class
  * nested inside the spec class (the r8 suite failed at toDF() with
  * `AnalysisException: Unable to generate an encoder for inner class`
  * — VERDICT r8 #1), so the generator's row shape lives here.
  */
case class OrderStatPropRow(grp: String, v: Long, tie: Long)

class OrderStatPropertySpec extends SparkSpec {
  import spark.implicits._

  private type R = OrderStatPropRow
  private val R = OrderStatPropRow

  private def frames(seed: Long): DataFrame = {
    val rowGen = for {
      g <- Gen.oneOf("a", "b", "c", "dd")
      v <- Gen.chooseNum(-60L, 60L)
    } yield (g, v)
    val rows = Gen.listOfN(240, rowGen)(Gen.Parameters.default, Seed(seed))
      .get.zipWithIndex
      .map { case ((g, v), i) => R(g, v, i.toLong) }
    // a singleton group and an all-ties group exercise the edges
    val edges = Seq(R("solo", 7L, 1000L)) ++
      (0 until 9).map(i => R("ties", 5L, 1100L + i))
    (rows ++ edges).toDF()
  }

  private val chunk = expr("v div 8")
  private val order = Seq(col("v"), col("tie"))

  test("scanRank equals row_number over the full-group window") {
    for (seed <- Seq(1L, 2L, 3L)) {
      val df = frames(seed)
      val got = OrderStat.scanRank(df, Seq("grp"), order, chunk, "rk")
        .select("grp", "tie", "rk").as[(String, Long, Long)]
        .collect().sortBy(r => (r._1, r._2))
      val ref = df.withColumn("rk", row_number().over(
          Window.partitionBy("grp").orderBy(order: _*)).cast("long"))
        .select("grp", "tie", "rk").as[(String, Long, Long)]
        .collect().sortBy(r => (r._1, r._2))
      assert(got.sameElements(ref), s"seed $seed")
    }
  }

  test("scanCumSum equals the running-sum window") {
    for (seed <- Seq(1L, 2L, 3L)) {
      val df = frames(seed)
      val got = OrderStat.scanCumSum(df, Seq("grp"), col("v"), order,
          chunk, "cs")
        .select("grp", "tie", "cs").as[(String, Long, Long)]
        .collect().sortBy(r => (r._1, r._2))
      val ref = df.withColumn("cs", sum("v").over(
          Window.partitionBy("grp").orderBy(order: _*)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("grp", "tie", "cs").as[(String, Long, Long)]
        .collect().sortBy(r => (r._1, r._2))
      assert(got.sameElements(ref), s"seed $seed")
    }
  }

  test("scanCumMinExcl equals the exclusive-min window (incl. NULL head)") {
    for (seed <- Seq(1L, 2L, 3L)) {
      val df = frames(seed)
      val got = OrderStat.scanCumMinExcl(df, Seq("grp"), col("v"), order,
          chunk, "pm")
        .select("grp", "tie", "pm")
        .as[(String, Long, Option[Long])]
        .collect().sortBy(r => (r._1, r._2))
      val ref = df.withColumn("pm", min("v").over(
          Window.partitionBy("grp").orderBy(order: _*)
            .rowsBetween(Window.unboundedPreceding, -1)))
        .select("grp", "tie", "pm")
        .as[(String, Long, Option[Long])]
        .collect().sortBy(r => (r._1, r._2))
      assert(got.sameElements(ref), s"seed $seed")
    }
  }

  test("locateRank and locateRankByValue pick the exact lower median") {
    val med = (n: org.apache.spark.sql.Column) => (n + 1) - (n + 1) / 2 * 1
    for (seed <- Seq(1L, 2L)) {
      val df = frames(seed)
      // in-JVM reference: per-group sorted values, 1-based rank
      // (n+1) div 2
      val ref = df.select("grp", "v").as[(String, Long)].collect()
        .groupBy(_._1).map { case (g, xs) =>
          val s = xs.map(_._2).sorted
          g -> s(((s.length + 1) / 2) - 1)
        }
      val target = (n: org.apache.spark.sql.Column) =>
        ((n + 1) / 2).cast("long")
      val byBucket = OrderStat.locateRank(df, Seq("grp"), col("v"),
          expr("v div 8"), target, "med")
        .as[(String, Long)].collect().toMap
      val byValue = OrderStat.locateRankByValue(df, Seq("grp"), col("v"),
          target, "med")
        .as[(String, Long)].collect().toMap
      assert(byBucket == ref, s"locateRank seed $seed")
      assert(byValue == ref, s"locateRankByValue seed $seed")
    }
  }

  test("NULL group keys and NULL values survive the scans (ADVICE r8: " +
      "null-safe rejoin; windows keep a NULL partition)") {
    // NULL grp exercises the rejoin keys; NULL v exercises a NULL chunk
    // (v div 8 of NULL) sorting first, an all-NULL running-sum prefix,
    // and min/least NULL-skipping. tie keeps every order tie-complete.
    val df = Seq(
      (Option("a"), Option(3L), 1L), (Option("a"), Option.empty[Long], 2L),
      (Option("a"), Option(-9L), 3L), (Option.empty[String], Option(5L), 4L),
      (None: Option[String], Option(1L), 5L),
      (None: Option[String], Option.empty[Long], 6L),
      (Option("b"), Option(2L), 7L), (Option("b"), Option(2L), 8L))
      .toDF("grp", "v", "tie")
    val w = Window.partitionBy("grp").orderBy(order: _*)

    val gotRk = OrderStat.scanRank(df, Seq("grp"), order, chunk, "x")
      .select("grp", "tie", "x").as[(Option[String], Long, Option[Long])]
      .collect().sortBy(_._2)
    val refRk = df.withColumn("x", row_number().over(w).cast("long"))
      .select("grp", "tie", "x").as[(Option[String], Long, Option[Long])]
      .collect().sortBy(_._2)
    assert(gotRk.length == 8, "null-keyed rows were dropped by scanRank")
    assert(gotRk.sameElements(refRk))

    val gotCs = OrderStat.scanCumSum(df, Seq("grp"), col("v"), order,
        chunk, "x")
      .select("grp", "tie", "x").as[(Option[String], Long, Option[Long])]
      .collect().sortBy(_._2)
    val refCs = df.withColumn("x", sum("v").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("grp", "tie", "x").as[(Option[String], Long, Option[Long])]
      .collect().sortBy(_._2)
    assert(gotCs.length == 8, "null-keyed rows were dropped by scanCumSum")
    assert(gotCs.sameElements(refCs))

    val gotPm = OrderStat.scanCumMinExcl(df, Seq("grp"), col("v"), order,
        chunk, "x")
      .select("grp", "tie", "x").as[(Option[String], Long, Option[Long])]
      .collect().sortBy(_._2)
    val refPm = df.withColumn("x", min("v").over(
        w.rowsBetween(Window.unboundedPreceding, -1)))
      .select("grp", "tie", "x").as[(Option[String], Long, Option[Long])]
      .collect().sortBy(_._2)
    assert(gotPm.length == 8,
      "null-keyed rows were dropped by scanCumMinExcl")
    assert(gotPm.sameElements(refPm))
  }

  test("ntileOf matches Spark's ntile for k = 1..7") {
    for (seed <- Seq(1L, 2L); k <- 1 to 7) {
      val df = frames(seed)
      val w = Window.partitionBy("grp").orderBy(order: _*)
      val base = df
        .withColumn("rk", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy("grp")).cast("long"))
      val got = base.select(col("grp"), col("tie"),
          OrderStat.ntileOf(col("rk"), col("n"), k).as("nt"))
        .as[(String, Long, Int)].collect().sortBy(r => (r._1, r._2))
      val ref = df.select(col("grp"), col("tie"),
          ntile(k).over(w).as("nt"))
        .as[(String, Long, Int)].collect().sortBy(r => (r._1, r._2))
      assert(got.sameElements(ref), s"seed $seed k $k")
    }
  }
}
