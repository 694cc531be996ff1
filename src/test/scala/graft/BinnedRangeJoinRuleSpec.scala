package graft

import org.apache.spark.sql.functions._
import graft.ops.TestData

/** The auto-binning range-join rewrite: plan shape, semantics vs both the
  * naive product (rule disabled via an equality-free check on tiny data)
  * and the hand-binned q49 plan, and non-interference guards.
  */
class BinnedRangeJoinRuleSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def naiveRangeJoin = {
    val ev = TestData.table(spark, sf, "events")
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("ts").as("pts"))
    val c = ev.where(col("event_type") === "click").select(col("ts").as("cts"))
    p.join(c, col("cts") <= col("pts") &&
      col("cts") >= col("pts") - expr("INTERVAL 60 SECONDS"))
  }

  test("naive inequality join is rewritten to a binned hash join") {
    val plan = naiveRangeJoin.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range join not rewritten:\n$plan")
    assert(plan.contains("__graft_bin"), s"bin key missing:\n$plan")
  }

  test("rewrite matches the hand-binned q49 results exactly") {
    val auto = SparkEntry.queries("q58_range_join_auto")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val manual = SparkEntry.queries("q49_range_join_clicks")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(auto == manual)
  }

  test("rewrite matches a brute-force product on a hand-built frame") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(s: Long) = new java.sql.Timestamp(base.getTime + s * 1000)
    // clicks at 0,30,59,60,61,120s; purchases at 60s and 61s; window 60s
    val clicks = Seq(0L, 30L, 59L, 60L, 61L, 120L).map(ts).toDF("cts")
    val purchases = Seq((1L, ts(60)), (2L, ts(61))).toDF("event_id", "pts")
    val joined = purchases.join(clicks,
      col("cts") <= col("pts") &&
        col("cts") >= col("pts") - expr("INTERVAL 60 SECONDS"))
      .groupBy("event_id").agg(count(lit(1)).as("n"))
      .orderBy("event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // p@60 matches clicks in [0,60] -> 0,30,59,60 (4); p@61 -> [1,61] -> 30,59,60,61 (4)
    assert(joined == Seq((1L, 4L), (2L, 4L)))
  }

  test("joins with a cross-side equality conjunct are left untouched") {
    val ev = TestData.table(spark, sf, "events")
    val p = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"))
    val c = ev.where(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"))
    val j = p.join(c, col("pu") === col("cu") &&
      col("cts") <= col("pts") &&
      col("cts") >= col("pts") - expr("INTERVAL 60 SECONDS"))
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("__graft_bin"),
      s"equi-join should not be binned:\n$plan")
  }

  test("randomized: 5 seeded 40x60 trials across 3 window widths equal brute force") {
    val rnd = new scala.util.Random(20260812)
    (1 to 5).foreach { trial =>
      val winSec = Seq(7L, 60L, 3600L)(trial % 3)
      def ts(s: Long) = new java.sql.Timestamp(s * 1000)
      val probeS = Seq.fill(40)(rnd.between(-5000L, 5000L))
      val buildS = Seq.fill(60)(rnd.between(-5000L, 5000L))
      val probes = probeS.zipWithIndex.map { case (s, i) => (i.toLong, ts(s)) }
        .toDF("pid", "pts")
      val builds = buildS.map(ts).toDF("cts")
      val got = probes.join(builds,
        col("cts") <= col("pts") &&
          col("cts") >= col("pts") - expr(s"INTERVAL $winSec SECONDS"))
        .groupBy("pid").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val expected = probeS.zipWithIndex.flatMap { case (p, i) =>
        val n = buildS.count(c => c <= p && c >= p - winSec)
        if (n > 0) Some(i.toLong -> n.toLong) else None
      }.toMap
      assert(got == expected, s"trial $trial window $winSec")
    }
  }

  test("pre-epoch timestamps bin with floor semantics (boundary exactness)") {
    def ts(s: Long) = new java.sql.Timestamp(s * 1000) // around 1970 epoch
    val clicks = Seq(-61L, -60L, -1L, 0L, 1L).map(ts).toDF("cts")
    val purchases = Seq((1L, ts(0))).toDF("event_id", "pts")
    val joined = purchases.join(clicks,
      col("cts") <= col("pts") &&
        col("cts") >= col("pts") - expr("INTERVAL 60 SECONDS"))
      .select("cts").collect().map(_.getTimestamp(0).getTime / 1000).toSet
    assert(joined == Set(-60L, -1L, 0L)) // [-60, 0] inclusive
  }
}
