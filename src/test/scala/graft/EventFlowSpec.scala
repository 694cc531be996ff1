package graft

import org.apache.spark.sql.functions._

/** Behavioral laws for the event-flow batch (q171-q172): transition
  * accounting (rows = events - users, per-src probabilities form a
  * distribution) and funnel level conservation/consistency.
  */
class EventFlowSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)
  private lazy val events = graft.ops.TestData.table(spark, sf, "events")

  test("q171 transitions: count accounting and per-src distributions") {
    val rows = run("q171_markov_transitions")
      .select("src", "dst", "cnt", "from_src", "prob")
      .as[(String, String, Long, Long, Double)].collect()
    val nEvents = events.count()
    val nUsers = events.select("user_id").distinct().count()
    assert(rows.map(_._3).sum == nEvents - nUsers,
      "each user contributes (events - 1) transitions")
    rows.groupBy(_._1).foreach { case (src, g) =>
      assert(g.map(_._3).sum == g.head._4, s"$src: cnt sums to from_src")
      assert(math.abs(g.map(_._5).sum - 1.0) < 1e-9, s"$src: probs sum to 1")
    }
  }

  test("q172 funnel: levels partition users and nest monotonically") {
    val rows = run("q172_window_funnel")
      .select("level", "users").as[(Int, Long)].collect().sortBy(_._1)
    val nUsers = events.select("user_id").distinct().count()
    assert(rows.map(_._2).sum == nUsers, "levels partition the user base")
    assert(rows.forall(r => r._1 >= 0 && r._1 <= 3))
    // cross-check level>=1 against a direct count of users with a view
    val viewers = events.where(col("event_type") === "view")
      .select("user_id").distinct().count()
    assert(rows.filter(_._1 >= 1).map(_._2).sum == viewers,
      "level>=1 iff the user has any view event")
  }

  test("q177 interval union: coverage bounds and island accounting") {
    val rows = run("q177_interval_union")
      .select("user_id", "n_events", "n_islands", "covered_s")
      .as[(Long, Long, Long, Long)].collect()
    val nUsers = events.select("user_id").distinct().count()
    assert(rows.length == nUsers, "one row per user")
    assert(rows.map(_._2).sum == events.count(), "events conserved")
    rows.foreach { case (u, n, isl, cov) =>
      assert(isl >= 1 && isl <= n, s"user $u: island count")
      // each island covers at least one 600 s interval; total coverage
      // is bounded by disjoint intervals on one side and by a single
      // island per event on the other
      assert(cov >= 600 * isl, s"user $u: islands at least one interval long")
      assert(cov <= 600L * n, s"user $u: coverage cannot exceed n * 600")
    }
  }

  test("q208 orphan purchases: daily accounting matches a full local replay") {
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q208_orphan_purchases")(spark, sf)
      .select("day", "n_purchases", "n_orphans", "orphan_bps")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val ev = graft.ops.TestData.table(spark, sf, "events")
      .where(col("event_type").isin("click", "purchase"))
      .select("user_id", "event_type", "ts")
      .as[(Long, String, java.sql.Timestamp)].collect()
    val clicksByUser = ev.filter(_._2 == "click")
      .groupBy(_._1).view.mapValues(_.map(_._3.getTime)).toMap
    val purchases = ev.filter(_._2 == "purchase")
    val expected = purchases.groupBy(_._3.toLocalDateTime.toLocalDate)
      .map { case (d, ps) =>
        val orphans = ps.count { p =>
          !clicksByUser.getOrElse(p._1, Array.empty[Long])
            .exists(c => c <= p._3.getTime && c >= p._3.getTime - 3600000L)
        }
        (d.toString, ps.size.toLong, orphans.toLong)
      }
    assert(rows.keySet == expected.map(_._1).toSet)
    expected.foreach { case (d, np, no) =>
      val r = rows(d)
      assert(r._2 == np && r._3 == no, s"day $d: $r vs ($np, $no)")
      assert(r._4 == no * 10000 / np, s"day $d bps")
    }
  }
}
