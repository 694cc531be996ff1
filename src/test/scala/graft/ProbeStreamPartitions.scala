package graft

import org.apache.spark.sql.SparkSession

/** A/B probe for the streaming gates' stream-side shuffle partitions
  * (the `graft.stream_parts` lever, shipped default 4). A stateful
  * micro-batch sets up + commits one state-store instance per shuffle
  * partition; at the gates' bounded replay sizes (10k-100k rows) that
  * fixed overhead dwarfs the work. Round-14 measurements at sf0.1:
  * 32 -> 8 cut every gate wall 45-55% (12/12 pairwise, byte-identical
  * outputs), 8 -> 4 another ~5-8% (6/6 pairwise) — adopted 4.
  * Output is partition-count-independent (hash aggregation / keyed
  * state, DECIMAL-exact sums), which the probe re-checks by identity
  * before timing.
  *
  * Run: sbt "Test/runMain graft.ProbeStreamPartitions"
  */
object ProbeStreamPartitions {
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
    val partsA = sys.env.getOrElse("SPARK_GRAFT_PROBE_PARTS_A", "32").toInt
    val partsB = sys.env.getOrElse("SPARK_GRAFT_PROBE_PARTS_B", "4").toInt
    val queries = Seq("q277_streaming_hourly_gate",
      "q278_streaming_append_gate", "q279_streaming_late_drop_gate",
      "q280_streaming_session_gate")

    def run(name: String, parts: Int): Seq[Seq[Any]] = {
      spark.conf.set("graft.stream_parts", parts.toString)
      try SparkEntry.queries(name)(spark, dir).collect().map(_.toSeq).toSeq
      finally spark.conf.unset("graft.stream_parts")
    }

    // Warm + identity check per query.
    queries.foreach { q =>
      val a = run(q, partsA)
      val b = run(q, partsB)
      require(a == b, s"$q output differs between partition counts")
      println(s"[streamparts] $q identical output, rows=${a.size}")
    }
    def timed(label: String)(thunk: => Int): Double = {
      System.gc()
      val t0 = System.nanoTime()
      val n = thunk
      val w = (System.nanoTime() - t0) / 1e9
      println(f"[streamparts] $label: $w%.3f s (rows=$n)")
      w
    }
    queries.foreach { q =>
      val walls = (1 to 3).map { i =>
        val wa = timed(s"$q A($partsA)#$i")(run(q, partsA).size)
        val wb = timed(s"$q B($partsB)#$i")(run(q, partsB).size)
        (wa, wb)
      }
      println(f"[streamparts] $q best A=${walls.map(_._1).min}%.3f " +
        f"B=${walls.map(_._2).min}%.3f pairwise B<A: ${
          walls.count(p => p._2 < p._1)}/3")
    }
    spark.stop()
  }
}
