package graft

import org.apache.spark.sql.SparkSession

/** A/B probe for VERDICT r12 "Next round" #3: q278 pays ~4.7-5.5 s per
  * bench pass as the catalog's slowest entry, by design — a real
  * 7-micro-batch streaming run prices per-batch planning, not data.
  * Grouping consecutive 5-day buckets two-per-file halves the batch
  * count (6 data batches -> 3) while remaining a real multi-batch
  * watermark progression with the IDENTICAL gated output (the final
  * watermark and totals are grouping-independent). Adoption rule: adopt
  * group=2 only on a clear A/B win with identical collected output —
  * the r11/r12 discipline.
  *
  * Run: SPARK_TEST_MEM=16g sbt "Test/runMain graft.ProbeQ278Files"
  * Round 14: the A/B groupings are env-parameterized
  * (SPARK_GRAFT_PROBE_Q278_A / _B, defaults 1 vs 2 preserving the r12
  * probe) so later grouping candidates reuse the same harness — output
  * identity is still REQUIRED (q278's gated output is
  * grouping-independent by construction).
  */
object ProbeQ278Files {
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

    def run(group: Int) = {
      spark.conf.set("graft.q278_group", group.toString)
      try SparkEntry.queries("q278_streaming_append_gate")(spark, dir)
        .collect().map(_.toSeq).toSeq
      finally spark.conf.unset("graft.q278_group")
    }

    val ga = sys.env.getOrElse("SPARK_GRAFT_PROBE_Q278_A", "1").toInt
    val gb = sys.env.getOrElse("SPARK_GRAFT_PROBE_Q278_B", "2").toInt

    // Identity check + fixture build (untimed) for both variants.
    val a0 = run(ga)
    val b0 = run(gb)
    require(a0 == b0,
      s"gated output differs between groupings: ${a0.size} vs ${b0.size} rows")
    println(s"[q278files] identical gated output, rows=${a0.size}")

    def timed(label: String)(thunk: => Int): Double = {
      System.gc()
      val t0 = System.nanoTime()
      val n = thunk
      val w = (System.nanoTime() - t0) / 1e9
      println(f"[q278files] $label: $w%.3f s (rows=$n)")
      w
    }
    val walls = (1 to 3).map { i =>
      val wa = timed(s"A(group=$ga)#$i")(run(ga).size)
      val wb = timed(s"B(group=$gb)#$i")(run(gb).size)
      (wa, wb)
    }
    val bestA = walls.map(_._1).min
    val bestB = walls.map(_._2).min
    println(f"[q278files] best A=$bestA%.3f s, best B=$bestB%.3f s, " +
      f"B/A=${bestB / bestA}%.2f, pairwise B<A: ${
        walls.count(p => p._2 < p._1)}/3")
    spark.stop()
  }
}
