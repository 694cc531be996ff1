package graft

import org.apache.spark.sql.SparkSession

/** Cost probe for q280's bucket-per-file grouping. Unlike ProbeQ278Files
  * this is NOT an identity A/B: a mapGroupsWithState replay's emission
  * multiset depends on the batch partition, so grouped(2) (4 batches at
  * the 30-day testdata span, 6000 rows at sf0.1) and grouped(3)
  * (3 batches, 4500 rows) are DIFFERENT gated entries, each exactly
  * stated by its own `// N` oracle. The probe prices the per-batch
  * planning cost alone; witness health per grouping is measured
  * separately in DuckDB (PLANS.md round-14 log: grouped(3) keeps 13/126
  * carry witnesses and all-users-multi-session at sf0.001/sf0.01).
  * Adoption rule: adopt grouped(3) only on a clear wall win, moving the
  * oracle's `// 2` -> `// 3` and the spec twin in the same commit, then
  * re-gate.
  *
  * Run: sbt "Test/runMain graft.ProbeQ280Files"
  */
object ProbeQ280Files {
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

    def run(group: Int): Int =
      ops.StreamingGate.sessionReplay(spark, dir, group).collect().length

    // Untimed warm pass builds both fixtures + JITs the plan.
    println(s"[q280files] rows A(grouped2)=${run(2)} B(grouped3)=${run(3)}")

    def timed(label: String)(thunk: => Int): Double = {
      System.gc()
      val t0 = System.nanoTime()
      val n = thunk
      val w = (System.nanoTime() - t0) / 1e9
      println(f"[q280files] $label: $w%.3f s (rows=$n)")
      w
    }
    val walls = (1 to 3).map { i =>
      val wa = timed(s"A(4batches)#$i")(run(2))
      val wb = timed(s"B(3batches)#$i")(run(3))
      (wa, wb)
    }
    val bestA = walls.map(_._1).min
    val bestB = walls.map(_._2).min
    println(f"[q280files] best A=$bestA%.3f s, best B=$bestB%.3f s, " +
      f"B/A=${bestB / bestA}%.2f, pairwise B<A: ${
        walls.count(p => p._2 < p._1)}/3")
    spark.stop()
  }
}
