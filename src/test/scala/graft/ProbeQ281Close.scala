package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Validation probe for the q281 closed-session gate (VERDICT r14
  * "Next round" #2): before the spec and oracle land, measure
  *  - multiset equality of the replay's Append output vs the batch
  *    twin (global gap islands, keep non-last + watermark-closed last);
  *  - witness health: emitted LAST islands (can only arrive via the
  *    EventTimeTimeout eviction path), emitted NON-LAST islands
  *    (closed through some path; the spec separately witnesses a
  *    provable in-batch close via a same-batch successor), and
  *    SUPPRESSED open tails (prove the watermark actually withholds)
  *    — each must be >= 1 at both gate SFs or the gate is
  *    measured-vacuous on that path;
  *  - grouping-independence (the oracle-simplifying claim): grouped(2)
  *    and grouped(3) replays must emit identical multisets;
  *  - the boundary-tie distance: min |end + gap - wm| over last
  *    islands must be nonzero, so the strict-< convention on both
  *    engines is not load-bearing.
  *
  * Run: sbt "Test/runMain graft.ProbeQ281Close"
  */
object ProbeQ281Close {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val gap = ops.StreamingGate.SessionCloseGapMs
      val rows = ops.StreamingGate.sessionCloseReplay(spark, dir, 3)
        .collect().map(_.toSeq).toSeq
      val ev = ops.TestData.table(spark, dir, "events")
        .select(col("user_id"), unix_millis(col("ts")).as("ems"),
          (col("value").cast(DecimalType(18, 4)) * 10000).cast("long").as("v"))
      val wmMs = ev.agg(max("ems")).head().getLong(0) -
        ops.StreamingGate.SessionDelayMs
      val wu = Window.partitionBy("user_id").orderBy("ems")
      val isl = ev
        .withColumn("brk",
          when(col("ems") - lag("ems", 1).over(wu) > gap, 1).otherwise(0))
        .withColumn("sid", sum("brk").over(
          wu.rangeBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sid")
        .agg(min("ems").as("session_start_ms"), max("ems").as("session_end_ms"),
          count(lit(1)).as("n_events"), sum("v").as("value_sum_e4"))
        .withColumn("last_end",
          max("session_end_ms").over(Window.partitionBy("user_id")))
      val expected = isl
        .where(col("session_end_ms") < col("last_end") ||
          col("session_end_ms") + gap < wmMs)
        .select("user_id", "session_start_ms", "session_end_ms",
          "n_events", "value_sum_e4")
        .orderBy("user_id", "session_start_ms", "session_end_ms", "n_events")
        .collect().map(_.toSeq).toSeq
      val match_ = rows == expected
      val nIsl = isl.count()
      val timeoutWitness = isl.where(col("session_end_ms") === col("last_end")
        && col("session_end_ms") + gap < wmMs).count()
      val suppressed = isl.where(col("session_end_ms") === col("last_end")
        && col("session_end_ms") + gap >= wmMs).count()
      val nonLast = nIsl - timeoutWitness - suppressed
      val tieDist = isl.where(col("session_end_ms") === col("last_end"))
        .agg(min(abs(col("session_end_ms") + gap - wmMs))).head().getLong(0)
      val g2 = ops.StreamingGate.sessionCloseReplay(spark, dir, 2)
        .collect().map(_.toSeq).toSeq
      println(s"[q281] $dir rows=${rows.size} expected=${expected.size} " +
        s"match=$match_ islands=$nIsl nonLastClosed=$nonLast " +
        s"timeoutClosed=$timeoutWitness suppressedOpen=$suppressed " +
        s"tieDistMs=$tieDist groupingIndependent=${g2 == rows}")
      if (!match_) {
        println(s"[q281]   gate head: ${rows.take(3)}")
        println(s"[q281]   twin head: ${expected.take(3)}")
        val extra = rows.diff(expected)
        val missing = expected.diff(rows)
        println(s"[q281]   extra=${extra.take(5)}")
        println(s"[q281]   missing=${missing.take(5)}")
      }
    }
    spark.stop()
  }
}
