package graft

/** q277 (VERDICT r10 missing #2 closed): the streaming hourly rollup,
  * driven to completion with AvailableNow inside a catalog query, must
  * equal its batch twin q34 exactly and be stable across re-invocations
  * in one session (memory-sink view replacement, no leftover state).
  */
class StreamingGateSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("streaming gate equals the batch twin and re-invokes cleanly") {
    val r1 = SparkEntry.queries("q277_streaming_hourly_gate")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val batch = SparkEntry.queries("q34_events_hourly")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(r1.nonEmpty)
    assert(r1 == batch,
      s"streaming gate diverged from batch twin: ${r1.take(3)} vs ${batch.take(3)}")
    val r2 = SparkEntry.queries("q277_streaming_hourly_gate")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(r2 == r1, "second same-session invocation diverged")
    assert(spark.streams.active.isEmpty,
      "gate left a streaming query running")
  }

  test("append gate emits exactly the watermark-closed prefix of the batch twin") {
    import org.apache.spark.sql.functions._
    // q278's Append-mode output must equal q277's Complete-mode result
    // RESTRICTED to hour windows closed by the final watermark
    // (max ts - 2h): every closed window emitted exactly once with the
    // full-aggregate values (no partial emission across the replay's
    // micro-batches), open windows withheld.
    val append = SparkEntry.queries("q278_streaming_append_gate")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val full = SparkEntry.queries("q277_streaming_hourly_gate")(spark, dir)
    val maxEpoch = ops.TestData.table(spark, dir, "events")
      .agg(max(unix_timestamp(col("ts"))))
      .head().getLong(0)
    val closed = full
      .where(col("hour_epoch") + 3600 <= maxEpoch - 7200)
      .collect().map(_.toSeq).toSeq
    assert(append.nonEmpty && append.size < full.count(),
      "append gate should emit a strict prefix of the full aggregate")
    assert(append == closed,
      s"append emission diverged from the closed-window prefix: " +
        s"${append.take(3)} vs ${closed.take(3)}")
    val again = SparkEntry.queries("q278_streaming_append_gate")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(again == append, "second same-session invocation diverged")
    assert(spark.streams.active.isEmpty,
      "append gate left a streaming query running")
  }
}
