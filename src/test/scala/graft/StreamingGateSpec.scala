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
}
