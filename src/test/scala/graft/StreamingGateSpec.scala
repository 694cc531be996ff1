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

  test("late-drop gate drops the out-of-order half, observably and deterministically") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    val late = SparkEntry.queries("q279_streaming_late_drop_gate")(spark, dir)
      .collect().map(_.toSeq).toSeq
    // Spark-side twin of the DuckDB oracle: the aggregate over all rows
    // EXCEPT the late set (earliest 5-day bucket, odd event_id, window
    // end >= 3h below the bucket max — below every candidate filter
    // boundary), restricted to hour windows closed by the final
    // watermark.
    val ev = ops.TestData.table(spark, dir, "events")
      .withColumn("es", unix_timestamp(col("ts")))
      .withColumn("bucket", expr("es div 432000"))
    val minB = ev.agg(min("bucket")).head().getLong(0)
    val b0max = ev.where(col("bucket") === minB).agg(max("es"))
      .head().getLong(0)
    val isLate = col("bucket") === minB && col("event_id") % 2 === 1 &&
      expr("es - es % 3600") + 3600 <= b0max - 10800
    val lateRows = ev.where(isLate)
    assert(lateRows.count() > 0,
      "fixture degenerate: no late rows to drop — the gate would be vacuous")
    val kept = ev.where(!isLate)
    val maxEpoch = kept.agg(max("es")).head().getLong(0)
    val expected = kept
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 4))).cast(DecimalType(18, 4))
          .cast("double").as("value_sum"))
      .where(col("hour_epoch") + 3600 <= maxEpoch - 7200)
      .orderBy("hour_epoch", "event_type")
      .collect().map(_.toSeq).toSeq
    assert(late == expected,
      s"late-drop emission diverged from the kept-rows closed-window " +
        s"aggregate: ${late.take(3)} vs ${expected.take(3)}")
    // Observability: had Spark NOT dropped the late half, the output
    // would be q278's (full aggregate over the same closed windows).
    val noDrop = SparkEntry.queries("q278_streaming_append_gate")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(late != noDrop,
      "late-drop output equals the no-drop aggregate — dropping unobservable")
    // Batch-determinism of the watermark sequence (the property the
    // r12 spec-only argument doubted): a second full replay emits the
    // identical row set.
    val again = SparkEntry.queries("q279_streaming_late_drop_gate")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(again == late, "second replay diverged — watermark sequence not deterministic")
    assert(spark.streams.active.isEmpty,
      "late-drop gate left a streaming query running")
  }

  test("session gate equals the per-batch truncation of batch sessionization") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val rows = SparkEntry.queries("q280_streaming_session_gate")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(rows.nonEmpty)
    // Observability 1: the 36 h gap actually fires — some user has >= 2
    // distinct sessions (otherwise the gate degenerates to one
    // running-total row per user and never tests the break logic).
    val byUserStarts = rows.groupBy(_.head)
      .map { case (_, rs) => rs.map(_(1)).distinct.size }
    assert(byUserStarts.exists(_ >= 2),
      "fixture degenerate: no user ever starts a second session")
    // Observability 2: cross-batch state CARRY is real — some session
    // (user, session_start) is emitted in two different batches with a
    // grown event count, which only happens if mapGroupsWithState
    // carried its state across micro-batches.
    val carried = rows.groupBy(r => (r.head, r(1)))
      .exists { case (_, rs) => rs.map(_(3)).distinct.size >= 2 }
    assert(carried,
      "no session spans a micro-batch boundary — state carry untested")
    // Spark-side twin of the DuckDB oracle: global gap-sessionization
    // (lag/cumsum islands), then per (user, batch) the cumulative stats
    // of the session holding the user's last event in the batch. RANGE
    // frames so ms-tied events are peers, exactly as the gate argues.
    val ev = ops.TestData.table(spark, dir, "events")
      .select(col("user_id"), unix_millis(col("ts")).as("ems"),
        (col("value").cast(DecimalType(18, 4)) * 10000).cast("long").as("v"),
        expr("unix_timestamp(ts) div 432000").as("bucket"))
    val bi = ev.select("bucket").distinct()
      .withColumn("batch",
        ((row_number().over(Window.orderBy("bucket")) - 1) /
          ops.StreamingGate.SessionGroup).cast("long"))
    val wu = Window.partitionBy("user_id").orderBy("ems")
    val sess = ev.join(bi, "bucket")
      .withColumn("brk",
        when(col("ems") - lag("ems", 1).over(wu) > 36L * 3600 * 1000, 1)
          .otherwise(0))
      .withColumn("sid", sum("brk").over(
        wu.rangeBetween(Window.unboundedPreceding, Window.currentRow)))
    val ws = Window.partitionBy("user_id", "sid").orderBy("ems")
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = sess
      .withColumn("session_start_ms", min("ems").over(ws))
      .withColumn("session_end_ms", max("ems").over(ws))
      .withColumn("n_events", count(lit(1)).over(ws))
      .withColumn("value_sum_e4", sum("v").over(ws))
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id", "batch").orderBy(col("ems").desc)))
      .where(col("rn") === 1)
      .select("user_id", "session_start_ms", "session_end_ms", "n_events",
        "value_sum_e4")
      .orderBy("user_id", "session_start_ms", "session_end_ms", "n_events")
      .collect().map(_.toSeq).toSeq
    assert(rows == expected,
      s"session gate diverged from the batch twin: " +
        s"${rows.take(3)} vs ${expected.take(3)}")
    // Replay determinism: a second full replay emits identical rows.
    val again = SparkEntry.queries("q280_streaming_session_gate")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(again == rows, "second replay diverged")
    assert(spark.streams.active.isEmpty,
      "session gate left a streaming query running")
  }

  test("closed-session gate emits each finished session once, evicts at the watermark") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val gap = ops.StreamingGate.SessionCloseGapMs
    val rows = SparkEntry.queries("q281_streaming_session_close_gate")(
      spark, dir).collect().map(_.toSeq).toSeq
    assert(rows.nonEmpty)
    // Exactly-once: Append output must contain no duplicate records
    // (each island closes through exactly one path — in-batch gap or
    // timeout eviction — and both paths emit the same record once).
    assert(rows.distinct.size == rows.size,
      "a session record was emitted more than once")
    // Spark-side twin of the DuckDB oracle: global gap islands, keep
    // every NON-LAST island plus last islands closed by the final
    // watermark (max ts - 2h); still-open tails withheld.
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
      .agg(min("ems").as("session_start_ms"),
        max("ems").as("session_end_ms"),
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
    assert(rows == expected,
      s"closed-session gate diverged from the batch twin: " +
        s"${rows.take(3)} vs ${expected.take(3)}")
    // Witness health (measured, all three paths non-vacuous — the gap
    // was picked for exactly this, see StreamingGate.SessionCloseGapMs):
    //  - timeout EVICTION: an emitted LAST island can only arrive via
    //    the hasTimedOut branch (no successor event ever closes it);
    //  - in-batch close: a non-last island whose SUCCESSOR island
    //    starts in the SAME replay batch its end falls in — no batch
    //    boundary between them means no timeout could have fired, so
    //    the close can only be the data-branch gap break (a non-last
    //    island alone is NOT a witness: with a cross-batch successor
    //    it may also close via timeout — r15 review);
    //  - watermark SUPPRESSION: a still-open tail that must NOT appear.
    val timeoutClosed = isl.where(col("session_end_ms") === col("last_end")
      && col("session_end_ms") + gap < wmMs).count()
    val suppressed = isl.where(col("session_end_ms") === col("last_end")
      && col("session_end_ms") + gap >= wmMs).count()
    assert(timeoutClosed >= 1,
      "fixture degenerate: no session closes via timeout eviction")
    assert(suppressed >= 1,
      "fixture degenerate: no open tail for the watermark to suppress")
    // ems div 432000000 == unix_timestamp(ts) div 432000 (positive
    // epochs): the fixture's bucket key; batches group 3 buckets.
    val bucketBatch = ev.select(expr("ems div 432000000").as("bucket"))
      .distinct().orderBy("bucket").collect().map(_.getLong(0))
      .zipWithIndex
      .map { case (b, i) => b -> i / ops.StreamingGate.SessionGroup }
      .toMap
    val islandSpans = isl
      .select("user_id", "sid", "session_start_ms", "session_end_ms")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val inBatchClose = islandSpans.groupBy(_._1).values.exists { us =>
      us.sortBy(_._2).toSeq.sliding(2).exists {
        case Seq(a, b) =>
          bucketBatch(a._4 / 432000000L) == bucketBatch(b._3 / 432000000L)
        case _ => false
      }
    }
    assert(inBatchClose,
      "fixture degenerate: no session provably closes via the in-batch " +
        "gap path (every successor crosses a batch boundary)")
    // Boundary margin: no last island sits ON end + gap == watermark,
    // so both engines' strict-< convention is not load-bearing.
    val tieDist = isl.where(col("session_end_ms") === col("last_end"))
      .agg(min(abs(col("session_end_ms") + gap - wmMs))).head().getLong(0)
    assert(tieDist > 0, "a session ends exactly on the timeout boundary")
    // Replay determinism + clean shutdown.
    val again = SparkEntry.queries("q281_streaming_session_close_gate")(
      spark, dir).collect().map(_.toSeq).toSeq
    assert(again == rows, "second replay diverged")
    // Grouping-INDEPENDENCE — the claim that lets q281's oracle carry
    // no batch arithmetic (unlike q280's `// N`): a different replay
    // partition (grouped(2): 4 batches instead of 3) must emit the
    // identical multiset, because both close paths produce the same
    // record and tail suppression depends only on the final watermark.
    val regrouped = ops.StreamingGate.sessionCloseReplay(spark, dir, 2)
      .collect().map(_.toSeq).toSeq
    assert(regrouped == rows,
      "closed-session emission depends on the batch grouping")
    assert(spark.streams.active.isEmpty,
      "closed-session gate left a streaming query running")
  }
}
