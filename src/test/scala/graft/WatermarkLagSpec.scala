package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Pins the MEASURED Spark 4.1 watermark subtlety that shaped q279's
  * late-set definition (PLANS.md round-13 log): the late-data filter
  * applied to a micro-batch's input lags the progress-reported
  * watermark by one batch, and a "late" row whose filter boundary has
  * not passed it merges into still-live window state instead of being
  * dropped.
  *
  * Three single-row-group replay files, pinned order
  * (maxFilesPerTrigger=1, lexical names + ascending mtimes):
  *   A: 00:10 (v=1) and 06:50 (v=2)   -> after batch 0, wm := 04:50
  *   B: +9 days (v=4)                 -> after batch 1, wm := ~T+9d-2h
  *   C: 00:20 (v=16) and 06:20 (v=8)  -> delivered 9 days out of order
  * During batch 2 the REPORTED watermark is ~9 days past file C, yet:
  *   - 00:20 is dropped (below the batch-1 watermark 04:50 under every
  *     predicate variant — its hour was already emitted in batch 1),
  *   - 06:20 is NOT dropped (above 04:50, its hour-06 window still in
  *     state) and merges, so hour 06 emits once with n=2, v=10.
  * If a future Spark applies the CURRENT watermark to batch input,
  * hour 06 emits with n=1, v=2 and this spec fails — the signal to
  * re-read q279's margin rationale and update PLANS.md, not a q279
  * breakage (its 3h margin keeps it below every boundary variant).
  *
  * 100 TB relevance: this lag is the difference between "dropped at
  * the sink contract" and "merged into a window the sink already
  * nearly closed" — exactly the semantics a production append pipeline
  * has to state precisely.
  */
class WatermarkLagSpec extends SparkSpec {

  test("late-data filter uses the previous batch's watermark, not the reported one") {
    import java.io.File
    val root = new File(sys.props("java.io.tmpdir"),
      s"graft_wmlag_${System.nanoTime()}")
    root.mkdirs()
    try {
      val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
      def ts(offsetMin: Long) =
        new java.sql.Timestamp(base.getTime + offsetMin * 60000L)
      import spark.implicits._
      def write(idx: Int, rows: Seq[(java.sql.Timestamp, String, Double)])
      : Unit = {
        val stage = new File(root, "_stage")
        rows.toDF("ts", "event_type", "value")
          .withColumn("value", col("value").cast("decimal(18,4)"))
          .coalesce(1).write.mode("overwrite").parquet(stage.getPath)
        val part = stage.listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        val target = new File(root, f"replay_$idx%03d.parquet")
        java.nio.file.Files.move(part.toPath, target.toPath)
        target.setLastModified(1000000000000L + idx * 60000L)
        def rm(f: File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
        }
        rm(stage)
      }
      write(0, Seq((ts(10), "a", 1.0), (ts(6 * 60 + 50), "a", 2.0)))
      write(1, Seq((ts(9L * 24 * 60), "a", 4.0)))
      write(2, Seq((ts(20), "a", 16.0), (ts(6 * 60 + 20), "a", 8.0)))

      val schema = spark.read.parquet(root.getPath + "/replay_000.parquet")
        .schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "replay_*.parquet")
        .parquet(root.getPath)
      spark.catalog.dropTempView("graft_wmlag_sink")
      val q = graft.streaming.EventStreaming.hourlyByType(stream)
        .writeStream.format("memory").queryName("graft_wmlag_sink")
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val rows = spark.table("graft_wmlag_sink")
        .select(unix_timestamp(col("hour_start")).as("h"), col("n"),
          col("value_sum").cast("double").as("v"))
        .orderBy("h").collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      val h0 = base.getTime / 1000
      val h6 = h0 + 6 * 3600
      // Reported watermark during batch 2 is ~9 days past file C: the
      // last progress entry's watermark must be far beyond hour 6.
      val lastWm = q.recentProgress.last.eventTime.get("watermark")
      assert(lastWm != null && lastWm > "2024-03-08",
        s"reported watermark never advanced past file C: $lastWm")
      assert(rows.contains((h0, 1L, 1.0)),
        s"hour 00 must emit once with the on-time row only " +
          s"(00:20 dropped under every boundary variant): $rows")
      assert(rows.count(_._1 == h0) == 1,
        s"hour 00 re-emitted — dropped-late row re-created closed state: $rows")
      assert(rows.contains((h6, 2L, 10.0)),
        s"hour 06 must contain the MERGED late row (the one-batch filter " +
          s"lag): if this row reads (n=1, v=2.0), Spark now filters batch " +
          s"input by the current watermark — update PLANS.md r13 and " +
          s"q279's margin rationale: $rows")
      assert(spark.streams.active.isEmpty)
    } finally {
      def rm(f: File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(root)
    }
  }
}
