package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** The 100 TB claim behind the whole streaming family — "state is
  * bounded by the watermark horizon, not by stream length" — as a
  * measured law instead of prose. A 30-day synthetic stream replayed
  * as six 5-day files (maxFilesPerTrigger=1) touches ~720 hour windows
  * x 3 types in total, but per-batch `stateOperators.numRowsTotal`
  * (read from the terminated query's OWN progress history, no
  * listener) must stay within one file-span + watermark horizon of
  * windows: eviction keeps peak state flat across batches while the
  * emitted total grows with the stream. An unbounded-state regression
  * (watermark not applied, eviction broken) fails this spec with the
  * measured numbers in the message.
  */
class StreamingStateBoundSpec extends SparkSpec {

  test("append-mode aggregation state stays within the horizon across batches") {
    import java.io.File
    val root = new File(sys.props("java.io.tmpdir"),
      s"graft_statebound_${System.nanoTime()}")
    root.mkdirs()
    try {
      import spark.implicits._
      val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
      // 30 days x 24 hours x 3 types, one row per (hour, type): every
      // window materializes in state exactly once, so numRowsTotal
      // counts open WINDOWS directly.
      val days = 30
      val types = Seq("a", "b", "c")
      def rm(f: File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      (0 until 6).foreach { fileIdx =>
        val rows = for {
          d <- (fileIdx * 5) until ((fileIdx + 1) * 5)
          h <- 0 until 24
          t <- types
        } yield (new java.sql.Timestamp(
          base + (d * 24L + h) * 3600000L + 600000L), t, 1.0)
        val stage = new File(root, "_stage")
        rows.toDF("ts", "event_type", "value")
          .withColumn("value", col("value").cast("decimal(18,4)"))
          .coalesce(1).write.mode("overwrite").parquet(stage.getPath)
        val part = stage.listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        val target = new File(root, f"replay_$fileIdx%03d.parquet")
        java.nio.file.Files.move(part.toPath, target.toPath)
        target.setLastModified(1000000000000L + fileIdx * 60000L)
        rm(stage)
      }
      val schema = spark.read.parquet(root.getPath + "/replay_000.parquet")
        .schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "replay_*.parquet")
        .parquet(root.getPath)
      spark.catalog.dropTempView("graft_statebound_sink")
      val q = graft.streaming.EventStreaming.hourlyByType(stream)
        .writeStream.format("memory").queryName("graft_statebound_sink")
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val emitted = spark.table("graft_statebound_sink").count()
      val totalWindows = days * 24L * types.size
      // All closed windows emitted: the final watermark is 23:10-2h =
      // 21:10 on the last day, so hours 21/22/23 (3 per type) stay open.
      assert(emitted == totalWindows - 3 * types.size,
        s"emitted $emitted of $totalWindows windows")
      val stateRows = q.recentProgress.toSeq
        .filter(_.stateOperators.nonEmpty)
        .map(p => p.batchId -> p.stateOperators.head.numRowsTotal)
      // Bound: one 5-day file of windows (5*24*types) + the horizon
      // carried over from the previous batch (2h + the <=2h of windows
      // the lagged eviction boundary leaves, ~5h x types slack).
      val bound = (5 * 24 + 5) * types.size
      val offenders = stateRows.filter(_._2 > bound)
      assert(offenders.isEmpty,
        s"state exceeded the horizon bound $bound (windows touched so " +
          s"far is NOT the bound — eviction broken?): $stateRows")
      // The flatness claim: late batches hold no more state than early
      // ones (stream length doesn't accumulate), while the total
      // touched windows grew 6x.
      val dataBatches = stateRows.filter(_._2 > 0)
      assert(dataBatches.size >= 5, s"expected >=5 stateful batches: $stateRows")
      val firstMax = dataBatches.take(2).map(_._2).max
      val lastMax = dataBatches.takeRight(2).map(_._2).max
      assert(lastMax <= firstMax + 5 * types.size,
        s"state grew with stream length (first~$firstMax, last~$lastMax): " +
          s"$stateRows")
      assert(spark.streams.active.isEmpty)
    } finally {
      def rm(f: File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(root)
    }
  }
}
