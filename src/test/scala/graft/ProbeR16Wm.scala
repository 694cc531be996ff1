package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Round-16 witness-health probe for the q278 grouping ladder: replay
  * the append gate at candidate groupings and record the MEMORY SINK's
  * per-micro-batch output row counts (StreamingQueryListener progress).
  * The gate's load-bearing witness is INCREMENTAL watermark emission —
  * at least one batch beyond the first must emit rows mid-stream
  * (before the trailing no-data batch flushes the final watermark).
  * A grouping that lumps every emission into one batch is vacuous no
  * matter how fast it is.
  *
  * Run: sbt "Test/runMain graft.ProbeR16Wm"
  */
object ProbeR16Wm {
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

    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        rows.add((e.progress.batchId, e.progress.sink.numOutputRows))
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)

    Seq(3, 4).foreach { g =>
      rows.clear()
      spark.conf.set("graft.q278_group", g.toString)
      val out = try SparkEntry.queries("q278_streaming_append_gate")(spark, dir).count()
        finally spark.conf.unset("graft.q278_group")
      Thread.sleep(500)
      import scala.jdk.CollectionConverters._
      val seq = rows.asScala.toSeq.sortBy(_._1)
      val emitting = seq.count(_._2 > 0)
      println(s"[wm] group=$g gated_rows=$out batches=${seq.size} " +
        s"per-batch sink rows=${seq.map(p => s"b${p._1}:${p._2}").mkString(",")} " +
        s"emitting_batches=$emitting")
      require(emitting >= 2,
        s"group=$g: emission collapsed into one batch — witness vacuous")
    }
    spark.stop()
  }
}
