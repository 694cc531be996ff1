package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.DocumentStreaming

/** Streaming curation semantics over MemoryStream document batches. */
class DocumentStreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(3600L * 1000 + min * 60000L)

  // 32 distinct 4-char words: n_words=32, mean_word_len=4, dup_frac=0.
  private val goodText =
    (1 to 32).map(i => f"w$i%03d").mkString(" ")
  private val shortText = "too short" // fails the n_words >= 30 rule

  test("streaming curation: quality gate + cross-batch fingerprint dedup") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, String)]
    val stream = mem.toDF().toDF("doc_id", "ingest_ts", "text", "source")
    val query = DocumentStreaming.curateStream(stream).writeStream
      .format("memory").queryName("curated_docs")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts(0), goodText, "web"),
        (2L, ts(1), shortText, "web"))
      query.processAllAvailable()
      // later batch: an exact dup of doc 1 and a normalization-variant dup
      mem.addData((3L, ts(5), goodText, "web"),
        (4L, ts(6), "  " + goodText.toUpperCase + " ", "books"),
        (5L, ts(7), (101 to 132).map(i => f"v$i%03d").mkString(" "), "books"))
      query.processAllAvailable()
      val kept = spark.table("curated_docs").select("doc_id")
        .as[Long].collect().toSet
      // 1 kept; 2 fails quality; 3 and 4 are fingerprint dups of 1; 5 new
      assert(kept == Set(1L, 5L))
    } finally query.stop()
  }

  test("source mix monitor: per-source windowed doc/token volume") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, String)]
    val stream = mem.toDF().toDF("doc_id", "ingest_ts", "text", "source")
    val query = DocumentStreaming.sourceMixMonitor(stream).writeStream
      .format("memory").queryName("mix_monitor")
      .outputMode("update").start()
    try {
      mem.addData((1L, ts(0), "a b c", "web"), (2L, ts(2), "d e", "web"),
        (3L, ts(3), "f g h i", "books"))
      query.processAllAvailable()
      val rows = spark.table("mix_monitor")
        .select("source", "n_docs", "n_tokens")
        .as[(String, Long, Long)].collect().toSet
      assert(rows == Set(("web", 2L, 5L), ("books", 1L, 4L)))
    } finally query.stop()
  }
}
