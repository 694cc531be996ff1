package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming twins of the batch curation operators, for a
  * live document-ingest pipeline (doc_id, ingest_ts, text, source).
  *
  * The batch catalog gates a fixed corpus (q84 quality, q20/q22
  * fingerprint dedup, q88 mixing); a production ingest runs the same
  * semantics continuously with BOUNDED state: the fingerprint-dedup
  * state and the window aggregates are both evicted at the watermark
  * horizon, so these run forever at any rate. Both operators execute
  * identically on a batch frame (unified API) and on `readStream`
  * sources — the specs drive them through MemoryStream.
  */
object DocumentStreaming {

  /** The q20 exact fingerprint (shared with the batch canonicalization,
    * so streaming and batch dedup agree on identity).
    */
  private def fingerprint = graft.ops.TextOps.normalizedFp

  /** Streaming curation: Gopher-style quality rules (q84's thresholds)
    * then exact-fingerprint dedup within the watermark horizon — the
    * first-occurrence wins, re-ingested duplicates are dropped while
    * their fingerprint is still in state. Quality is a stateless
    * projection; dedup state is keyed on the 16-byte fingerprint only.
    */
  def curateStream(docs: DataFrame, watermark: String = "1 hour"): DataFrame = {
    val w = split(col("text"), " ")
    docs
      .withWatermark("ingest_ts", watermark)
      .withColumn("fp", fingerprint)
      .withColumn("n_words", size(w).cast("bigint"))
      .withColumn("mean_word_len",
        expr("length(replace(text, ' ', '')) * 1.0 / size(split(text, ' '))"))
      .withColumn("dup_word_frac",
        lit(1.0) - size(array_distinct(w)) * lit(1.0) / size(w))
      .where(col("n_words") >= graft.ops.TextOps.GopherMinWords &&
        col("n_words") <= graft.ops.TextOps.GopherMaxWords &&
        col("mean_word_len").between(graft.ops.TextOps.GopherMinMeanLen,
          graft.ops.TextOps.GopherMaxMeanLen) &&
        col("dup_word_frac") <= graft.ops.TextOps.GopherMaxDupFrac)
      .dropDuplicatesWithinWatermark("fp")
      .select("doc_id", "ingest_ts", "source", "fp", "n_words")
  }

  /** Windowed per-source ingest mix monitor: doc and token volume per
    * source per hour — the live view of the ratios q88's temperature
    * mixing consumes. Watermarked tumbling windows, bounded state.
    */
  def sourceMixMonitor(docs: DataFrame,
                       watermark: String = "2 hours"): DataFrame =
    docs
      .withWatermark("ingest_ts", watermark)
      .groupBy(window(col("ingest_ts"), "1 hour"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("bigint")).as("n_tokens"))
      .select(col("window.start").as("hour_start"), col("source"),
        col("n_docs"), col("n_tokens"))
}
