package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads travel as opaque `binary`
  * columns with typed metadata; decode / feature-extraction runs as a
  * partition-batched stage behind a pluggable decoder.
  *
  * The actual image/audio codecs are NOT available in this environment,
  * so [[StubDecoder]] produces deterministic fake features from the
  * bytes; the Spark-side contract — schema, partition batching, the
  * decoder seam, feature array shape — is real and tested. A production
  * deployment swaps [[Decoder]] for a JNI/ONNX-backed implementation
  * without touching the pipeline.
  */
object Multimodal {

  /** An opaque media payload + typed metadata (the carrier schema). */
  final case class MediaRecord(
    media_id: Long,
    modality: String,           // "image" | "audio" | "video" | "text"
    content: Array[Byte],       // opaque payload
    source: String,
    n_bytes: Long)

  final case class MediaFeatures(
    media_id: Long,
    modality: String,
    n_bytes: Long,
    digest: String,
    features: Array[Float])     // fixed-dim decoded feature vector

  /** The decode seam: one call per record, invoked partition-batched so a
    * real implementation can amortize model/session init per partition
    * via [[Decoder.open]].
    */
  trait Decoder extends Serializable {
    def open(): Unit = ()
    def decode(rec: MediaRecord): MediaFeatures
    def close(): Unit = ()
  }

  /** Deterministic stand-in for the real codec: features are a fixed-dim
    * byte-histogram projection — stable across runs, content-sensitive,
    * and shaped exactly like a real embedding would be.
    */
  final class StubDecoder(dim: Int = 16) extends Decoder {
    override def decode(rec: MediaRecord): MediaFeatures = {
      val hist = new Array[Float](dim)
      var i = 0
      while (i < rec.content.length) {
        hist((rec.content(i) & 0xff) % dim) += 1f
        i += 1
      }
      val n = math.max(rec.content.length, 1).toFloat
      var j = 0
      while (j < dim) { hist(j) /= n; j += 1 }
      MediaFeatures(rec.media_id, rec.modality, rec.n_bytes,
        java.security.MessageDigest.getInstance("MD5")
          .digest(rec.content).map("%02x".format(_)).mkString,
        hist)
    }
  }

  /** Lift the documents table into the media carrier schema (text bytes
    * standing in for opaque blobs).
    */
  def fromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      lit("text").as("modality"),
      col("text").cast("binary").as("content"),
      col("source"),
      octet_length(col("text")).cast("long").as("n_bytes"))
      .as[MediaRecord]
  }

  /** The decode stage: mapPartitions so decoder init happens once per
    * partition (the same batching contract a GPU/codec-backed decoder
    * needs). Narrow — no shuffle; repartition upstream to size batches.
    */
  def extractFeatures(ds: Dataset[MediaRecord],
                      decoder: Decoder = new StubDecoder())
  : Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      decoder.open()
      registerClose(decoder.close _)
      it.map(decoder.decode)
    }
  }

  /** close() exactly once, at task completion (success, failure, OR
    * early abandonment by limit/take) — the lifecycle a JNI/ONNX-backed
    * decoder needs. close-inside-hasNext would double-close on repeated
    * exhaustion probes and LEAK when the iterator is never drained.
    */
  private def registerClose(close: () => Unit): Unit = {
    val once = new java.util.concurrent.atomic.AtomicBoolean(false)
    Option(org.apache.spark.TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit] { _ =>
        if (once.compareAndSet(false, true)) close()
      })
  }

  /** Batch-inference seam: whole micro-batches cross the boundary at
    * once (the shape a GPU decoder or Arrow-based UDF needs — per-call
    * overhead amortizes over `batchSize` records, mirroring
    * `mapInPandas`' record-batch contract).
    */
  trait BatchDecoder extends Serializable {
    def open(): Unit = ()
    def decodeBatch(recs: Seq[MediaRecord]): Seq[MediaFeatures]
    def close(): Unit = ()
  }

  /** Stub batch decoder: identical per-record features to
    * [[StubDecoder]] (the batched path must be a pure throughput
    * optimization, never a semantic change).
    */
  final class StubBatchDecoder(dim: Int = 16) extends BatchDecoder {
    private val single = new StubDecoder(dim)
    override def decodeBatch(recs: Seq[MediaRecord]): Seq[MediaFeatures] =
      recs.map(single.decode)
  }

  /** Micro-batched decode: records stream through in fixed-size batches
    * within each partition (last batch per partition may be short).
    * Still narrow/zero-shuffle; batch memory is bounded by
    * `batchSize x max payload`, independent of partition size.
    */
  def extractFeaturesBatched(ds: Dataset[MediaRecord],
                             batchSize: Int = 64,
                             decoder: BatchDecoder = new StubBatchDecoder())
  : Dataset[MediaFeatures] = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      decoder.open()
      registerClose(decoder.close _)
      it.grouped(batchSize).flatMap(decoder.decodeBatch)
    }
  }
}
