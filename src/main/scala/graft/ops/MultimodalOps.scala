package graft.ops

import org.apache.spark.sql.functions._
import TestData._

/** Multimodal-column plumbing, hosted on `documents` with text bytes
  * standing in for opaque media blobs: typed metadata extraction over a
  * binary column, and deterministic chunk/frame sampling. The real
  * decode seam (image/audio libs absent in this environment) lives in
  * [[graft.multimodal.Multimodal]] as a mapPartitions stage with a
  * deterministic stub decoder.
  */
object MultimodalOps {

  def all: Map[String, Q] = Map(

    // Binary metadata projection: byte length, content digest, head hex.
    "q37_binary_meta" -> Q(
      (s, dir) => table(s, dir, "documents").select(
        col("doc_id"),
        octet_length(col("text")).as("n_bytes"),
        md5(col("text").cast("binary")).as("digest"),
        lower(hex(substring(col("text").cast("binary"), 1, 8)))
          .as("head_hex"))
        .orderBy("doc_id"),
      Some(
        """SELECT doc_id,
          | CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
          | md5(text) AS digest,
          | lower(hex(CAST(substr(text, 1, 8) AS BLOB))) AS head_hex
          | FROM documents ORDER BY doc_id""".stripMargin.replace("\n", ""))),

    // Frame sampling: fixed-size chunks, keep every 2nd, digest each.
    // The chunk index arithmetic is the same partition-friendly pattern a
    // video frame sampler would use over byte ranges.
    "q38_frame_sample" -> Q(
      (s, dir) => table(s, dir, "documents")
        .select(col("doc_id"), col("text"),
          // greatest(..., 0): empty text yields one empty chunk on both
          // engines (Spark's div truncates toward zero, DuckDB's //
          // floors, so -1/64 would disagree: 0 vs -1).
          explode(expr("sequence(0, greatest((length(text) - 1) div 64, 0))"))
            .as("chunk_idx"))
        .where(col("chunk_idx") % 2 === 0)
        .select(col("doc_id"), col("chunk_idx").cast("int").as("chunk_idx"),
          md5(expr("substring(text, chunk_idx * 64 + 1, 64)").cast("binary"))
            .as("chunk_md5"))
        .orderBy("doc_id", "chunk_idx"),
      Some(
        """WITH c AS (SELECT doc_id, text,
          | unnest(generate_series(0, greatest((length(text) - 1) // 64, 0))) AS chunk_idx
          | FROM documents)
          | SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
          | md5(substr(text, CAST(chunk_idx * 64 + 1 AS INT), 64)) AS chunk_md5
          | FROM c WHERE chunk_idx % 2 = 0
          | ORDER BY doc_id, chunk_idx""".stripMargin.replace("\n", "")))
  )
}
