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
      // Oracle works on the blob's OCTETS (encode -> UTF-8 bytes), not
      // characters: CAST(text AS BLOB) errors on non-ASCII in DuckDB and
      // substr() counts characters, so the character formulation only
      // matched Spark's byte semantics on an all-ASCII corpus.
      Some(
        """SELECT doc_id,
          | CAST(octet_length(encode(text)) AS INT) AS n_bytes,
          | md5(text) AS digest,
          | lower(substr(hex(encode(text)), 1, 16)) AS head_hex
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
          | ORDER BY doc_id, chunk_idx""".stripMargin.replace("\n", ""))),

    // The DECODE SEAM under the hash gate: documents ride the media
    // carrier schema through the real partition-batched decode stage
    // (mapPartitions + BatchDecoder lifecycle — the exact path a
    // JNI/ONNX codec plugs into), and the stub decoder's byte-histogram
    // features come out as value-checked facts. The normalized float
    // feature f_j = count_j / n_bytes is inverted exactly:
    // round(f_j * n_bytes) == count_j whenever n_bytes < 2^24 (float32
    // relative error 2^-24 x count < 0.5; corpus max is ~560 bytes), so
    // the oracle replays the histogram with integer byte counts and any
    // decode-path defect (batching, lifecycle, feature shape) breaks
    // the hash. Long-form (media_id, j) rows — scalar cells only.
    "q103_media_features" -> Q(
      (s, dir) => {
        val feats = graft.multimodal.Multimodal.extractFeaturesBatched(
          graft.multimodal.Multimodal.fromDocuments(
            table(s, dir, "documents")))
        feats.toDF()
          .select(col("media_id"), col("modality"), col("n_bytes"),
            col("digest"), posexplode(col("features")).as(Seq("j", "f")))
          .select(col("media_id"), col("modality"), col("n_bytes"),
            col("digest"), col("j").cast("int").as("j"),
            round(col("f").cast("double") * col("n_bytes")).cast("bigint")
              .as("byte_cnt"))
          .orderBy("media_id", "j")
      },
      // The oracle histogram runs over the blob's OCTETS — hex(encode())
      // renders the UTF-8 bytes two chars each, and byte i is the hex
      // pair at (i-1)*2+1 — matching the decoder's `content(i) & 0xff`
      // exactly even for non-ASCII text (the previous per-CHARACTER
      // ascii() formulation agreed only on an all-ASCII corpus).
      Some(byteHistOracleSql(16))),

    // The PER-RECORD decode seam (Multimodal.extractFeatures: one
    // decode() call per row, decoder open/close per partition — the
    // CPU-codec shape, vs q103's micro-batched GPU shape) gets its own
    // catalog entry at a different feature width, so BOTH lifecycle
    // paths sit under the hash gate independently. dim = 8 exercises
    // the width-parameterized histogram: a stub that hard-coded 16
    // would pass q103 and fail here.
    "q104_media_features_perrec" -> Q(
      (s, dir) => {
        val feats = graft.multimodal.Multimodal.extractFeatures(
          graft.multimodal.Multimodal.fromDocuments(
            table(s, dir, "documents")),
          new graft.multimodal.Multimodal.StubDecoder(8))
        feats.toDF()
          .select(col("media_id"), col("modality"), col("n_bytes"),
            col("digest"), posexplode(col("features")).as(Seq("j", "f")))
          .select(col("media_id"), col("modality"), col("n_bytes"),
            col("digest"), col("j").cast("int").as("j"),
            round(col("f").cast("double") * col("n_bytes")).cast("bigint")
              .as("byte_cnt"))
          .orderBy("media_id", "j")
      },
      Some(byteHistOracleSql(8))),

    // JSONL round-trip — the training-data interchange format: render
    // each document to its JSON line (to_json), parse it back typed
    // (from_json with explicit schema — the jsonl ingest path), and
    // prove losslessness by aggregating the PARSED side per
    // (source, lang); the oracle computes the same aggregate from the
    // raw table, so any escaping/typing defect in either direction
    // breaks the hash. Render+parse are narrow codegen'd projections —
    // the only shuffle is the aggregate itself. Same host-the-semantics
    // pattern as q42's csv render->parse.
    "q109_jsonl_roundtrip" -> Q(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val lines = docs.select(to_json(struct(
          col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars"))).as("value"))
        val parsed = lines.select(from_json(col("value"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"))
          .as("r"))
          .select(col("r.doc_id").as("doc_id"), col("r.text").as("text"),
            col("r.lang").as("lang"), col("r.source").as("source"),
            col("r.n_chars").as("n_chars"))
        parsed.groupBy("source", "lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(length(col("text")).cast("bigint")).as("n_text_chars"),
            sum(col("n_chars")).as("n_chars_sum"),
            min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
          .orderBy("source", "lang")
      },
      Some(
        """SELECT source, lang, count(*) AS n_docs,
          | CAST(sum(length(text)) AS BIGINT) AS n_text_chars,
          | CAST(sum(n_chars) AS BIGINT) AS n_chars_sum,
          | min(doc_id) AS min_doc, max(doc_id) AS max_doc
          | FROM documents GROUP BY source, lang
          | ORDER BY source, lang""".stripMargin.replace("\n", ""))),

    // ORC round-trip: the second columnar interchange format (Spark's
    // built-in ORC writer/reader beside parquet). Write documents as
    // ORC, read back, and aggregate — losslessness is gated by exact
    // counts, sums, AND a bit_xor over 60-bit content hashes (order-
    // independent, overflow-free; any corrupted/dropped/duplicated text
    // flips it). The oracle computes the same digest from the parquet
    // originals, so the gate checks the full write->read cycle.
    "q120_orc_roundtrip" -> Q(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        // Fixed scratch path + overwrite: repeated verify/bench runs
        // reuse the directory instead of accumulating temp dirs.
        val path = java.nio.file.Paths.get(
          sys.props("java.io.tmpdir"), "graft_orc_rt", "documents_orc")
          .toString
        docs.write.mode("overwrite").orc(path)
        s.read.orc(path)
          .groupBy("source", "lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(length(col("text")).cast("bigint")).as("n_text_chars"),
            sum(col("n_chars")).as("n_chars_sum"),
            expr("bit_xor(cast(conv(substring(md5(text), 1, 15), 16, 10) as bigint))")
              .as("text_digest"))
          .orderBy("source", "lang")
      },
      Some(
        """SELECT source, lang, count(*) AS n_docs,
          | CAST(sum(length(text)) AS BIGINT) AS n_text_chars,
          | CAST(sum(n_chars) AS BIGINT) AS n_chars_sum,
          | CAST(bit_xor(('0x' || substr(md5(text), 1, 15))::BIGINT) AS BIGINT) AS text_digest
          | FROM documents GROUP BY source, lang
          | ORDER BY source, lang""".stripMargin.replace("\n", "")))
  )

  /** Shared byte-histogram oracle for the two decode-seam entries; `dim`
    * is the feature width (byte value mod dim buckets).
    */
  private def byteHistOracleSql(dim: Int): String =
    s"""WITH b AS (SELECT doc_id AS media_id, 'text' AS modality,
       |   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       |   md5(text) AS digest, hex(encode(text)) AS hx FROM documents),
       | g AS (SELECT media_id, unnest(generate_series(0, ${dim - 1})) AS j FROM b),
       | i0 AS (SELECT media_id, hx, unnest(generate_series(1, n_bytes)) AS i FROM b),
       | h AS (SELECT media_id, ('0x' || substr(hx, CAST((i - 1) * 2 + 1 AS INT), 2))::BIGINT % $dim AS j, count(*) AS c
       |   FROM i0 GROUP BY media_id, j)
       | SELECT g.media_id, b.modality, b.n_bytes, b.digest,
       |   CAST(g.j AS INT) AS j, CAST(coalesce(h.c, 0) AS BIGINT) AS byte_cnt
       | FROM g JOIN b USING (media_id)
       | LEFT JOIN h ON h.media_id = g.media_id AND h.j = g.j
       | ORDER BY media_id, j""".stripMargin.replace("\n", "")
}
