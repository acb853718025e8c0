package graft.queries

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column surface for the training-data pipeline: media payloads
  * as opaque `binary` columns with typed metadata, plus the frame-sampling
  * dataflow shape (payload → per-frame rows).
  *
  * The fixtures carry no image/audio payloads, so the binary column is the
  * UTF-8 encoding of `documents.text` and the "decode" step is a
  * CLEARLY-MARKED DETERMINISTIC FAKE (byte-derived pseudo-metadata) — the
  * real decode would be a vectorized UDF over the same binary column. What
  * IS real, and what these queries pin down, is the Spark-side plumbing:
  * binary typing, byte-length/digest/head-sample metadata, and the
  * explode-to-frames shape with its per-frame ordering — all value-checked
  * against DuckDB over the same bytes.
  */
object MultimodalQueries {

  private def docs(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.load(s, dir, "documents")

  /** m01 — binary payload metadata: byte length, content digest, head-bytes
    * hex sample, and the deterministic fake "decode" fields. */
  val m01BinaryMeta: GraftQuery = GraftQuery(
    "m01_binary_meta",
    "opaque binary column with typed metadata + stubbed deterministic decode",
    (s, dir) => {
      val bin = col("text").cast("binary")
      val nBytes = length(bin).cast("long")
      docs(s, dir).select(
        col("doc_id"),
        nBytes.as("n_bytes"),
        md5(bin).as("digest"),
        substring(hex(bin), 1, 16).as("head_hex"),
        // deterministic FAKE decode metadata (no media libs in this env):
        (nBytes % 3 + 1).cast("int").as("fake_channels"),
        (nBytes % 30 + 1).cast("int").as("fake_frames"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
      CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      md5(text) AS digest,
      left(hex(encode(text)), 16) AS head_hex,
      CAST(octet_length(encode(text)) % 3 + 1 AS INT) AS fake_channels,
      CAST(octet_length(encode(text)) % 30 + 1 AS INT) AS fake_frames
      FROM documents ORDER BY doc_id"""))

  /** m02 — frame sampling: 8 evenly-spaced byte offsets per payload exploded
    * to one row per frame — the partitioning/batch shape a video/audio
    * frame-sampler produces (each frame row then feeds the decode UDF). */
  val m02FrameSample: GraftQuery = GraftQuery(
    "m02_frame_sample",
    "explode binary payload into 8 evenly-spaced sampled frames (doc_id, frame_no, byte_hex)",
    (s, dir) => {
      val bin = col("text").cast("binary")
      val nBytes = length(bin).cast("long")
      docs(s, dir)
        .select(col("doc_id"), hex(bin).as("hx"),
          greatest(floor(nBytes / 8).cast("long"), lit(1L)).as("step"))
        .select(col("doc_id"),
          posexplode(transform(sequence(lit(0L), lit(7L)),
            f => col("hx").substr((f * col("step") * lit(2L) + lit(1L)).cast("int"),
              lit(2)))).as(Seq("frame_no", "byte_hex")))
        .orderBy(col("doc_id"), col("frame_no"))
    },
    Some("""SELECT doc_id, CAST(f AS INT) AS frame_no,
      substring(hex(encode(text)),
        CAST(f * greatest(octet_length(encode(text)) // 8, 1) * 2 + 1 AS BIGINT),
        2) AS byte_hex
      FROM documents, (SELECT unnest(generate_series(0, 7)) AS f)
      ORDER BY doc_id, frame_no"""))

  val all: Seq[GraftQuery] = Seq(m01BinaryMeta, m02FrameSample)
}
