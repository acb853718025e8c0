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

  /** Per-(band, bucket) candidate cap for m03/m04 — the e07 discipline
    * applied to the pHash bands: each bucket contributes at most this many
    * index-side members, picked as a portable-hash-ordered uniform
    * subsample, bounding candidate pairs at 4·MediaBandCap·n however
    * degenerate the signature distribution gets (an all-identical-media
    * corpus would otherwise make one bucket quadratic). 16-bit bands keep
    * real occupancy tiny (measured max 3 on the fixture), so the cap is
    * inactive at every tested scale and the Hamming ≤ 3 pigeonhole
    * guarantee is exact until a bucket exceeds it; past that, pairs become
    * a uniform-subsample approximation — mirrored exactly by the oracle. */
  val MediaBandCap: Int = 256

  /** DuckDB CTE chain reproducing `graft_phash` signatures, their 4×16-bit
    * bands, and the banded candidate pairs (with both signatures attached) —
    * shared by the m03 (pairs) and m04 (clusters) oracles. */
  private val phashCandSql: String = s"""grams AS (
        SELECT doc_id,
          ord(substring(text, i, 1)) AS b1,
          ord(substring(text, i + 1, 1)) AS b2
        FROM documents, LATERAL (SELECT unnest(generate_series(1, length(text) - 1)) AS i)),
      cnt1 AS (
        SELECT doc_id, (b1 * 31 + b2) % 64 AS k, count(*) AS c
        FROM grams GROUP BY 1, 2),
      cnt2 AS (
        SELECT doc_id, (b1 * 37 + b2 * 3) % 64 AS k, count(*) AS c
        FROM grams GROUP BY 1, 2),
      sig1 AS (
        SELECT a.doc_id,
          sum(CASE WHEN a.c > COALESCE(b.c, 0) THEN 1::BIGINT << a.k ELSE 0 END) AS sig
        FROM cnt1 a LEFT JOIN cnt1 b ON b.doc_id = a.doc_id AND b.k = a.k + 32
        WHERE a.k < 32 GROUP BY 1),
      sig2 AS (
        SELECT a.doc_id,
          sum(CASE WHEN a.c > COALESCE(b.c, 0) THEN 1::BIGINT << a.k ELSE 0 END) AS sig
        FROM cnt2 a LEFT JOIN cnt2 b ON b.doc_id = a.doc_id AND b.k = a.k + 32
        WHERE a.k < 32 GROUP BY 1),
      sigs AS (
        SELECT d.doc_id, COALESCE(s1.sig, 0) AS sig1, COALESCE(s2.sig, 0) AS sig2
        FROM documents d
        LEFT JOIN sig1 s1 ON s1.doc_id = d.doc_id
        LEFT JOIN sig2 s2 ON s2.doc_id = d.doc_id),
      bands AS (
        SELECT doc_id, sig1, sig2, bn,
          CASE bn WHEN 0 THEN sig1 & 65535 WHEN 1 THEN sig1 >> 16
                  WHEN 2 THEN sig2 & 65535 ELSE sig2 >> 16 END AS bv
        FROM sigs, LATERAL (SELECT unnest(generate_series(0, 3)) AS bn)),
      capped AS (
        SELECT doc_id, sig1, sig2, bn, bv FROM (
          SELECT doc_id, sig1, sig2, bn, bv,
            row_number() OVER (PARTITION BY bn, bv ORDER BY
              (${graft.functions.PortableHash.A(0)} * doc_id
                + ${graft.functions.PortableHash.B(0)})
                % ${graft.functions.PortableHash.P}, doc_id) AS brn
          FROM bands) WHERE brn <= $MediaBandCap),
      cand AS (
        SELECT DISTINCT LEAST(a.doc_id, b.doc_id) AS doc_a,
          GREATEST(a.doc_id, b.doc_id) AS doc_b,
          bit_count(xor(a.sig1, b.sig1)) + bit_count(xor(a.sig2, b.sig2)) AS hamming
        FROM bands a JOIN capped b
          ON a.bn = b.bn AND a.bv = b.bv AND a.doc_id <> b.doc_id
        WHERE bit_count(xor(a.sig1, b.sig1)) + bit_count(xor(a.sig2, b.sig2)) <= 3)"""

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

  /** m03 — perceptual near-duplicate pairs over the binary payload (the
    * multimodal analog of d10): a pHash-style 64-bit signature (two 32-bit
    * halves from byte-bigram histograms, native codegen expr `graft_phash`),
    * 4×16-bit LSH bands for candidate generation (pigeonhole: any pair
    * within Hamming 3 shares at least one of 4 bands), exact Hamming ≤ 3
    * verification via `bit_count(xor)` confined to band collisions.
    * Candidate work is Σ bucket² per band with each bucket capped at
    * [[MediaBandCap]] members (inactive at tested scales — see its doc),
    * never corpus²; the signature scan is one map-side
    * whole-stage-codegen projection — the d10 shape applied to opaque
    * media bytes. */
  val m03PhashNeardup: GraftQuery = GraftQuery(
    "m03_phash_neardup",
    "perceptual-hash near-dup pairs over binary payload: 4x16-bit bands + Hamming <= 3",
    (s, dir) => {
      val sigs = docs(s, dir)
        .select(col("doc_id"),
          call_function("graft_phash", col("text").cast("binary")).as("ph"))
        .select(col("doc_id"), col("ph.sig1").as("sig1"), col("ph.sig2").as("sig2"))
      val bands = sigs.select(col("doc_id"), col("sig1"), col("sig2"),
        posexplode(array(
          col("sig1").bitwiseAND(lit(65535L)), shiftright(col("sig1"), 16),
          col("sig2").bitwiseAND(lit(65535L)), shiftright(col("sig2"), 16)))
          .as(Seq("bn", "bv")))
      // Index side capped per bucket (uniform hash-ordered subsample); the
      // probe side stays full and pairs are canonicalized least/greatest,
      // so a pair survives if EITHER endpoint is in the other's subsample —
      // the same symmetric-union shape as e07's capped probe.
      val capW = org.apache.spark.sql.expressions.Window
        .partitionBy(col("bn"), col("bv"))
        .orderBy(((lit(graft.functions.PortableHash.A(0)) * col("doc_id")
          + lit(graft.functions.PortableHash.B(0)))
          % lit(graft.functions.PortableHash.P)).asc, col("doc_id"))
      val right = bands.withColumn("brn", row_number().over(capW))
        .filter(col("brn") <= MediaBandCap)
        .select(col("bn"), col("bv"), col("doc_id").as("doc_b"),
          col("sig1").as("s1b"), col("sig2").as("s2b"))
      bands.join(right, Seq("bn", "bv"))
        .filter(col("doc_id") =!= col("doc_b"))
        .withColumn("hamming",
          expr("bit_count(sig1 ^ s1b) + bit_count(sig2 ^ s2b)"))
        .filter(col("hamming") <= 3)
        .select(least(col("doc_id"), col("doc_b")).as("doc_a"),
          greatest(col("doc_id"), col("doc_b")).as("doc_b"),
          col("hamming").cast("int").as("hamming"))
        .distinct()
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some(s"""WITH $phashCandSql
      SELECT doc_a, doc_b, CAST(hamming AS INT) AS hamming
      FROM cand
      ORDER BY doc_a, doc_b"""))

  /** m04 — media dedup CLUSTERING: m03's pHash near-dup pairs promoted to
    * connected components (the d21 pattern applied to the binary modality) —
    * pairwise "these two images look alike" becomes transitive groups with
    * one canonical asset each, which is what a multimodal dedup pass
    * actually deletes against. Scale: identical to d21 — candidate pairs
    * from banded signatures (Σ bucket², never corpus²), then per-round one
    * edge equi-join + partial-aggregable min; at production scale the m03
    * pair table would be materialized once and both consumers (pair audit,
    * clustering) would read it. */
  val m04MediaDupClusters: GraftQuery = GraftQuery(
    "m04_media_dup_clusters",
    "media dedup clustering: connected components over pHash near-dup pairs",
    (s, dir) => {
      val pairs = m03PhashNeardup.run(s, dir)
        .select(col("doc_a"), col("doc_b"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      val nodes = docs(s, dir).select(col("doc_id").as("id"))
      val labels = graft.operators.ConnectedComponents.label(nodes, edges)
      val sizes = labels.groupBy(col("cluster"))
        .agg(count(lit(1)).as("cluster_size"))
      labels.join(sizes, "cluster")
        .select(col("id").as("doc_id"), col("cluster"), col("cluster_size"),
          (col("id") === col("cluster")).cast("int").as("is_canonical"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH RECURSIVE $phashCandSql,
      pairs AS (
        SELECT doc_a, doc_b FROM cand),
      edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM pairs),
      reach AS (
        SELECT doc_id AS id, doc_id AS reach FROM documents
        UNION
        SELECT r.id, e.dst AS reach FROM reach r JOIN edges e ON r.reach = e.src),
      lab AS (
        SELECT id AS doc_id, MIN(reach) AS cluster FROM reach GROUP BY id),
      sz AS (
        SELECT cluster, COUNT(*) AS cluster_size FROM lab GROUP BY cluster)
      SELECT l.doc_id, l.cluster, sz.cluster_size,
        CAST(l.doc_id = l.cluster AS INT) AS is_canonical
      FROM lab l JOIN sz USING (cluster)
      ORDER BY l.doc_id"""))

  /** Frames sampled and window width for m05. */
  private val NFrames = 8
  private val FrameW = 32

  /** m05 — cross-media frame-fingerprint overlap (the "same video, shifted
    * container" detector): [[NFrames]] evenly spaced [[FrameW]]-byte windows
    * per payload, each fingerprinted (md5), POSITIONALLY equi-joined across
    * media — two payloads match when ≥ 2 of their aligned frames collide.
    * This is the containment-style complement to m03: pHash finds "looks
    * alike overall", frame overlap finds "shares aligned content runs".
    * Scale: fingerprints are map-side; the join key (frame_no, digest) is
    * 128-bit-selective (measured max bucket 3, Σ bucket² ≈ 4k on the
    * fixture), so candidate work is Σ bucket², never corpus²; the overlap
    * count is one partial-aggregable groupBy on the pair key. */
  val m05FrameOverlap: GraftQuery = GraftQuery(
    "m05_frame_overlap",
    s"cross-media near-dup via positional frame-fingerprint overlap (>= 2 of $NFrames aligned frames)",
    (s, dir) => {
      val step = greatest(
        floor((length(col("text")) - lit(FrameW)).cast("double") / lit(NFrames - 1))
          .cast("long"), lit(1L))
      val frames = docs(s, dir)
        .select(col("doc_id"), col("text"), step.as("step"),
          posexplode(sequence(lit(0L), lit((NFrames - 1).toLong)))
            .as(Seq("fno", "_f")))
        .select(col("doc_id"), col("fno"),
          md5(col("text").substr((col("_f") * col("step") + 1).cast("int"),
            lit(FrameW)).cast("binary")).as("fp"))
      val right = frames.select(col("fno"), col("fp"),
        col("doc_id").as("doc_b"))
      frames.join(right, Seq("fno", "fp"))
        .filter(col("doc_id") < col("doc_b"))
        .groupBy(col("doc_id").as("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 2)
        .select(col("doc_a"), col("doc_b"), col("n_shared"),
          (col("n_shared").cast("double") / lit(NFrames.toDouble)).as("overlap"))
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some(s"""WITH f AS (
        SELECT doc_id, fno,
          md5(substring(text,
            CAST(fno * greatest((length(text) - $FrameW) // ${NFrames - 1}, 1)
              + 1 AS BIGINT), $FrameW)) AS fp
        FROM documents, (SELECT unnest(generate_series(0, ${NFrames - 1})) AS fno)),
      cand AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
        FROM f a JOIN f b
          ON a.fno = b.fno AND a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT doc_a, doc_b, n_shared,
        CAST(n_shared AS DOUBLE) / $NFrames AS overlap
      FROM cand WHERE n_shared >= 2
      ORDER BY doc_a, doc_b"""))

  /** m06 — REAL image decode on the binary path (closing the m01/m02
    * fake-decode gap as far as this container allows): each document is
    * rendered as a genuine binary P6 PPM image — `P6\n8 4\n255\n` + 96
    * RGB bytes from the text — and [[graft.functions.expr.HashOps.ppmDecode]]
    * parses those BYTES like any image library would: magic, whitespace-
    * delimited header ints, single post-maxval whitespace, exact payload
    * length, integer channel sums. Every 23rd document gets a corrupted
    * magic and must quarantine as NULL (the c01 PERMISSIVE discipline on
    * the binary path). Map-side only; the decode is one codegen'd JVM call
    * per row. The oracle cannot parse binary, so it PREDICTS the decode
    * from the construction — same discipline as c01's wire oracle. */
  val m06PpmDecode: GraftQuery = GraftQuery(
    "m06_ppm_decode",
    "real P6 PPM byte-level decode (native kernel) with malformed-payload quarantine",
    (s, dir) => {
      val payload = rpad(substring(col("text"), 1, 96), 96, "x")
      val header = when(col("doc_id") % 23 === 0, lit("Q6\n8 4\n255\n"))
        .otherwise(lit("P6\n8 4\n255\n"))
      docs(s, dir)
        .select(col("doc_id"), concat(header, payload).cast("binary").as("img"))
        .withColumn("dec", call_function("graft_ppm_decode", col("img")))
        .select(col("doc_id"),
          col("dec.width").as("width"), col("dec.height").as("height"),
          col("dec.maxval").as("maxval"), col("dec.mean_r").as("mean_r"),
          col("dec.mean_g").as("mean_g"), col("dec.mean_b").as("mean_b"),
          col("dec").isNull.as("is_corrupt"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH p AS (
        SELECT doc_id, rpad(substring(text, 1, 96), 96, 'x') AS pay
        FROM documents),
      px AS (
        SELECT doc_id,
          ord(substring(pay, 3 * (i - 1) + 1, 1)) AS r,
          ord(substring(pay, 3 * (i - 1) + 2, 1)) AS g,
          ord(substring(pay, 3 * (i - 1) + 3, 1)) AS b
        FROM p, LATERAL (SELECT unnest(generate_series(1, 32)) AS i)),
      agg AS (
        SELECT doc_id,
          CAST(SUM(r) AS DOUBLE) / 32 AS mean_r,
          CAST(SUM(g) AS DOUBLE) / 32 AS mean_g,
          CAST(SUM(b) AS DOUBLE) / 32 AS mean_b
        FROM px GROUP BY doc_id)
      SELECT d.doc_id,
        CASE WHEN d.doc_id % 23 = 0 THEN NULL ELSE 8 END AS width,
        CASE WHEN d.doc_id % 23 = 0 THEN NULL ELSE 4 END AS height,
        CASE WHEN d.doc_id % 23 = 0 THEN NULL ELSE 255 END AS maxval,
        CASE WHEN d.doc_id % 23 = 0 THEN NULL ELSE a.mean_r END AS mean_r,
        CASE WHEN d.doc_id % 23 = 0 THEN NULL ELSE a.mean_g END AS mean_g,
        CASE WHEN d.doc_id % 23 = 0 THEN NULL ELSE a.mean_b END AS mean_b,
        (d.doc_id % 23 = 0) AS is_corrupt
      FROM documents d JOIN agg a USING (doc_id)
      ORDER BY d.doc_id"""))

  val all: Seq[GraftQuery] =
    Seq(m01BinaryMeta, m02FrameSample, m03PhashNeardup, m04MediaDupClusters,
      m05FrameOverlap, m06PpmDecode)
}
