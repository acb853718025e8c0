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

  /** DuckDB CTE chain reproducing `graft_phash` signatures and their
    * 4×16-bit bands (`grams` → … → `bands`) — the prefix shared by the
    * m03/m04/m08 candidate chain below and by s29's media-admission oracle
    * (which needs the band keys, not the pairwise candidates). */
  private[queries] val phashBandsSql: String = s"""grams AS (
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
        FROM sigs, LATERAL (SELECT unnest(generate_series(0, 3)) AS bn))"""

  /** Banded candidate pairs (with both signatures attached) at a given
    * exact-Hamming cut — shared by the m03 (pairs) and m04 (clusters)
    * oracles at Hamming ≤ 3 and by m08's evidence table at the relaxed
    * [[JointHamming]] cut. */
  private def phashCandSqlAt(maxHamming: Int): String = s"""$phashBandsSql,
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
        WHERE bit_count(xor(a.sig1, b.sig1)) + bit_count(xor(a.sig2, b.sig2)) <= $maxHamming)"""

  private val phashCandSql: String = phashCandSqlAt(3)

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
  /** Banded pHash candidate pairs at a given exact-Hamming cut — m03's
    * machinery shared with m08's relaxed-evidence pass: map-side signature
    * kernel, 4×16-bit bands, per-bucket [[MediaBandCap]] index-side cap,
    * `bit_count(xor)` verification confined to band collisions, pairs
    * canonicalized (doc_a < doc_b) and distinct. Returns
    * (doc_a, doc_b, hamming: int), unordered. */
  private def phashCandidates(s: org.apache.spark.sql.SparkSession,
                              dir: String, maxHamming: Int) = {
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
      .filter(col("hamming") <= maxHamming)
      .select(least(col("doc_id"), col("doc_b")).as("doc_a"),
        greatest(col("doc_id"), col("doc_b")).as("doc_b"),
        col("hamming").cast("int").as("hamming"))
      .distinct()
  }

  val m03PhashNeardup: GraftQuery = GraftQuery(
    "m03_phash_neardup",
    "perceptual-hash near-dup pairs over binary payload: 4x16-bit bands + Hamming <= 3",
    (s, dir) => phashCandidates(s, dir, 3).orderBy(col("doc_a"), col("doc_b")),
    Some(s"""WITH $phashCandSql
      SELECT doc_a, doc_b, CAST(hamming AS INT) AS hamming
      FROM cand
      ORDER BY doc_a, doc_b"""))

  /** Materialized MEDIA dedup labels, built once per corpus directory and
    * shared by m04 and m07 — the [[SimilarityQueries.clusterLabels]]
    * discipline applied to the binary modality: cluster assignment is INDEX
    * structure (a multimodal dedup deployment materializes media cluster
    * ids next to the pHash tables), and before this table each consumer
    * re-ran the pHash candidate join AND the pointer-jumping CC at query
    * time (m04 measured 5.9 s at sf0.1, dominated by the per-round driver
    * loop, for labels that are a pure function of the signature table).
    * The path map memoizes per JVM; the data lives on disk. */
  private val mediaLabelDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def mediaLabels(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val path = mediaLabelDirs.computeIfAbsent(dir, { _ =>
      val out = graft.streaming.StreamHarness.tempDir("mlab")
      val pairs = m03PhashNeardup.run(s, dir).select(col("doc_a"), col("doc_b"))
      val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      val nodes = docs(s, dir).select(col("doc_id").as("id"))
      graft.operators.ConnectedComponents.label(nodes, edges)
        .write.mode("overwrite").parquet(out)
      out
    })
    s.read.parquet(path)
  }

  /** m04 — media dedup CLUSTERING: m03's pHash near-dup pairs promoted to
    * connected components (the d21 pattern applied to the binary modality) —
    * pairwise "these two images look alike" becomes transitive groups with
    * one canonical asset each, which is what a multimodal dedup pass
    * actually deletes against. Scale: identical to d21 — candidate pairs
    * from banded signatures (Σ bucket², never corpus²), then per-round one
    * edge equi-join + partial-aggregable min — and since r12 the labels are
    * a MATERIALIZED per-directory table ([[mediaLabels]]) shared with m07,
    * so the query itself is one cluster-keyed shuffle over n label rows. */
  val m04MediaDupClusters: GraftQuery = GraftQuery(
    "m04_media_dup_clusters",
    "media dedup clustering: connected components over pHash near-dup pairs",
    (s, dir) => {
      val labels = mediaLabels(s, dir)
      val sizes = labels.groupBy(col("cluster"))
        .agg(count(lit(1)).as("cluster_size"))
      labels.join(sizes, "cluster")
        .select(col("id").as("doc_id"), col("cluster"), col("cluster_size"),
          (col("id") === col("cluster")).cast("int").as("is_canonical"))
        .orderBy(col("doc_id"))
    },
    Some(GraftQuery.materializeCtes(s"""WITH RECURSIVE $phashCandSql,
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
      ORDER BY l.doc_id""")))

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

  /** Namespace offsets for the bipartite doc↔cluster nodes in m07's union
    * graph — far above any doc_id (2^40, 2^41), so the component's min id
    * is always a real document and the CC label doubles as the canonical
    * asset id. */
  private val MClusterBase = 1099511627776L
  private val TClusterBase = 2199023255552L

  /** m07 — CROSS-MODAL duplicate unification (VERDICT r11 next #3): m04's
    * media dup clusters and e15's text-embedding dup clusters are separate
    * tables, so a pipeline deleting per-modality would decide the SAME
    * asset twice — and miss transitive duplicates entirely: if A's text
    * duplicates B's text while B's image duplicates C's image, the pair
    * (A, C) is one duplicate asset group that NEITHER family flags alone.
    * This operator joins the two cluster tables into one asset-level
    * keep/drop: connected components over the bipartite doc↔cluster
    * membership graph (doc → its media cluster node, doc → its text cluster
    * node), labeling each asset with its unified group's canonical doc.
    * Documents without embeddings (the sf0.1 shape — the corpus contract
    * lets the text leg lag the media leg) ride on their media edges alone.
    *
    * Scale design: both inputs are the MATERIALIZED per-directory label
    * tables (m04's CC labels, e15's ptau-only labels — index structure,
    * built once); the unified components are fully determined by which
    * (media cluster, text cluster) pairs co-occur on an asset, so the CC
    * runs on the CLUSTER graph — one node per cluster, one edge per
    * distinct co-membership pair (≤ n, typically ≪ n) — with
    * log-diameter pointer-jumping rounds over cluster-count-sized tables;
    * docs attach to their component by one mcluster-keyed join afterwards.
    * Never a pairwise expansion of cluster members (within-cluster doc-doc
    * edges would be Σ cluster² rows; co-membership edges are linear by
    * construction). */
  val m07CrossmodalDedup: GraftQuery = GraftQuery(
    "m07_crossmodal_dedup",
    "cross-modal dup unification: one asset-level keep/drop from media (m04) + text-embedding (e15) clusters",
    (s, dir) => {
      val media = mediaLabels(s, dir)
        .select(col("id").as("doc_id"), col("cluster").as("mcluster"))
      val text = SimilarityQueries.clusterLabels(s, dir, ptauOnly = true)
        .select(col("id").as("doc_id"), col("cluster").as("tcluster"))
      val assets = media.join(text, Seq("doc_id"), "left")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // CC over the CLUSTER graph, not the 3n-row doc↔cluster bipartite
      // graph (optimization r18, guide §2.3 shuffle keys/metadata instead
      // of payloads): the unified components are fully determined by which
      // (media cluster, text cluster) pairs co-occur on an asset, so the
      // per-round join/aggregate shuffles cluster-count-sized tables and
      // the paths are HALF as long (doc hops gone — one fewer halving
      // round; measured 9 → 8 rounds, rows per round ≪ 3n at every scale).
      // The label algebra survives unchanged: every doc d has
      // mcluster(d) ≤ d with mcluster(d) in d's unified component, so
      // min doc id of a component = min mcluster in it; m-node ids
      // (mcluster + 2⁴⁰) sort below every t-node id (tcluster + 2⁴¹), so
      // the CC label of an m-node minus the namespace base IS the unified
      // canonical doc. Pinned row-for-row vs the bipartite formulation by
      // CrossmodalDedupSpec (transitive A–C chain + canonical uniqueness)
      // and M07ClusterGraphSpec; the oracle stays the full doc-level
      // recursion.
      val mt = assets.filter(col("tcluster").isNotNull)
        .select((col("mcluster") + lit(MClusterBase)).as("src"),
          (col("tcluster") + lit(TClusterBase)).as("dst"))
        .distinct()
      val edges = mt.union(mt.select(col("dst").as("src"), col("src").as("dst")))
      val nodes = assets.select((col("mcluster") + lit(MClusterBase)).as("id"))
        .distinct()
        .union(mt.select(col("dst").as("id")).distinct())
      val mLabels = graft.operators.ConnectedComponents.label(nodes, edges)
        .filter(col("id") < TClusterBase)
        .select((col("id") - MClusterBase).as("mcluster"),
          (col("cluster") - MClusterBase).as("cluster"))
      val labels = assets.join(mLabels, Seq("mcluster"))
        .select(col("doc_id"), col("cluster"))
      val sizes = labels.groupBy(col("cluster"))
        .agg(count(lit(1)).as("cluster_size"))
      labels.join(sizes, "cluster")
        .join(assets, Seq("doc_id"))
        .select(col("doc_id"), col("mcluster"), col("tcluster"), col("cluster"),
          col("cluster_size"),
          (col("doc_id") === col("cluster")).cast("int").as("is_canonical"))
        .orderBy(col("doc_id"))
    },
    // Round-13 gate fix (VERDICT r12 #1): the nested m04/e15 oracles in
    // `mlab`/`tlab` MUST be materialized — un-materialized, DuckDB re-runs
    // both full recursive sub-oracles on every `ureach` iteration (787 s at
    // sf0.01, ~1500× every sibling; the round-12 empty-gate root cause).
    Some(GraftQuery.materializeCtes(s"""WITH RECURSIVE mlab AS (
        SELECT doc_id, cluster AS mcluster FROM (${m04MediaDupClusters.oracle.get})),
      tlab AS (
        SELECT vec_id AS doc_id, grp AS tcluster
        FROM (${SimilarityQueries.e15Semdedup.oracle.get})),
      assets AS (
        SELECT m.doc_id, m.mcluster, t.tcluster
        FROM mlab m LEFT JOIN tlab t USING (doc_id)),
      fwd AS (
        SELECT doc_id AS src, mcluster + $MClusterBase AS dst FROM assets
        UNION ALL
        SELECT doc_id, tcluster + $TClusterBase FROM assets
        WHERE tcluster IS NOT NULL),
      bedges AS (
        SELECT src, dst FROM fwd UNION ALL SELECT dst, src FROM fwd),
      ureach AS (
        SELECT doc_id AS id, doc_id AS ur FROM assets
        UNION
        SELECT r.id, e.dst AS ur FROM ureach r JOIN bedges e ON r.ur = e.src),
      ulab AS (SELECT id AS doc_id, MIN(ur) AS cluster FROM ureach GROUP BY id),
      usz AS (SELECT cluster, COUNT(*) AS cluster_size FROM ulab GROUP BY cluster)
      SELECT a.doc_id, a.mcluster, a.tcluster, l.cluster, usz.cluster_size,
        CAST(a.doc_id = l.cluster AS INT) AS is_canonical
      FROM assets a JOIN ulab l USING (doc_id) JOIN usz USING (cluster)
      ORDER BY a.doc_id""")))

  /** Relaxed Hamming cut for m08's joint-evidence pass: pairs this close in
    * pHash space are "media-suspicious" without clearing m03's ≤ 3 dup bar.
    * Candidates at 4–6 bits are found when a band still collides — the
    * pigeonhole guarantee covers ≤ 3 exactly; beyond it recall is the
    * banding's, the documented m03 trade — so m08 scores evidence on the
    * SAME candidate stream the media family already generates. */
  val JointHamming: Int = 6

  /** Text-cosine floor for joint evidence — deliberately below
    * [[SimilarityQueries.SemTau]] (0.38): alone it proves nothing, which is
    * the point — it only fires TOGETHER with a sub-threshold media signal. */
  val JointTau: Double = 0.30

  /** m08 — CROSS-MODAL EVIDENCE pairs: m07 unifies the per-modality
    * verdicts transitively, but a pair whose text similarity and media
    * similarity are each just UNDER their own family's threshold is still
    * invisible — weak evidence in two independent modalities is strong
    * evidence about the asset. This table scores every banded media
    * candidate (Hamming ≤ [[JointHamming]]) with BOTH signals and keeps the
    * pairs with any evidence: `media` (Hamming ≤ 3, m03's bar), `text`
    * (cosine ≥ SemTau, e15's bar), `both`, or `joint` (neither bar alone,
    * but Hamming ≤ 6 AND cosine ≥ [[JointTau]]). Assets without embeddings
    * carry a NULL cosine and can only present media evidence.
    *
    * Scale: the candidate stream is m03's banded join (Σ bucket² with the
    * [[MediaBandCap]] cap — never corpus²); the text signal is two keyed
    * LEFT joins against the embeddings table plus one left-fold dot per
    * candidate — per-pair bounded work, no new shuffle class. Cosines are
    * the engine-portable fold, so evidence classes replay exactly in
    * DuckDB. */
  val m08CrossmodalEvidence: GraftQuery = GraftQuery(
    "m08_crossmodal_evidence",
    s"cross-modal evidence pairs: media (<=3) / text (>=${SimilarityQueries.SemTau}) / joint (<=$JointHamming & >=$JointTau) classes over banded candidates",
    (s, dir) => {
      // The r17 join tree is the measured optimum and stays: per-vector
      // transform+norm on the (small) embeddings side, computed ONCE per
      // vector at broadcast build. Two r18 alternatives were measured and
      // REJECTED — a Bloom prefilter of the embeddings scan by candidate
      // ids (its build actions cost more than the joins save at every
      // bench scale) and a raw-float join with per-candidate transforms
      // (candidates outnumber vectors ~128:1 at sf0.1 — 257k pairs vs 2k
      // vectors — so per-candidate work is the WRONG side of the join).
      // See OPTIMIZATION_r18.md for the numbers.
      val cand = phashCandidates(s, dir, JointHamming)
      val emb = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("ve"))
        .withColumn("nrm", sqrt(call_function("graft_dot", col("ve"), col("ve"))))
      val ea = emb.select(col("vec_id").as("doc_a"), col("ve").as("va"),
        col("nrm").as("na"))
      val eb = emb.select(col("vec_id").as("doc_b"), col("ve").as("vb"),
        col("nrm").as("nb"))
      val scored = cand
        .join(ea, Seq("doc_a"), "left")
        .join(eb, Seq("doc_b"), "left")
        .withColumn("cosine",
          when(col("va").isNotNull && col("vb").isNotNull,
            call_function("graft_dot", col("va"), col("vb"))
              / (col("na") * col("nb"))))
        .withColumn("media_dup", col("hamming") <= 3)
        .withColumn("text_dup",
          coalesce(col("cosine") >= SimilarityQueries.SemTau, lit(false)))
        .withColumn("joint_dup",
          !col("media_dup") && !col("text_dup") &&
            coalesce(col("cosine") >= JointTau, lit(false)))
      // sortedOnce (optimization r18): the presentation sort's range
      // sampler re-executes its child, and here the child's work ABOVE the
      // last exchange — the two broadcast probes, the cosine dot, and the
      // evidence filter over the FULL ~257k-pair candidate volume — is the
      // query's dominant cost. Persisting the (tiny, post-filter) result
      // shares one evaluation between the sample and output passes.
      GraftQuery.sortedOnce(scored
        .filter(col("media_dup") || col("text_dup") || col("joint_dup"))
        .select(col("doc_a"), col("doc_b"), col("hamming"), col("cosine"),
          when(col("media_dup") && col("text_dup"), "both")
            .when(col("media_dup"), "media")
            .when(col("text_dup"), "text")
            .otherwise("joint").as("evidence")),
        col("doc_a"), col("doc_b"))
    },
    Some {
      val dot = (a: String, b: String) =>
        s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(list_zip($a, $b), p -> p[1] * p[2])), (x, y) -> x + y)"""
      s"""WITH ${phashCandSqlAt(JointHamming)},
      xv AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
        FROM embeddings),
      xn AS (
        SELECT vec_id, ve,
          sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list_transform(ve, x -> x * x)), (a, b) -> a + b)) AS nrm
        FROM xv),
      xscored AS (
        SELECT c.doc_a, c.doc_b, CAST(c.hamming AS INT) AS hamming,
          CASE WHEN a.vec_id IS NOT NULL AND b.vec_id IS NOT NULL
               THEN ${dot("a.ve", "b.ve")} / (a.nrm * b.nrm) END AS cosine,
          c.hamming <= 3 AS media_dup,
          COALESCE(
            CASE WHEN a.vec_id IS NOT NULL AND b.vec_id IS NOT NULL
                 THEN ${dot("a.ve", "b.ve")} / (a.nrm * b.nrm) END
              >= ${SimilarityQueries.SemTau}, FALSE) AS text_dup
        FROM cand c
        LEFT JOIN xn a ON a.vec_id = c.doc_a
        LEFT JOIN xn b ON b.vec_id = c.doc_b),
      xcls AS (
        SELECT *, (NOT media_dup) AND (NOT text_dup)
          AND COALESCE(cosine >= $JointTau, FALSE) AS joint_dup
        FROM xscored)
      SELECT doc_a, doc_b, hamming, cosine,
        CASE WHEN media_dup AND text_dup THEN 'both'
             WHEN media_dup THEN 'media'
             WHEN text_dup THEN 'text'
             ELSE 'joint' END AS evidence
      FROM xcls
      WHERE media_dup OR text_dup OR joint_dup
      ORDER BY doc_a, doc_b"""
    })

  val all: Seq[GraftQuery] =
    Seq(m01BinaryMeta, m02FrameSample, m03PhashNeardup, m04MediaDupClusters,
      m05FrameOverlap, m06PpmDecode, m07CrossmodalDedup, m08CrossmodalEvidence)
}
