package graft.queries

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import Q._

/** Multimodal-column surface: binary payloads + typed metadata, frame
  * sampling via binary slicing, real container-header parsing, and —
  * since round 13 — the REAL media codecs: PNG pixel decode (q265),
  * PCM-WAV sample decode (q266), real-pixel grid features (q267) and
  * resize (q268), the sniff/decode/quarantine acceptance card (q269),
  * and windowed audio energy (q270). Every entry here is hash-checked
  * against a closed-form DuckDB oracle (the decoded content follows a
  * pixel/sample formula the oracle can state without any decoder);
  * q52's byte-histogram fingerprint is the deliberately container-
  * AGNOSTIC byte-level op (drift/triage/prefilter over opaque blobs,
  * no decode by design) — oracle-checked as arithmetic like the rest.
  */
object MultimodalQueries {

  private val DecodeDim = 16

  /** DuckDB twin of Multimodal.byteHistogramFeatures → norm: the fixture
    * text is pure ASCII (verified per scale factor), so byte == char and
    * `unicode(text[i])` reproduces the op's `(byte & 0xff)` exactly.
    * Parity discipline: the per-bin division is done in FLOAT (matching
    * the op's float hist), and the squared-norm sum is an explicit
    * left-associated `f0²+f1²+…` chain — the same index-order fold Spark's
    * `aggregate` HOF performs — so no aggregation-order nondeterminism. */
  private val q52Oracle = {
    val fcols = (0 until DecodeDim).map(j =>
      s"    CAST(CAST(count(*) FILTER (bin = $j) AS FLOAT)" +
        s" / CAST(any_value(n) AS FLOAT) AS FLOAT) AS f$j").mkString(",\n")
    val coal = (0 until DecodeDim).map(j =>
      s"    COALESCE(hv.f$j, CAST(0 AS FLOAT)) AS f$j").mkString(",\n")
    val ss = (0 until DecodeDim).map(j => s"f$j::DOUBLE * f$j::DOUBLE").mkString(" + ")
    // hv is LEFT-joined back to documents: range(1, len+1) yields no rows
    // for empty text, but the Spark op still emits a zero-norm feature
    // row for every asset — the join keeps row counts identical.
    s"""WITH chars AS (
       |  SELECT doc_id, greatest(len(text), 1) AS n,
       |    unicode(text[i]) % $DecodeDim AS bin
       |  FROM (SELECT doc_id, text, unnest(range(1, len(text)+1)) AS i FROM documents)
       |), hv AS (
       |  SELECT doc_id,
       |$fcols
       |  FROM chars GROUP BY doc_id
       |), feat AS (
       |  SELECT d.doc_id,
       |$coal
       |  FROM documents d LEFT JOIN hv ON hv.doc_id = d.doc_id
       |)
       |SELECT doc_id AS asset_id, $DecodeDim AS dim,
       |  round(sqrt($ss), 6) AS feat_norm
       |FROM feat ORDER BY asset_id""".stripMargin
  }

  val specs: Seq[QuerySpec] = Seq(

    // Asset metadata extraction over binary columns (all codegen'd
    // expressions; binary length/hash/derived dims).
    QuerySpec("q50_multimodal_meta",
      (s, d) => Multimodal.fakeAssets(t(s, d, "documents"))
        .join(t(s, d, "documents").select(col("doc_id"), col("text")),
          col("asset_id") === col("doc_id"))
        .select(
          col("asset_id"), col("modality"),
          length(col("bytes")).cast("long").as("n_bytes"),
          sha2(col("text"), 256).as("sha_hex"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          col("meta.n_frames").as("n_frames"))
        .orderBy("asset_id"),
      Some("""SELECT doc_id AS asset_id,
             |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
             |       ELSE 'video' END AS modality,
             |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             |  sha256(text) AS sha_hex,
             |  CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER) AS width,
             |  CAST(octet_length(encode(text)) % 480 + 1 AS INTEGER) AS height,
             |  CAST(octet_length(encode(text)) // 256 + 1 AS INTEGER) AS n_frames
             |FROM documents ORDER BY asset_id""".stripMargin)),

    // Frame sampling: fixed-size binary slices via codegen'd substring on
    // the payload — the video-frame / audio-chunk extraction shape.
    QuerySpec("q51_frame_sample",
      (s, d) => Multimodal.sampleFrames(
        Multimodal.fakeAssets(t(s, d, "documents")), frameBytes = 256)
        .select(col("asset_id"), col("frame_idx"),
          col("frame_len").cast("long").as("frame_len"))
        .orderBy("asset_id", "frame_idx"),
      Some("""SELECT doc_id AS asset_id, frame_idx,
             |  least(256, CAST(octet_length(encode(text)) AS BIGINT) - frame_idx*256) AS frame_len
             |FROM (SELECT doc_id, text,
             |        unnest(range((octet_length(encode(text)) + 255) // 256)) AS frame_idx
             |      FROM documents) x
             |ORDER BY asset_id, frame_idx""".stripMargin)),

    // Resize planning: target dimensions fitting 224×224 while preserving
    // aspect ratio — the metadata half of an image-resize stage (the real
    // pixel kernel is q268's resizePixels); identical double
    // arithmetic on both engines.
    QuerySpec("q53_resize_plan",
      (s, d) => {
        val a = Multimodal.fakeAssets(t(s, d, "documents"))
        val w = col("meta.width").cast("double")
        val h = col("meta.height").cast("double")
        val scale = least(lit(224.0) / w, lit(224.0) / h)
        a.select(col("asset_id"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          greatest(lit(1L), floor(w * scale)).as("out_w"),
          greatest(lit(1L), floor(h * scale)).as("out_h"))
          .orderBy("asset_id")
      },
      Some("""WITH m AS (
             |  SELECT doc_id AS asset_id,
             |    CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER) AS width,
             |    CAST(octet_length(encode(text)) % 480 + 1 AS INTEGER) AS height
             |  FROM documents
             |)
             |SELECT asset_id, width, height,
             |  CAST(greatest(1, floor(width * least(224.0 / width, 224.0 / height))) AS BIGINT) AS out_w,
             |  CAST(greatest(1, floor(height * least(224.0 / width, 224.0 / height))) AS BIGINT) AS out_h
             |FROM m ORDER BY asset_id""".stripMargin)),

    // Container-agnostic byte-level fingerprint: 16-bin histogram over
    // the ENCODED payload (no decode BY DESIGN — this is what drift
    // detection and corrupt-batch triage run on when the codec is
    // unknown or damaged; the real decoders are q265/q266). Deterministic
    // arithmetic → full SQL twin (hash-checked); the mapPartitions
    // execution shape is additionally pinned by MultimodalSpec.
    QuerySpec("q52_decode_features",
      (s, d) => {
        val feats = Multimodal.byteHistogramFeatures(
          Multimodal.fakeAssets(t(s, d, "documents")), dim = DecodeDim)
        feats.select(col("asset_id"), size(col("features")).as("dim"),
          round(sqrt(graft.functions.VectorFunctions.dot(
            col("features").cast("array<double>"),
            col("features").cast("array<double>"))), 6).as("feat_norm"))
          .orderBy("asset_id")
      },
      Some(q52Oracle)),

    // REAL container parsing: spec-conformant PNGs (chunked, CRC-32'd)
    // and PCM WAVs are synthesized in one codegen'd projection, then a
    // pure-JVM mapPartitions parser walks the binary back out — chunk
    // traversal, endian-correct field reads, CRC verification. The oracle
    // states every expected field arithmetically (it never parses), so a
    // builder/parser disagreement on ANY byte surfaces as a hash mismatch
    // — crc_ok=true is only reachable when the crc32 the builder embedded
    // matches the CRC-32 the parser recomputes over the traversed bytes.
    QuerySpec("q113_container_meta",
      (s, d) => Multimodal.parseContainerMeta(
        Multimodal.fakeContainers(t(s, d, "documents")))
        .orderBy("asset_id"),
      Some("""SELECT doc_id AS asset_id,
             |  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'wav' END AS format,
             |  CASE WHEN doc_id % 2 = 0 THEN CAST(doc_id % 640 + 16 AS INTEGER) END AS width,
             |  CASE WHEN doc_id % 2 = 0 THEN CAST(doc_id % 480 + 16 AS INTEGER) END AS height,
             |  CASE WHEN doc_id % 2 = 0 THEN CAST(8 AS INTEGER) END AS bit_depth,
             |  CASE WHEN doc_id % 2 = 0 THEN CAST(6 AS INTEGER) END AS color_type,
             |  CASE WHEN doc_id % 2 = 1 THEN CAST((doc_id // 2) % 2 + 1 AS INTEGER) END AS channels,
             |  CASE WHEN doc_id % 2 = 1 THEN CAST(([8000,16000,22050,44100])[CAST((doc_id // 2) % 4 + 1 AS INTEGER)] AS INTEGER) END AS sample_rate,
             |  CASE WHEN doc_id % 2 = 1 THEN CAST(16 AS INTEGER) END AS bits_per_sample,
             |  CAST(octet_length(encode(text)) AS BIGINT) AS data_len,
             |  CASE WHEN doc_id % 2 = 0 THEN TRUE END AS crc_ok
             |FROM documents ORDER BY asset_id""".stripMargin)),

    // REAL PNG pixel decode, end to end: encode a formula image per doc
    // (RGBA8, every scanline filtered with type y%5 so the decoder must
    // implement all FIVE PNG reconstructions, genuine zlib IDAT), then
    // decode it back — chunk walk + CRC verify + inflate + unfilter —
    // and publish exact per-channel pixel sums. The oracle never touches
    // a decoder: the pixel formula is closed-form arithmetic, so DuckDB
    // recomputes the sums directly and any defect anywhere in the
    // filter/deflate/inflate/unfilter round trip breaks the hash. The
    // codec is additionally cross-validated against the JDK's own
    // ImageIO decoder in MultimodalSpec. Scale shape: per-partition
    // mapPartitions encode/decode (the per-task codec-init shape), one
    // pass, no shuffle beyond the final sort.
    QuerySpec("q265_png_decode",
      (s, d) => graft.multimodal.Multimodal.decodePngStats(
        graft.multimodal.Multimodal.buildDecodablePngs(
          t(s, d, "documents"), "doc_id"))
        .orderBy("asset_id"),
      Some("""WITH xs AS (
             |  SELECT doc_id, unnest(range(16 + doc_id % 8)) AS x
             |  FROM documents
             |), ys AS (
             |  SELECT doc_id, unnest(range(12 + doc_id % 5)) AS y
             |  FROM documents
             |), px AS (
             |  SELECT xs.doc_id, x, y
             |  FROM xs JOIN ys ON xs.doc_id = ys.doc_id
             |), st AS (
             |  SELECT doc_id AS asset_id, count(*) AS n_px,
             |    CAST(sum((doc_id + 3 * x + 5 * y) % 256) AS BIGINT)
             |      AS sum_r,
             |    CAST(sum((2 * doc_id + 7 * x + y) % 256) AS BIGINT)
             |      AS sum_g,
             |    CAST(sum((5 * doc_id + x + 11 * y) % 256) AS BIGINT)
             |      AS sum_b,
             |    CAST(sum((doc_id + x * y) % 256) AS BIGINT) AS sum_a
             |  FROM px GROUP BY 1
             |)
             |SELECT asset_id, CAST(16 + asset_id % 8 AS INTEGER) AS width,
             |  CAST(12 + asset_id % 5 AS INTEGER) AS height, n_px,
             |  sum_r, sum_g, sum_b, sum_a
             |FROM st ORDER BY asset_id""".stripMargin)),

    // REAL PCM-WAV sample decode, end to end: encode formula int16
    // samples into canonical 44-byte-header WAVs, decode them back
    // (RIFF subchunk walk, PCM-16 enforcement, ByteBuffer extraction)
    // and publish exact waveform statistics incl. the zero-crossing
    // count — the classic cheap audio-activity feature. The oracle
    // recomputes everything from the sample formula (lag window for the
    // crossings) without touching a decoder; the decoder is also
    // cross-validated against the JDK's own javax.sound WAV reader in
    // MultimodalSpec. Same per-partition codec shape and poison-pill
    // posture as the PNG path.
    QuerySpec("q266_wav_decode",
      (s, d) => graft.multimodal.Multimodal.decodeWavStats(
        graft.multimodal.Multimodal.buildPcmWavs(
          t(s, d, "documents"), "doc_id"))
        .orderBy("asset_id"),
      Some("""WITH ss AS (
             |  SELECT doc_id, unnest(range(800 + (doc_id % 50) * 2)) AS i
             |  FROM documents
             |), sv AS (
             |  SELECT doc_id, i,
             |    (7 * doc_id + 13 * i) % 65536 - 32768 AS s
             |  FROM ss
             |), zz AS (
             |  SELECT doc_id, s,
             |    CASE WHEN lag(s) OVER w IS NOT NULL
             |      AND ((s < 0) <> (lag(s) OVER w < 0))
             |      THEN 1 ELSE 0 END AS z
             |  FROM sv WINDOW w AS (PARTITION BY doc_id ORDER BY i)
             |)
             |SELECT doc_id AS asset_id,
             |  CAST(1 + doc_id % 2 AS INTEGER) AS channels,
             |  CAST(([8000, 16000, 22050, 44100])[CAST(doc_id % 4 + 1
             |    AS INTEGER)] AS INTEGER) AS sample_rate,
             |  CAST(800 + (doc_id % 50) * 2 AS BIGINT) AS n_samples,
             |  CAST(sum(s) AS BIGINT) AS sum_s,
             |  CAST(min(s) AS BIGINT) AS min_s,
             |  CAST(max(s) AS BIGINT) AS max_s,
             |  CAST(sum(z) AS BIGINT) AS zero_cross
             |FROM zz GROUP BY doc_id ORDER BY asset_id""".stripMargin)),

    // REAL image feature extraction over DECODED pixels: 2×2 grid of
    // exact per-cell channel sums (the mean-pooled patch-embedding
    // shape) — the features ride the genuinely decoded image, not the
    // payload bytes. The oracle groups the pixel formula by the same
    // ⌊x·2/w⌋/⌊y·2/h⌋ cell map, so a defect in the decoder OR the
    // pooling breaks the hash.
    QuerySpec("q267_image_grid_features",
      (s, d) => graft.multimodal.Multimodal.pngGridFeatures(
        graft.multimodal.Multimodal.buildDecodablePngs(
          t(s, d, "documents"), "doc_id"), gx = 2, gy = 2)
        .orderBy("asset_id", "cx", "cy"),
      Some("""WITH xs AS (
             |  SELECT doc_id, unnest(range(16 + doc_id % 8)) AS x
             |  FROM documents
             |), ys AS (
             |  SELECT doc_id, unnest(range(12 + doc_id % 5)) AS y
             |  FROM documents
             |), px AS (
             |  SELECT xs.doc_id, x, y FROM xs JOIN ys
             |    ON xs.doc_id = ys.doc_id
             |)
             |SELECT doc_id AS asset_id,
             |  CAST(x * 2 // (16 + doc_id % 8) AS INTEGER) AS cx,
             |  CAST(y * 2 // (12 + doc_id % 5) AS INTEGER) AS cy,
             |  count(*) AS n_px,
             |  CAST(sum((doc_id + 3 * x + 5 * y) % 256) AS BIGINT)
             |    AS sum_r,
             |  CAST(sum((2 * doc_id + 7 * x + y) % 256) AS BIGINT)
             |    AS sum_g,
             |  CAST(sum((5 * doc_id + x + 11 * y) % 256) AS BIGINT)
             |    AS sum_b,
             |  CAST(sum((doc_id + x * y) % 256) AS BIGINT) AS sum_a
             |FROM px GROUP BY 1, 2, 3
             |ORDER BY asset_id, cx, cy""".stripMargin)),

    // REAL nearest-neighbor resize over DECODED pixels — the pixel half
    // of the q53 resize plan: out(x',y') = in(⌊x'w/8⌋, ⌊y'h/6⌋),
    // published as exact channel sums of the 8×6 result. The oracle
    // samples the pixel formula at the mapped coordinates directly.
    QuerySpec("q268_image_resize",
      (s, d) => graft.multimodal.Multimodal.pngResizeStats(
        graft.multimodal.Multimodal.buildDecodablePngs(
          t(s, d, "documents"), "doc_id"), ow = 8, oh = 6)
        .orderBy("asset_id"),
      Some("""WITH xo AS (
             |  SELECT doc_id, unnest(range(8)) AS x FROM documents
             |), yo AS (
             |  SELECT doc_id, unnest(range(6)) AS y FROM documents
             |), m AS (
             |  SELECT xo.doc_id,
             |    x * (16 + xo.doc_id % 8) // 8 AS sx,
             |    y * (12 + xo.doc_id % 5) // 6 AS sy
             |  FROM xo JOIN yo ON xo.doc_id = yo.doc_id
             |)
             |SELECT doc_id AS asset_id, CAST(8 AS INTEGER) AS width,
             |  CAST(6 AS INTEGER) AS height, count(*) AS n_px,
             |  CAST(sum((doc_id + 3 * sx + 5 * sy) % 256) AS BIGINT)
             |    AS sum_r,
             |  CAST(sum((2 * doc_id + 7 * sx + sy) % 256) AS BIGINT)
             |    AS sum_g,
             |  CAST(sum((5 * doc_id + sx + 11 * sy) % 256) AS BIGINT)
             |    AS sum_b,
             |  CAST(sum((doc_id + sx * sy) % 256) AS BIGINT) AS sum_a
             |FROM m GROUP BY 1 ORDER BY asset_id""".stripMargin)),

    // The MEDIA ACCEPTANCE CARD — the ingestion gate a mixed multimodal
    // column ships with: format sniff → REAL decode → per-bucket census
    // (healthy png/wav with decoded volume + exact content checksum;
    // corrupt assets quarantined by failure mode, never killing a
    // task). The fixture is deterministically damaged (every id ≡ 0
    // mod 7: PNGs get one IDAT byte flipped → CRC mismatch, WAVs are
    // truncated below their header), so the oracle states every
    // asset's classification AND the healthy buckets' checksums in
    // closed form — the full sniff/decode/quarantine pipeline is
    // hash-checked.
    QuerySpec("q269_media_card",
      (s, d) => graft.multimodal.Multimodal.classifyMedia(
        graft.multimodal.Multimodal.buildMixedMedia(
          t(s, d, "documents"), "doc_id"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_assets"),
          sum(col("n_units")).as("sum_units"),
          sum(col("checksum")).as("sum_checksum"))
        .orderBy("bucket"),
      Some("""WITH xs AS (
             |  SELECT doc_id, unnest(range(16 + doc_id % 8)) AS x
             |  FROM documents WHERE doc_id % 2 = 0 AND doc_id % 7 <> 0
             |), ys AS (
             |  SELECT doc_id, unnest(range(12 + doc_id % 5)) AS y
             |  FROM documents WHERE doc_id % 2 = 0 AND doc_id % 7 <> 0
             |), px AS (
             |  SELECT xs.doc_id, x, y FROM xs JOIN ys
             |    ON xs.doc_id = ys.doc_id
             |), pok AS (
             |  SELECT doc_id, count(*) AS n_units,
             |    CAST(sum((doc_id + 3 * x + 5 * y) % 256
             |      + (2 * doc_id + 7 * x + y) % 256
             |      + (5 * doc_id + x + 11 * y) % 256
             |      + (doc_id + x * y) % 256) AS BIGINT) AS checksum
             |  FROM px GROUP BY 1
             |), ss AS (
             |  SELECT doc_id, unnest(range(800 + (doc_id % 50) * 2)) AS i
             |  FROM documents WHERE doc_id % 2 = 1 AND doc_id % 7 <> 0
             |), wok AS (
             |  SELECT doc_id, count(*) AS n_units,
             |    CAST(sum((7 * doc_id + 13 * i) % 65536 - 32768)
             |      AS BIGINT) AS checksum
             |  FROM ss GROUP BY 1
             |), cls AS (
             |  SELECT d.doc_id,
             |    CASE WHEN d.doc_id % 7 = 0 THEN
             |           CASE WHEN d.doc_id % 2 = 0 THEN 'png_corrupt'
             |                ELSE 'wav_corrupt' END
             |         WHEN d.doc_id % 2 = 0 THEN 'png' ELSE 'wav'
             |    END AS bucket,
             |    COALESCE(pok.n_units, wok.n_units, 0) AS n_units,
             |    COALESCE(pok.checksum, wok.checksum, 0) AS checksum
             |  FROM documents d
             |  LEFT JOIN pok ON pok.doc_id = d.doc_id
             |  LEFT JOIN wok ON wok.doc_id = d.doc_id
             |)
             |SELECT bucket, count(*) AS n_assets,
             |  CAST(sum(n_units) AS BIGINT) AS sum_units,
             |  CAST(sum(checksum) AS BIGINT) AS sum_checksum
             |FROM cls GROUP BY bucket ORDER BY bucket""".stripMargin)),

    // REAL audio feature extraction over DECODED samples: per 200-sample
    // window, exact L1 energy (Σ|s|) and peak (max|s|) — the cheap
    // activity/silence profile a speech pipeline segments on, riding the
    // genuinely decoded PCM stream. The oracle buckets the sample
    // formula by the same i DIV 200 window map.
    QuerySpec("q270_audio_energy",
      (s, d) => graft.multimodal.Multimodal.wavEnergyWindows(
        graft.multimodal.Multimodal.buildPcmWavs(
          t(s, d, "documents"), "doc_id"), win = 200)
        .orderBy("asset_id", "w"),
      Some("""WITH ss AS (
             |  SELECT doc_id, unnest(range(800 + (doc_id % 50) * 2)) AS i
             |  FROM documents
             |), sv AS (
             |  SELECT doc_id, i // 200 AS w,
             |    abs((7 * doc_id + 13 * i) % 65536 - 32768) AS a
             |  FROM ss
             |)
             |SELECT doc_id AS asset_id, w, count(*) AS n_samples,
             |  CAST(sum(a) AS BIGINT) AS sum_abs,
             |  CAST(max(a) AS BIGINT) AS max_abs
             |FROM sv GROUP BY 1, 2 ORDER BY asset_id, w""".stripMargin))
  )
}
