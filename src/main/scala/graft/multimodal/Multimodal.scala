package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.BinaryFunctions._

/** Multimodal-column plumbing: images/audio/video ride through the engine as
  * opaque `binary` columns plus a typed metadata struct; decode/feature
  * steps are per-partition batch operations.
  *
  * Container HEADER handling is real: [[fakeContainers]] synthesizes
  * spec-conformant PNG and PCM-WAV files (MultimodalSpec cross-validates
  * the PNGs with the JDK's own ImageIO reader) and [[parseContainerMeta]]
  * walks chunks/subchunks back out with CRC verification. The PNG PIXEL
  * path is ALSO real (round 13): [[encodePng]]/[[decodePngStats]] are a
  * complete pure-JVM RGBA8 codec — per-scanline filtering across all five
  * PNG filter types, a genuine zlib stream via java.util.zip, chunk CRC
  * verification on decode — proven by a closed-form oracle (q265) and
  * cross-validated against the JDK's own ImageIO decoder; the WAV
  * sample path likewise (q266, javax.sound cross-validation). Alongside
  * the real codecs, [[byteHistogramFeatures]] is the deliberately
  * container-AGNOSTIC byte-level fingerprint — it reads the encoded
  * payload without decoding BY DESIGN (format drift detection,
  * corrupt-batch triage, and near-dup prefiltering must work on blobs
  * whose codec is unknown or damaged — exactly the rows the decoders
  * reject).
  */
object Multimodal {

  /** Canonical asset schema: id + modality + raw bytes + typed metadata. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("sample_rate", IntegerType))))))

  /** Build a deterministic fake asset table from the documents fixture:
    * UTF-8 bytes stand in for encoded media; metadata is derived
    * arithmetically from the payload so it is reproducible anywhere. */
  def fakeAssets(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      encode(col("text"), "UTF-8").as("bytes"))
      .withColumn("meta", struct(
        (length(col("bytes")) % 640 + 1).cast("int").as("width"),
        (length(col("bytes")) % 480 + 1).cast("int").as("height"),
        (length(col("bytes")) / 256 + 1).cast("int").as("n_frames"),
        lit(16000).as("sample_rate")))

  /** Frame sampling: slice the payload into fixed-size chunks ("frames")
    * with SQL substring on binary — pure codegen'd expressions, fully
    * parallel, no driver involvement. */
  def sampleFrames(assets: DataFrame, frameBytes: Int = 256): DataFrame =
    assets
      .withColumn("frame_idx",
        explode(sequence(lit(0), ((length(col("bytes")) - 1) / frameBytes).cast("long"))))
      .withColumn("frame",
        expr(s"substring(bytes, frame_idx * $frameBytes + 1, $frameBytes)"))
      .select(col("asset_id"), col("modality"), col("frame_idx"),
        col("frame"), length(col("frame")).as("frame_len"))

  private val PngSignature: Array[Byte] =
    Array(0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  /** Build REAL container files in-engine: spec-conformant PNG (signature
    * + IHDR/IDAT/IEND chunks with genuine CRC-32s via the codegen'd
    * `crc32` builtin) for even doc_ids, canonical 44-byte-header PCM WAV
    * (RIFF/WAVE + fmt /data subchunks, little-endian fields) for odd ones;
    * the document's UTF-8 text plays the (not-actually-compressed) payload.
    * Every field is derived arithmetically from doc_id/payload length, so
    * a SQL oracle can state the expected parse output without parsing —
    * while [[parseContainerMeta]] must genuinely walk the binary to
    * recover it. All header synthesis is hex/concat expressions — one
    * codegen'd projection, no UDF. */
  def fakeContainers(docs: DataFrame): DataFrame = {
    val payload = encode(col("text"), "UTF-8")
    def pngChunk(tag: String, data: Column): Column = {
      val body = concat(tagBytes(tag), data)
      concat(intBE(length(data)), body, intBE(crc32(body)))
    }
    val width = (col("doc_id") % 640 + 16).cast("int")
    val height = (col("doc_id") % 480 + 16).cast("int")
    // bit depth 8, color type 6 (RGBA), compression/filter/interlace 0
    val ihdrData = concat(intBE(width), intBE(height),
      lit(Array[Byte](8, 6, 0, 0, 0)))
    val png = concat(lit(PngSignature), pngChunk("IHDR", ihdrData),
      pngChunk("IDAT", payload), pngChunk("IEND", lit(Array.empty[Byte])))
    val sr = element_at(
      array(lit(8000), lit(16000), lit(22050), lit(44100)),
      (expr("doc_id DIV 2") % 4 + 1).cast("int"))
    val ch = (expr("doc_id DIV 2") % 2 + 1).cast("int")
    val wav = concat(tagBytes("RIFF"), intLE(length(payload) + 36), tagBytes("WAVE"),
      tagBytes("fmt "), intLE(lit(16)),
      shortLE(lit(1)), shortLE(ch), intLE(sr),
      intLE(sr * ch * 2), shortLE(ch * 2), shortLE(lit(16)),
      tagBytes("data"), intLE(length(payload)), payload)
    docs.select(col("doc_id").as("asset_id"),
      when(col("doc_id") % 2 === 0, png).otherwise(wav).as("bytes"))
  }

  /** Parsed container metadata: nulls where the format has no such field. */
  case class ContainerMeta(asset_id: Long, format: String,
      width: Option[Int], height: Option[Int], bit_depth: Option[Int],
      color_type: Option[Int], channels: Option[Int],
      sample_rate: Option[Int], bits_per_sample: Option[Int],
      data_len: Option[Long], crc_ok: Option[Boolean])

  /** Pure-JVM container-header parsing over (asset_id, bytes) — the real
    * thing, not a stub: PNG chunk walking with CRC-32 verification of
    * every chunk, RIFF/WAVE subchunk walking with little-endian field
    * extraction. Runs as mapPartitions (the per-task-init decode shape —
    * a real deployment adds its codec handles where the ByteBuffer is
    * wrapped); malformed/foreign payloads come back as format="unknown"
    * rather than throwing, so one corrupt asset cannot kill a 100 TB scan
    * task. Reference behavior: PNG spec §5.3 chunk layout / RIFF spec
    * fmt-subchunk layout. */
  def parseContainerMeta(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    val out: Dataset[ContainerMeta] =
      assets.select(col("asset_id"), col("bytes")).as[(Long, Array[Byte])]
        .mapPartitions { it =>
          import java.nio.{ByteBuffer, ByteOrder}
          def parsePng(id: Long, b: Array[Byte]): Option[ContainerMeta] = {
            if (b.length < 8 || !b.take(8).sameElements(PngSignature)) return None
            val buf = ByteBuffer.wrap(b).order(ByteOrder.BIG_ENDIAN)
            var pos = 8
            var meta: Option[(Int, Int, Int, Int)] = None
            var dataLen = 0L
            var crcOk = true
            var done = false
            while (!done && pos + 12 <= b.length) {
              val len = buf.getInt(pos)
              if (len < 0 || pos + 12 + len > b.length) return None
              val tag = new String(b, pos + 4, 4, "US-ASCII")
              val crc = new java.util.zip.CRC32
              crc.update(b, pos + 4, 4 + len)
              crcOk &= crc.getValue.toInt == buf.getInt(pos + 8 + len)
              tag match {
                case "IHDR" if len >= 13 =>
                  meta = Some((buf.getInt(pos + 8), buf.getInt(pos + 12),
                    b(pos + 16) & 0xff, b(pos + 17) & 0xff))
                case "IDAT" => dataLen += len
                case "IEND" => done = true
                case _ => ()
              }
              pos += 12 + len
            }
            meta.map { case (w, h, depth, color) =>
              ContainerMeta(id, "png", Some(w), Some(h), Some(depth),
                Some(color), None, None, None, Some(dataLen), Some(crcOk))
            }
          }
          def tag4(b: Array[Byte], pos: Int) = new String(b, pos, 4, "US-ASCII")
          def parseWav(id: Long, b: Array[Byte]): Option[ContainerMeta] = {
            if (b.length < 12 || tag4(b, 0) != "RIFF" || tag4(b, 8) != "WAVE")
              return None
            val buf = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
            var pos = 12
            var fmt: Option[(Int, Int, Int)] = None // channels, rate, bits
            var dataLen: Option[Long] = None
            while (pos + 8 <= b.length) {
              val id4 = tag4(b, pos)
              val size = buf.getInt(pos + 4)
              if (size < 0 || pos + 8 + size > b.length) return None
              id4 match {
                case "fmt " if size >= 16 =>
                  fmt = Some((buf.getShort(pos + 10) & 0xffff,
                    buf.getInt(pos + 12), buf.getShort(pos + 22) & 0xffff))
                case "data" => dataLen = Some(size.toLong)
                case _ => ()
              }
              pos += 8 + size + (size & 1) // RIFF chunks are word-aligned
            }
            fmt.map { case (ch, rate, bits) =>
              ContainerMeta(id, "wav", None, None, None, None,
                Some(ch), Some(rate), Some(bits), dataLen, None)
            }
          }
          it.map { case (id, b) =>
            parsePng(id, b).orElse(parseWav(id, b)).getOrElse(
              ContainerMeta(id, "unknown", None, None, None, None, None,
                None, None, None, None))
          }
        }
    out.toDF()
  }

  /** Container-AGNOSTIC byte-level fingerprint: a normalized `dim`-bin
    * histogram over the ENCODED payload bytes, no decode. This is a
    * first-class corpus op, not a decoder substitute (the real decoders
    * are [[decodePngStats]]/[[decodeWavStats]] and their feature/resize
    * kernels): byte-distribution fingerprints are what format-drift
    * detection, corrupt-batch triage, and near-dup PREFILTERING run on
    * when the codec is unknown, unsupported, or damaged — exactly the
    * rows a decoder rejects. Deterministic arithmetic end-to-end, so it
    * has a full SQL twin (q52). The execution shape — mapPartitions
    * over an iterator, emitting (asset_id, features) — matches the real
    * codecs': per-partition batching amortizes per-task init once, the
    * 100 TB-relevant property.
    */
  def byteHistogramFeatures(assets: DataFrame, dim: Int = 16): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    val out: Dataset[(Long, Array[Float])] =
      assets.select(col("asset_id"), col("bytes")).as[(Long, Array[Byte])]
        .mapPartitions { it =>
          // per-task init (bin table here; codec state in the decoders)
          // happens once per partition, not once per row
          it.map { case (id, bytes) =>
            val hist = new Array[Float](dim)
            var i = 0
            while (i < bytes.length) { hist((bytes(i) & 0xff) % dim) += 1f; i += 1 }
            val n = math.max(1, bytes.length).toFloat
            var j = 0
            while (j < dim) { hist(j) /= n; j += 1 }
            (id, hist)
          }
        }
    out.toDF("asset_id", "features")
  }

  // ---------------------------------------------------------------------
  // REAL PNG pixel codec — pure JVM (java.util.zip), no external library:
  // a full encode (filter + deflate + chunk/CRC assembly) and decode
  // (chunk walk with CRC verification, inflate, all five PNG filter-type
  // reconstructions). For PNG the pixel path is the real thing, proven
  // by a closed-form oracle through the complete encode→compress→decode
  // round trip (q265). Reference: PNG spec §9 (filtering), §5.3 (chunks).
  // ---------------------------------------------------------------------

  /** Deterministic pixel formula shared by the encoder, the scalatest
    * round trip, and the DuckDB oracle — linear congruential per channel
    * so the oracle can compute decoded statistics WITHOUT a decoder. */
  private[graft] def pngPixel(id: Long, x: Int, y: Int): Array[Int] =
    Array(
      ((id + 3L * x + 5L * y) % 256).toInt,
      ((2L * id + 7L * x + y) % 256).toInt,
      ((5L * id + x + 11L * y) % 256).toInt,
      ((id + x.toLong * y) % 256).toInt)

  private[graft] def pngDims(id: Long): (Int, Int) =
    ((16 + id % 8).toInt, (12 + id % 5).toInt)

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def be32(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def pngChunkBytes(tag: String, data: Array[Byte]): Array[Byte] = {
    val t = tag.getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32()
    crc.update(t); crc.update(data)
    be32(data.length) ++ t ++ data ++ be32(crc.getValue.toInt)
  }

  /** Encode one RGBA8 PNG of the formula image — every scanline uses
    * filter type y % 5, so a decoder must implement ALL FIVE
    * reconstructions (None/Sub/Up/Average/Paeth) to get the pixel sums
    * right; the deflate stream is a real zlib stream. */
  private[graft] def encodePng(id: Long): Array[Byte] = {
    val (w, h) = pngDims(id)
    val bpp = 4
    val stride = w * bpp
    val raw = Array.ofDim[Int](h, stride)
    for (y <- 0 until h; x <- 0 until w) {
      val p = pngPixel(id, x, y)
      var c = 0
      while (c < 4) { raw(y)(x * bpp + c) = p(c); c += 1 }
    }
    val filtered = new java.io.ByteArrayOutputStream()
    for (y <- 0 until h) {
      val f = y % 5
      filtered.write(f)
      var i = 0
      while (i < stride) {
        val cur = raw(y)(i)
        val a = if (i >= bpp) raw(y)(i - bpp) else 0
        val b = if (y > 0) raw(y - 1)(i) else 0
        val cc = if (y > 0 && i >= bpp) raw(y - 1)(i - bpp) else 0
        val pred = f match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case _ => paeth(a, b, cc)
        }
        filtered.write((cur - pred) & 0xff)
        i += 1
      }
    }
    val src = filtered.toByteArray
    val defl = new java.util.zip.Deflater()
    defl.setInput(src); defl.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!defl.finished()) out.write(buf, 0, defl.deflate(buf))
    defl.end()
    val ihdr = be32(w) ++ be32(h) ++ Array[Byte](8, 6, 0, 0, 0)
    PngSignature ++ pngChunkBytes("IHDR", ihdr) ++
      pngChunkBytes("IDAT", out.toByteArray) ++
      pngChunkBytes("IEND", Array.empty[Byte])
  }

  /** Synthesize fully DECODABLE formula PNGs (valid zlib IDAT, varied
    * per-scanline filters) — one per input id, built per-partition. */
  def buildDecodablePngs(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(it => it.map(id => (id, encodePng(id))))
      .toDF("asset_id", "bytes")
  }

  private[graft] case class PngStats(asset_id: Long, width: Int,
      height: Int, n_px: Long, sum_r: Long, sum_g: Long, sum_b: Long,
      sum_a: Long)

  /** REAL PNG pixel decode → exact per-image channel sums: chunk walk
    * with CRC-32 verification, zlib inflate, and the five PNG filter
    * reconstructions. Malformed input (bad signature, wrong
    * depth/color-type, CRC mismatch, truncated or corrupt deflate
    * stream) drops the row instead of killing the task — the same
    * poison-pill posture as parseContainerMeta. Exact integer output so
    * the q265 oracle can check the whole round trip in closed form. */
  def decodePngStats(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    val out: Dataset[PngStats] =
      assets.select(col("asset_id"), col("bytes")).as[(Long, Array[Byte])]
        .mapPartitions(it => it.flatMap { case (id, b) =>
          decodeOnePng(id, b)
        })
    out.toDF()
  }

  /** Full pixel reconstruction: chunk walk + CRC verify + inflate +
    * unfilter. Returns (width, height, interleaved RGBA ints); None on
    * any malformation. The core every real-pixel operator shares. */
  private[graft] def decodePngPixels(b: Array[Byte])
      : Option[(Int, Int, Array[Int])] =
    try {
      if (b.length < 8 || !b.take(8).sameElements(PngSignature)) return None
      val buf = java.nio.ByteBuffer.wrap(b)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      var pos = 8
      var w = -1; var h = -1
      val idat = new java.io.ByteArrayOutputStream()
      while (pos + 12 <= b.length) {
        val len = buf.getInt(pos)
        if (len < 0 || pos + 12 + len > b.length) return None
        val tag = new String(b, pos + 4, 4, "US-ASCII")
        val crc = new java.util.zip.CRC32()
        crc.update(b, pos + 4, 4 + len)
        if (crc.getValue.toInt != buf.getInt(pos + 8 + len)) return None
        tag match {
          case "IHDR" =>
            w = buf.getInt(pos + 8); h = buf.getInt(pos + 12)
            // header-declared dims are UNTRUSTED: bound them BEFORE any
            // allocation sized from them — a small crafted file with
            // valid CRCs declaring 40000×40000 would otherwise force
            // multi-GB buffers, and the OutOfMemoryError is an Error
            // that ESCAPES the Exception poison-pill catch, killing the
            // task. 2²⁴ px (≈67 MB RGBA) is far above any legitimate
            // asset here; over-budget headers drop the row like every
            // other malformation.
            if (w <= 0 || h <= 0 || w.toLong * h > (1L << 24)) return None
            // only 8-bit RGBA non-interlaced is in scope
            if (b(pos + 16) != 8 || b(pos + 17) != 6 ||
              b(pos + 20) != 0) return None
          case "IDAT" => idat.write(b, pos + 8, len)
          case _ => ()
        }
        pos += 12 + len
      }
      if (w <= 0 || h <= 0) return None
      val bpp = 4
      val stride = w * bpp
      val expected = h * (1 + stride)
      val infl = new java.util.zip.Inflater()
      infl.setInput(idat.toByteArray)
      val scan = new Array[Byte](expected)
      var got = 0
      while (got < expected && !infl.finished()) {
        val n = infl.inflate(scan, got, expected - got)
        if (n == 0 && infl.needsInput()) return None
        got += n
      }
      infl.end()
      if (got != expected) return None
      val px = new Array[Int](h * stride)
      val prior = new Array[Int](stride)
      val cur = new Array[Int](stride)
      var y = 0
      while (y < h) {
        val base = y * (1 + stride)
        val f = scan(base) & 0xff
        if (f > 4) return None
        var i = 0
        while (i < stride) {
          val x = scan(base + 1 + i) & 0xff
          val a = if (i >= bpp) cur(i - bpp) else 0
          val up = prior(i)
          val ul = if (i >= bpp) prior(i - bpp) else 0
          val pred = f match {
            case 0 => 0
            case 1 => a
            case 2 => up
            case 3 => (a + up) / 2
            case _ => paeth(a, up, ul)
          }
          cur(i) = (x + pred) & 0xff
          px(y * stride + i) = cur(i)
          i += 1
        }
        System.arraycopy(cur, 0, prior, 0, stride)
        y += 1
      }
      Some((w, h, px))
    } catch { case _: Exception => None }

  private[graft] def decodeOnePng(id: Long, b: Array[Byte])
      : Option[PngStats] =
    decodePngPixels(b).map { case (w, h, px) =>
      var sr = 0L; var sg = 0L; var sb = 0L; var sa = 0L
      var i = 0
      while (i < px.length) {
        (i % 4: @unchecked) match {
          case 0 => sr += px(i)
          case 1 => sg += px(i)
          case 2 => sb += px(i)
          case 3 => sa += px(i)
        }
        i += 1
      }
      PngStats(id, w, h, w.toLong * h, sr, sg, sb, sa)
    }

  private[graft] case class PngCell(asset_id: Long, cx: Int, cy: Int,
      n_px: Long, sum_r: Long, sum_g: Long, sum_b: Long, sum_a: Long)

  /** REAL image feature extraction over DECODED pixels: a gx×gy grid of
    * exact per-cell channel sums (the mean-pooled patch embedding shape
    * — grid cell (cx, cy) = pixels with ⌊x·gx/w⌋ = cx, ⌊y·gy/h⌋ = cy).
    * Long-form output so the closed-form oracle checks every cell. */
  def pngGridFeatures(assets: DataFrame, gx: Int = 2, gy: Int = 2)
      : DataFrame = {
    require(gx >= 1 && gy >= 1, s"pngGridFeatures: grid $gx x $gy")
    val spark = assets.sparkSession
    import spark.implicits._
    val out: Dataset[PngCell] =
      assets.select(col("asset_id"), col("bytes")).as[(Long, Array[Byte])]
        .mapPartitions(it => it.flatMap { case (id, b) =>
          decodePngPixels(b).toSeq.flatMap { case (w, h, px) =>
            val acc = scala.collection.mutable.Map
              .empty[(Int, Int), Array[Long]]
            for (y <- 0 until h; x <- 0 until w) {
              val key = (x * gx / w, y * gy / h)
              val cell = acc.getOrElseUpdate(key, new Array[Long](5))
              cell(0) += 1
              var c = 0
              while (c < 4) {
                cell(1 + c) += px((y * w + x) * 4 + c); c += 1
              }
            }
            acc.toSeq.sortBy(_._1).map { case ((cx, cy), v) =>
              PngCell(id, cx, cy, v(0), v(1), v(2), v(3), v(4))
            }
          }
        })
    out.toDF()
  }

  /** REAL nearest-neighbor resize over DECODED pixels: out(x', y') =
    * in(⌊x'·w/ow⌋, ⌊y'·h/oh⌋), published as exact channel sums of the
    * resized image so the oracle can state the result by sampling the
    * pixel formula at the mapped coordinates — the pixel half of the
    * q53 resize plan, real now. */
  def pngResizeStats(assets: DataFrame, ow: Int = 8, oh: Int = 6)
      : DataFrame = {
    require(ow >= 1 && oh >= 1, s"pngResizeStats: target $ow x $oh")
    val spark = assets.sparkSession
    import spark.implicits._
    val out: Dataset[PngStats] =
      assets.select(col("asset_id"), col("bytes")).as[(Long, Array[Byte])]
        .mapPartitions(it => it.flatMap { case (id, b) =>
          decodePngPixels(b).map { case (w, h, px) =>
            var sr = 0L; var sg = 0L; var sb = 0L; var sa = 0L
            for (yo <- 0 until oh; xo <- 0 until ow) {
              val sx = xo * w / ow; val sy = yo * h / oh
              val base = (sy * w + sx) * 4
              sr += px(base); sg += px(base + 1)
              sb += px(base + 2); sa += px(base + 3)
            }
            PngStats(id, ow, oh, ow.toLong * oh, sr, sg, sb, sa)
          }
        })
    out.toDF()
  }

  // ---------------------------------------------------------------------
  // REAL PCM-WAV sample codec — 16-bit little-endian PCM needs no codec
  // library, so the audio decode path is the real thing too: encode a
  // canonical 44-byte-header WAV of formula samples, decode it back with
  // RIFF subchunk walking + ByteBuffer sample extraction, publish exact
  // integer waveform statistics. Closed-form oracle: q266 recomputes the
  // stats from the sample formula without touching a decoder.
  // ---------------------------------------------------------------------

  /** Deterministic sample formula shared by encoder, spec, and oracle:
    * s_i = ((7·id + 13·i) mod 65536) − 32768 — full int16 range, sign
    * changes throughout (so the zero-crossing count is non-trivial). */
  private[graft] def wavSample(id: Long, i: Int): Int =
    (((7L * id + 13L * i) % 65536L) - 32768L).toInt

  private[graft] def wavParams(id: Long): (Int, Int, Int) =
    // sample count always EVEN so stereo files hold whole frames (an
    // odd-sample stereo WAV is malformed; javax.sound floor-truncates)
    ((800 + (id % 50) * 2).toInt, (1 + id % 2).toInt,
      Array(8000, 16000, 22050, 44100)((id % 4).toInt))

  /** Encode one canonical PCM WAV: RIFF/WAVE + fmt (PCM, 16-bit) + data
    * holding `n` formula samples interleaved over `ch` channels. */
  private[graft] def encodeWav(id: Long): Array[Byte] = {
    val (n, ch, sr) = wavParams(id)
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort).putShort(ch.toShort).putInt(sr)
      .putInt(sr * ch * 2).putShort((ch * 2).toShort).putShort(16.toShort)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) { bb.putShort(wavSample(id, i).toShort); i += 1 }
    bb.array()
  }

  /** Synthesize fully decodable formula WAVs, one per id. */
  def buildPcmWavs(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(it => it.map(id => (id, encodeWav(id))))
      .toDF("asset_id", "bytes")
  }

  private[graft] case class WavStats(asset_id: Long, channels: Int,
      sample_rate: Int, n_samples: Long, sum_s: Long, min_s: Long,
      max_s: Long, zero_cross: Long)

  /** REAL PCM sample decode → exact waveform statistics (sum/min/max and
    * the zero-crossing count — the classic cheap audio activity
    * feature). RIFF subchunk walk, PCM-16 enforcement, poison-pill
    * posture identical to the PNG path. */
  def decodeWavStats(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    val out: Dataset[WavStats] =
      assets.select(col("asset_id"), col("bytes")).as[(Long, Array[Byte])]
        .mapPartitions(it => it.flatMap { case (id, b) =>
          decodeOneWav(id, b)
        })
    out.toDF()
  }

  /** RIFF walk + PCM-16 sample extraction — the core every real-sample
    * operator shares. Returns (channels, sample_rate, samples); None on
    * any malformation. */
  private[graft] def decodeWavSamples(b: Array[Byte])
      : Option[(Int, Int, Array[Short])] =
    try {
      if (b.length < 44) return None
      val bb = java.nio.ByteBuffer.wrap(b)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def tag(off: Int) = new String(b, off, 4, "US-ASCII")
      if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
      var pos = 12
      var ch = -1; var sr = -1; var bits = -1
      var dataOff = -1; var dataLen = -1
      while (pos + 8 <= b.length && (ch < 0 || dataOff < 0)) {
        val t = tag(pos); val len = bb.getInt(pos + 4)
        if (len < 0 || pos + 8 + len > b.length) return None
        t match {
          case "fmt " =>
            if (len < 16 || bb.getShort(pos + 8) != 1) return None
            ch = bb.getShort(pos + 10); sr = bb.getInt(pos + 12)
            bits = bb.getShort(pos + 22)
          case "data" => dataOff = pos + 8; dataLen = len
          case _ => ()
        }
        pos += 8 + len
      }
      if (ch <= 0 || sr <= 0 || bits != 16 || dataOff < 0) return None
      val n = dataLen / 2
      if (n == 0) return None
      val out = new Array[Short](n)
      var i = 0
      while (i < n) { out(i) = bb.getShort(dataOff + 2 * i); i += 1 }
      Some((ch, sr, out))
    } catch { case _: Exception => None }

  private[graft] def decodeOneWav(id: Long, b: Array[Byte])
      : Option[WavStats] =
    decodeWavSamples(b).map { case (ch, sr, smp) =>
      var sum = 0L; var mn = Long.MaxValue; var mx = Long.MinValue
      var zc = 0L; var prevNeg = false
      var i = 0
      while (i < smp.length) {
        val s = smp(i).toLong
        sum += s; if (s < mn) mn = s; if (s > mx) mx = s
        val neg = s < 0
        if (i > 0 && neg != prevNeg) zc += 1
        prevNeg = neg
        i += 1
      }
      WavStats(id, ch, sr, smp.length, sum, mn, mx, zc)
    }

  private[graft] case class WavWindow(asset_id: Long, w: Long,
      n_samples: Long, sum_abs: Long, max_abs: Long)

  /** REAL audio feature extraction over DECODED samples: per fixed-size
    * window, the exact L1 energy (Σ|s|) and peak (max|s|) — the cheap
    * activity/silence profile a speech-data pipeline segments on.
    * Long-form rows so the closed-form oracle checks every window. */
  def wavEnergyWindows(assets: DataFrame, win: Int = 200): DataFrame = {
    require(win >= 1, s"wavEnergyWindows: window $win")
    val spark = assets.sparkSession
    import spark.implicits._
    val out: Dataset[WavWindow] =
      assets.select(col("asset_id"), col("bytes")).as[(Long, Array[Byte])]
        .mapPartitions(it => it.flatMap { case (id, b) =>
          decodeWavSamples(b).toSeq.flatMap { case (_, _, smp) =>
            smp.indices.groupBy(_ / win).toSeq.sortBy(_._1)
              .map { case (w, idx) =>
                var sa = 0L; var ma = 0L
                idx.foreach { i =>
                  val a = math.abs(smp(i).toLong)
                  sa += a; if (a > ma) ma = a
                }
                WavWindow(id, w.toLong, idx.size.toLong, sa, ma)
              }
          }
        })
    out.toDF()
  }

  /** Mixed-media fixture with DETERMINISTIC damage: even ids carry a
    * decodable PNG, odd ids a PCM WAV, and every id ≡ 0 (mod 7) is
    * corrupted the way its format actually breaks in the wild — a PNG
    * gets one IDAT byte flipped (CRC mismatch on decode), a WAV is
    * truncated below its header. The oracle can therefore state every
    * asset's classification arithmetically. */
  def buildMixedMedia(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(it => it.map { id =>
        val base = if (id % 2 == 0) encodePng(id) else encodeWav(id)
        val bytes =
          if (id % 7 != 0) base
          else if (id % 2 == 0) {
            val c = base.clone(); c(45) = (c(45) ^ 0x1).toByte; c
          } else base.take(30)
        (id, bytes)
      })
      .toDF("asset_id", "bytes")
  }

  private[graft] case class MediaClass(asset_id: Long, bucket: String,
      n_units: Long, checksum: Long)

  /** Format sniff → decode → classify: healthy assets publish their
    * decoded volume and an exact content checksum (PNG: Σ all channel
    * sums; WAV: Σ samples); damaged or foreign assets classify into a
    * quarantine bucket by failure mode instead of killing the task.
    * The ingestion-gate primitive behind the q269 media card. */
  def classifyMedia(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    val out: Dataset[MediaClass] =
      assets.select(col("asset_id"), col("bytes")).as[(Long, Array[Byte])]
        .mapPartitions(it => it.map { case (id, b) =>
          if (b.length >= 8 && b.take(8).sameElements(PngSignature))
            decodeOnePng(id, b) match {
              case Some(p) => MediaClass(id, "png", p.n_px,
                p.sum_r + p.sum_g + p.sum_b + p.sum_a)
              case None => MediaClass(id, "png_corrupt", 0L, 0L)
            }
          else if (b.length >= 4 &&
            new String(b, 0, 4, "US-ASCII") == "RIFF")
            decodeOneWav(id, b) match {
              case Some(w) => MediaClass(id, "wav", w.n_samples, w.sum_s)
              case None => MediaClass(id, "wav_corrupt", 0L, 0L)
            }
          else MediaClass(id, "unknown_format", 0L, 0L)
        })
    out.toDF()
  }
}
