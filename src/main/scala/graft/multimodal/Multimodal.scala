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
  * walks chunks/subchunks back out with CRC verification. Only the pixel/
  * sample DECODE kernel is a clearly-marked STUB (no image/audio codecs in
  * this environment — a real deployment swaps `stubDecodeFeatures`'s body
  * for an actual decoder); the schema contract, binary slicing,
  * partition-batched execution shape, and feature-vector output schema are
  * all real and tested.
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

  /** Per-partition batched "decode → feature vector" step.
    *
    * STUB: a real pipeline decodes the bytes with an image/audio library
    * here (this container has none). The stand-in computes a deterministic
    * 16-dim byte-histogram feature so downstream similarity plumbing is
    * exercisable end-to-end. The execution shape — mapPartitions over an
    * iterator, emitting (asset_id, features) — is exactly what a real
    * decoder uses: per-partition batching amortizes model/codec init once
    * per task, the 100 TB-relevant property.
    */
  def stubDecodeFeatures(assets: DataFrame, dim: Int = 16): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    val out: Dataset[(Long, Array[Float])] =
      assets.select(col("asset_id"), col("bytes")).as[(Long, Array[Byte])]
        .mapPartitions { it =>
          // >>> real codec init would happen once, here <<<
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
}
