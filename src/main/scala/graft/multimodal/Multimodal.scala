package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: images/audio/video ride through the engine as
  * opaque `binary` columns plus a typed metadata struct; decode/feature
  * steps are per-partition batch operations.
  *
  * The decode kernel itself is a clearly-marked STUB (no image/audio codecs
  * in this environment — a real deployment swaps `stubDecodeFeatures`'s body
  * for an actual decoder); everything Spark-side is real and tested: the
  * schema contract, the binary slicing, the partition-batched execution
  * shape, and the feature-vector output schema.
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
