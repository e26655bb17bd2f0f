package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Binary-column plumbing: schema contract, frame slicing, decode stub. */
class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("fakeAssets matches the canonical asset schema contract") {
    val a = Multimodal.fakeAssets(docs)
    // simpleString compares names+types, ignoring nullability flags
    assert(a.schema.simpleString === Multimodal.assetSchema.simpleString)
  }

  test("sampleFrames slices cover the payload exactly and in order") {
    val a = Multimodal.fakeAssets(docs.limit(20))
    val frames = Multimodal.sampleFrames(a, frameBytes = 256)
    // reassemble per asset and compare with original bytes
    val reassembled = frames.orderBy("asset_id", "frame_idx")
      .select("asset_id", "frame").as[(Long, Array[Byte])].collect()
      .groupBy(_._1).view.mapValues(_.flatMap(_._2)).toMap
    val original = a.select("asset_id", "bytes").as[(Long, Array[Byte])]
      .collect().toMap
    assert(reassembled.keySet === original.keySet)
    reassembled.foreach { case (id, bytes) =>
      assert(bytes.toSeq === original(id).toSeq, s"asset $id mismatch")
    }
    // every frame except possibly the last is exactly frameBytes
    val lens = frames.select("asset_id", "frame_idx", "frame_len")
      .as[(Long, Long, Int)].collect().groupBy(_._1)
    lens.values.foreach { fs =>
      val sorted = fs.sortBy(_._2)
      sorted.init.foreach(f => assert(f._3 === 256))
      assert(sorted.last._3 <= 256 && sorted.last._3 > 0)
    }
  }

  test("stubDecodeFeatures emits deterministic fixed-dim features") {
    val a = Multimodal.fakeAssets(docs.limit(50))
    val f1 = Multimodal.stubDecodeFeatures(a, dim = 16)
      .select("asset_id", "features").as[(Long, Array[Float])].collect().toMap
    val f2 = Multimodal.stubDecodeFeatures(a, dim = 16)
      .select("asset_id", "features").as[(Long, Array[Float])].collect().toMap
    assert(f1.size === 50)
    f1.foreach { case (id, v) =>
      assert(v.length === 16)
      assert(math.abs(v.sum - 1.0f) < 1e-3, s"histogram not normalized: ${v.sum}")
      assert(v.toSeq === f2(id).toSeq, s"nondeterministic features for $id")
    }
  }

  test("modality assignment is stable and 3-way") {
    val m = Multimodal.fakeAssets(docs)
      .select("modality").distinct().as[String].collect().toSet
    assert(m === Set("image", "audio", "video"))
  }
}
