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

  test("synthesized PNGs decode with the JDK's own ImageIO (spec conformance)") {
    // javax.imageio is an independent third-party PNG reader: if it can
    // recover the IHDR dimensions, the builder's chunk layout, CRCs, and
    // big-endian fields are right by an implementation we didn't write.
    // (The IDAT payload is not a real zlib stream, so only the header
    // metadata — not pixels — is readable; ImageIO parses dimensions
    // lazily from IHDR, which is exactly the contract q113 exercises.)
    val pngs = Multimodal.fakeContainers(docs.filter(col("doc_id") % 2 === 0).limit(10))
      .select("asset_id", "bytes").as[(Long, Array[Byte])].collect()
    assert(pngs.nonEmpty)
    pngs.foreach { case (id, bytes) =>
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      assert(readers.hasNext, s"asset $id: ImageIO did not recognize the PNG")
      val r = readers.next()
      r.setInput(in)
      assert(r.getWidth(0) === (id % 640 + 16).toInt, s"asset $id width")
      assert(r.getHeight(0) === (id % 480 + 16).toInt, s"asset $id height")
      r.dispose()
    }
  }

  test("parseContainerMeta flags corruption instead of mis-parsing or throwing") {
    val assets = Multimodal.fakeContainers(docs.limit(40))
      .select("asset_id", "bytes").as[(Long, Array[Byte])].collect()
    val png = assets.find(_._1 % 2 == 0).get
    val wav = assets.find(_._1 % 2 == 1).get

    // flip one byte inside the PNG IHDR data → CRC must catch it
    val flipped = png._2.clone()
    flipped(18) = (flipped(18) ^ 0x7f).toByte
    // truncate the WAV mid-header → unknown, not a crash
    val truncated = wav._2.take(10)
    // foreign bytes → unknown
    val garbage = Array.tabulate[Byte](64)(i => (i * 37).toByte)

    val parsed = Multimodal.parseContainerMeta(
      Seq((1L, flipped), (2L, truncated), (3L, garbage), (4L, wav._2))
        .toDF("asset_id", "bytes"))
      .orderBy("asset_id").collect()

    assert(parsed(0).getAs[String]("format") === "png")
    assert(parsed(0).getAs[Boolean]("crc_ok") === false) // corruption caught
    assert(parsed(1).getAs[String]("format") === "unknown")
    assert(parsed(2).getAs[String]("format") === "unknown")
    assert(parsed(3).getAs[String]("format") === "wav")
    assert(!parsed(3).isNullAt(parsed(3).fieldIndex("sample_rate")))
  }
}
