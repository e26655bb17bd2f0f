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

  test("byteHistogramFeatures emits deterministic fixed-dim features") {
    val a = Multimodal.fakeAssets(docs.limit(50))
    val f1 = Multimodal.byteHistogramFeatures(a, dim = 16)
      .select("asset_id", "features").as[(Long, Array[Float])].collect().toMap
    val f2 = Multimodal.byteHistogramFeatures(a, dim = 16)
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

  test("PNG pixel codec round-trips exactly and agrees with ImageIO") {
    // our decoder vs the formula (the oracle's check) AND vs the JDK's
    // own independent PNG implementation, pixel-sum for pixel-sum
    for (id <- Seq(0L, 3L, 7L, 11L)) {
      val bytes = Multimodal.encodePng(id)
      val got = Multimodal.decodeOnePng(id, bytes).get
      val (w, h) = Multimodal.pngDims(id)
      var er = 0L; var eg = 0L; var eb = 0L; var ea = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val p = Multimodal.pngPixel(id, x, y)
        er += p(0); eg += p(1); eb += p(2); ea += p(3)
      }
      assert((got.width, got.height, got.n_px) === ((w, h, w.toLong * h)))
      assert((got.sum_r, got.sum_g, got.sum_b, got.sum_a) ===
        ((er, eg, eb, ea)))
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert((img.getWidth, img.getHeight) === ((w, h)))
      var ir = 0L; var ig = 0L; var ib = 0L; var ia = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val argb = img.getRGB(x, y)
        ia += (argb >>> 24) & 0xff; ir += (argb >> 16) & 0xff
        ig += (argb >> 8) & 0xff; ib += argb & 0xff
      }
      assert((ir, ig, ib, ia) === ((er, eg, eb, ea)),
        s"ImageIO disagrees for id=$id")
    }
  }

  test("WAV sample codec round-trips exactly and agrees with javax.sound") {
    for (id <- Seq(0L, 1L, 5L, 13L)) {
      val bytes = Multimodal.encodeWav(id)
      val got = Multimodal.decodeOneWav(id, bytes).get
      val (n, ch, sr) = Multimodal.wavParams(id)
      var sum = 0L; var mn = Long.MaxValue; var mx = Long.MinValue
      var zc = 0L
      for (i <- 0 until n) {
        val s = Multimodal.wavSample(id, i).toLong
        sum += s; mn = math.min(mn, s); mx = math.max(mx, s)
        if (i > 0 &&
          (s < 0) != (Multimodal.wavSample(id, i - 1) < 0)) zc += 1
      }
      assert((got.channels, got.sample_rate, got.n_samples) ===
        ((ch, sr, n.toLong)))
      assert((got.sum_s, got.min_s, got.max_s, got.zero_cross) ===
        ((sum, mn, mx, zc)))
      // independent JDK parse: javax.sound must agree on the format and
      // the raw sample bytes
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      assert((fmt.getChannels, fmt.getSampleRate.toInt,
        fmt.getSampleSizeInBits) === ((ch, sr, 16)))
      val raw = ais.readAllBytes()
      assert(raw.length === n * 2)
      val bb = java.nio.ByteBuffer.wrap(raw)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var jsum = 0L
      for (i <- 0 until n) jsum += bb.getShort(2 * i)
      assert(jsum === sum, s"javax.sound disagrees for id=$id")
    }
  }

  test("WAV sample decode drops poison pills instead of killing the task") {
    val good = Multimodal.encodeWav(9L)
    // 8-bit PCM claim → rejected (PCM-16 enforcement)
    val wrongBits = good.clone(); wrongBits(34) = 8
    assert(Multimodal.decodeOneWav(9L, wrongBits).isEmpty)
    assert(Multimodal.decodeOneWav(9L, good.take(30)).isEmpty)
    val df = Seq((1L, good), (2L, good.take(30))).toDF("asset_id", "bytes")
    assert(Multimodal.decodeWavStats(df).collect()
      .map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("PNG pixel decode drops poison pills instead of killing the task") {
    val good = Multimodal.encodePng(5L)
    // flip one byte inside the IDAT data region → chunk CRC mismatch
    val flipped = good.clone()
    flipped(45) = (flipped(45) ^ 0x1).toByte
    assert(Multimodal.decodeOnePng(5L, flipped).isEmpty)
    assert(Multimodal.decodeOnePng(5L, good.take(40)).isEmpty)
    assert(Multimodal.decodeOnePng(5L,
      Array.tabulate[Byte](64)(i => (i * 37).toByte)).isEmpty)
    // the DataFrame path keeps the healthy rows
    val df = Seq((1L, good), (2L, flipped)).toDF("asset_id", "bytes")
    val out = Multimodal.decodePngStats(df).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("PNG decode bounds header-declared dims before allocating") {
    // a tiny crafted file with VALID chunk CRCs declaring 40000×40000:
    // without the w*h bound the decoder would allocate multi-GB buffers
    // and the OutOfMemoryError (an Error, not an Exception) would escape
    // the poison-pill catch and kill the task
    def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
      val t = tag.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(t); crc.update(data)
      val len = data.length
      Array[Byte](((len >> 24) & 0xff).toByte, ((len >> 16) & 0xff).toByte,
        ((len >> 8) & 0xff).toByte, (len & 0xff).toByte) ++
        t ++ data ++ {
          val v = crc.getValue.toInt
          Array[Byte](((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
            ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
        }
    }
    val d = 40000
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(d).putInt(d).put(8.toByte).put(6.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    val bomb = sig ++ chunk("IHDR", ihdr) ++
      chunk("IDAT", Array[Byte](0x78, 0x01)) ++
      chunk("IEND", Array.empty[Byte])
    assert(Multimodal.decodePngPixels(bomb).isEmpty) // dropped, not OOM
  }
}
