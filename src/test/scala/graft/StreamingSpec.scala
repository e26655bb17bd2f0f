package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.queries.Q
import graft.streaming.EventStreams

/** Structured Streaming: file-source stream → watermarked window agg →
  * memory sink, and stateful sessionization — each compared against the
  * equivalent batch computation on the same data. */
class StreamingSpec extends SparkSpec {

  import spark.implicits._

  private lazy val eventsBatch = Q.events(spark, sfDir)

  test("streamed hourly window agg equals the batch computation") {
    val tmp = Files.createTempDirectory("streamspec").toString
    val src = eventsBatch.select("event_id", "ts", "user_id", "event_type", "value")
    src.write.parquet(s"$tmp/in")

    // Complete mode: Append would withhold windows the watermark hasn't
    // finalized, which can never equal the batch result on a finite input.
    val stream = EventStreams.fileStream(spark, src.schema, s"$tmp/in")
    val streamed = EventStreams.runAvailableNow(
      EventStreams.hourlyCounts(stream), "hourly_stream", OutputMode.Complete)
      .orderBy("hour_start", "event_type")
      .collect()

    val batch = EventStreams.hourlyCounts(src)
      .orderBy("hour_start", "event_type")
      .collect()

    assert(streamed.length === batch.length)
    streamed.zip(batch).foreach { case (s, b) => assert(s === b) }
    assert(streamed.nonEmpty)
  }

  test("stream-stream LEFT OUTER interval join equals the batch left-outer join") {
    val tmp = Files.createTempDirectory("streamspec").toString
    val e = eventsBatch.filter(col("user_id") < 20)
    val maxTs = e.agg(max(col("ts"))).head().getTimestamp(0)
    // Sentinel rows 4h past the end of the data on BOTH inputs: the global
    // watermark (min across inputs, each maxTs − 2h delay) then clears
    // p_ts + 1h for every real purchase, so each unmatched purchase's
    // outer row is finalized and emitted before the stream drains. The
    // sentinels pair only with each other and are excluded below.
    val sentinelTs = new Timestamp(maxTs.getTime + 4L * 3600 * 1000)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .union(Seq((-1L, -1L, sentinelTs)).toDF("p_user", "purchase_id", "p_ts"))
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts").as("v_ts"))
      .union(Seq((-1L, -1L, sentinelTs)).toDF("v_user", "view_id", "v_ts"))
    p.write.parquet(s"$tmp/p"); v.write.parquet(s"$tmp/v")

    val streamed = EventStreams.runAvailableNow(
      EventStreams.attributionJoinLeftOuter(
        EventStreams.fileStream(spark, p.schema, s"$tmp/p"),
        EventStreams.fileStream(spark, v.schema, s"$tmp/v")),
      "attribution_outer_stream", OutputMode.Append)
      .filter(col("purchase_id") =!= -1L)
      .as[(Long, Long, Option[Long])].collect().toSet

    val batch = EventStreams.attributionJoinLeftOuter(p, v)
      .filter(col("purchase_id") =!= -1L)
      .as[(Long, Long, Option[Long])].collect().toSet

    assert(streamed === batch)
    assert(streamed.exists(_._3.isEmpty),
      "expected at least one unattributed purchase (null view_id)")
    assert(streamed.exists(_._3.nonEmpty))
  }

  test("streamed dedup within watermark equals batch distinct") {
    def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    val events = Seq(
      EventStreams.Event(1, ts(0), 10, "click", 1.0),
      EventStreams.Event(1, ts(1), 10, "click", 1.0),   // dup event_id
      EventStreams.Event(2, ts(5), 10, "click", 2.0),
      EventStreams.Event(3, ts(9), 20, "view", 3.0),
      EventStreams.Event(3, ts(9), 20, "view", 3.0))    // exact dup
    val tmp = Files.createTempDirectory("streamspec").toString
    events.toDF().write.parquet(s"$tmp/in")
    val stream = EventStreams.fileStream(spark, events.toDF().schema, s"$tmp/in")
    val out = EventStreams.runAvailableNow(
      EventStreams.dedupStream(stream, Seq("event_id")),
      "dedup_stream", OutputMode.Append)
      .select("event_id").as[Long].collect().sorted
    assert(out.toSeq === Seq(1L, 2L, 3L))
  }

  test("streaming parquet sink with checkpoint writes durable, complete output") {
    val tmp = Files.createTempDirectory("streamspec").toString
    val src = eventsBatch.filter(col("user_id") < 50)
      .select("event_id", "ts", "user_id", "event_type", "value")
    src.write.parquet(s"$tmp/in")
    val stream = EventStreams.fileStream(spark, src.schema, s"$tmp/in")
      .filter(col("event_type") =!= "error")
    val q = stream.writeStream
      .format("parquet")
      .option("path", s"$tmp/out")
      .option("checkpointLocation", s"$tmp/ckpt")
      .outputMode(OutputMode.Append)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.read.parquet(s"$tmp/out")
    val expected = src.filter(col("event_type") =!= "error").count()
    assert(out.count() === expected)
    assert(expected > 0)
    assert(Files.exists(Paths.get(s"$tmp/ckpt"))) // restart-resumable
  }

  test("stream-stream interval join equals the batch interval join (q47 twin)") {
    val tmp = Files.createTempDirectory("streamspec").toString
    val e = eventsBatch.filter(col("user_id") < 20)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts").as("v_ts"))
    p.write.parquet(s"$tmp/p"); v.write.parquet(s"$tmp/v")

    val streamed = EventStreams.runAvailableNow(
      EventStreams.attributionJoin(
        EventStreams.fileStream(spark, p.schema, s"$tmp/p"),
        EventStreams.fileStream(spark, v.schema, s"$tmp/v")),
      "attribution_stream", OutputMode.Append)
      .as[(Long, Long, Long)].collect().toSet

    val batch = EventStreams.attributionJoin(p, v)
      .as[(Long, Long, Long)].collect().toSet

    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("sessionizeWithTimeout splits on the gap; ids are eviction-safe start times") {
    def tsm(min: Long) = 1700000000000L + min * 60000L
    def ts(min: Long) = new Timestamp(tsm(min))
    val events = Seq(
      EventStreams.Event(1, ts(0), 10, "click", 1.0),
      EventStreams.Event(2, ts(10), 10, "click", 1.0),
      EventStreams.Event(3, ts(50), 10, "click", 1.0),
      EventStreams.Event(4, ts(0), 20, "view", 1.0),
      EventStreams.Event(5, ts(31), 20, "view", 1.0))

    val tmp = Files.createTempDirectory("streamspec").toString
    events.toDF().write.parquet(s"$tmp/in")
    val stream = EventStreams.fileStream(spark, events.toDF().schema, s"$tmp/in")
      .as[EventStreams.Event]
    val out = EventStreams.runAvailableNow(
      EventStreams.sessionizeWithTimeout(stream, gapMinutes = 30).toDF(),
      "sessions_timeout_stream", OutputMode.Append)
      .select("user_id", "event_id", "session_id")
      .as[(Long, Long, Long)].collect().toSet

    // session_id = session-start epoch millis (survives state eviction,
    // unlike a per-user counter)
    assert(out === Set(
      (10L, 1L, tsm(0)), (10L, 2L, tsm(0)), (10L, 3L, tsm(50)),
      (20L, 4L, tsm(0)), (20L, 5L, tsm(31))))
  }

  test("streamed index partials merged at read equal the batch recompute") {
    val tmp = Files.createTempDirectory("streamspec").toString
    val docs = Seq(
      (1L, "apple banana apple"), (2L, "apple cherry"),
      (3L, "banana banana cherry"), (4L, "apple"))
      .toDF("doc_id", "text")
    // two ingest waves over the file stream → two+ micro-batch partials
    docs.filter(col("doc_id") <= 2).write.parquet(s"$tmp/in")
    EventStreams.indexPartialsSink(
      EventStreams.fileStream(spark, docs.schema, s"$tmp/in"),
      "doc_id", "text", s"$tmp/partials", s"$tmp/ckpt").awaitTermination()
    docs.filter(col("doc_id") > 2).write.mode("append").parquet(s"$tmp/in")
    EventStreams.indexPartialsSink(
      EventStreams.fileStream(spark, docs.schema, s"$tmp/in"),
      "doc_id", "text", s"$tmp/partials", s"$tmp/ckpt").awaitTermination()
    val served = EventStreams.servingTermStats(spark, s"$tmp/partials")
      .orderBy("term").as[(String, Long, Long, Long, Long)].collect().toSeq
    val direct = graft.operators.InvertedIndex
      .termStats(docs, "doc_id", "text", minDf = 2L, pooled = false)
      .orderBy("term").as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(served === direct)
    assert(served.nonEmpty)
  }

  test("streamed line dedup in id order equals the batch q146 operator") {
    val tmp = Files.createTempDirectory("streamspec").toString
    // duplicate boilerplate lines within AND across the two ingest waves
    val docs = Seq(
      (1L, "subscribe now. fresh take one. breaking news"),
      (2L, "subscribe now. other body two"),
      (3L, "breaking news. third text. subscribe now"),
      (4L, "third text. unique closer"))
      .toDF("doc_id", "text")
    docs.filter(col("doc_id") <= 2).write.parquet(s"$tmp/in")
    EventStreams.lineDedupSink(
      EventStreams.fileStream(spark, docs.schema, s"$tmp/in"),
      "doc_id", "text", s"$tmp/state", s"$tmp/out", s"$tmp/ckpt")
      .awaitTermination()
    docs.filter(col("doc_id") > 2).write.mode("append").parquet(s"$tmp/in")
    EventStreams.lineDedupSink(
      EventStreams.fileStream(spark, docs.schema, s"$tmp/in"),
      "doc_id", "text", s"$tmp/state", s"$tmp/out", s"$tmp/ckpt")
      .awaitTermination()
    val streamed = spark.read.parquet(s"$tmp/out").drop("batch")
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    val direct = graft.operators.Quality.dedupLinesGlobal(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(streamed === direct)
    // the guarantee itself: every distinct line survives exactly once
    val survivors = spark.read.parquet(s"$tmp/out")
      .select(explode(split(col("cleaned"), "\\. ")).as("snt"))
      .filter(length(col("snt")) > 0)
      .groupBy("snt").count().as[(String, Long)].collect()
    assert(survivors.nonEmpty && survivors.forall(_._2 === 1L))
  }

  test("streamed near-dup ingest equals sequential batch dedup application") {
    val tmp = Files.createTempDirectory("streamspec").toString
    def rep(s: String, n: Int) = Array.fill(n)(s).mkString(" ")
    // wave 1: 1≈2 (within-batch dup); wave 2: 11≈12 (within-batch dup),
    // 13 ≈ doc 1 (cross-batch dup), 14 unique
    val wave1 = Seq(
      (1L, rep("alpha beta gamma delta", 6)),
      (2L, rep("alpha beta gamma delta", 6) + " tail"),
      (3L, rep("epsilon zeta eta theta", 6)))
      .toDF("doc_id", "text")
    val wave2 = Seq(
      (11L, rep("iota kappa lambda mu", 6)),
      (12L, rep("iota kappa lambda mu", 6) + " tail"),
      (13L, rep("alpha beta gamma delta", 6)),
      (14L, rep("nu xi omicron pi", 6)))
      .toDF("doc_id", "text")
    wave1.write.parquet(s"$tmp/in")
    EventStreams.nearDupIngestSink(
      EventStreams.fileStream(spark, wave1.schema, s"$tmp/in"),
      "doc_id", "text", s"$tmp/corpus", s"$tmp/ckpt").awaitTermination()
    wave2.write.mode("append").parquet(s"$tmp/in")
    EventStreams.nearDupIngestSink(
      EventStreams.fileStream(spark, wave1.schema, s"$tmp/in"),
      "doc_id", "text", s"$tmp/corpus", s"$tmp/ckpt").awaitTermination()
    val streamed = spark.read.parquet(s"$tmp/corpus")
      .select("doc_id").as[Long].collect().toSet
    // sequential reference: batch operators applied wave by wave
    import graft.operators.Dedup
    val kept1 = Dedup.applyClusters(wave1, "doc_id",
      Dedup.dupClusters(Dedup.lshPairs(wave1, "doc_id", "text")))
    val kept2within = Dedup.applyClusters(wave2, "doc_id",
      Dedup.dupClusters(Dedup.lshPairs(wave2, "doc_id", "text")))
    val kept2 = kept2within.join(
      Dedup.lshPairsAgainst(kept2within, kept1, "doc_id", "text")
        .select(col("new_id").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")
    val direct = kept1.select("doc_id").as[Long].collect().toSet ++
      kept2.select("doc_id").as[Long].collect().toSet
    assert(streamed === direct)
    // the planted structure: one survivor per dup group, uniques kept,
    // the cross-batch duplicate dropped
    assert(streamed.contains(1L) && !streamed.contains(2L))
    assert(streamed.contains(3L) && streamed.contains(14L))
    assert(streamed.contains(11L) && !streamed.contains(12L))
    assert(!streamed.contains(13L))
    // LIVE cluster labels, maintained incrementally per batch
    // (Dedup.incrementalClusters), equal the batch CC over the union of
    // every arrival: {1,2,13} one cluster (min 1), {11,12} another
    val ldir = new java.io.File(s"$tmp/corpus_labels")
    val epochs = ldir.listFiles.map(_.getName.stripPrefix("epoch=").toLong)
    val labels = spark.read.parquet(s"$tmp/corpus_labels/epoch=${epochs.max}")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val refLabels = Dedup.dupClusters(
        Dedup.lshPairs(wave1.unionByName(wave2), "doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(labels === refLabels)
    assert(labels === Set((1L, 1L), (2L, 1L), (13L, 1L), (11L, 11L), (12L, 11L)))
    graft.operators.OperatorCaches.release()
    graft.operators.FramePool.release()
  }

  test("streamed priority sample equals the batch sample over all arrivals") {
    val tmp = Files.createTempDirectory("streamspec").toString
    val src = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(concat(col("l_orderkey").cast("string"), lit("_"),
          col("l_linenumber").cast("string")).as("k"),
        floor(col("l_extendedprice") * lit(100.0d) + lit(0.5d))
          .cast("long").as("w_c"),
        col("l_returnflag"))
    // two waves so the merge actually crosses batches
    val (w1, w2) = (src.filter(col("k") < "3"), src.filter(col("k") >= "3"))
    w1.write.parquet(s"$tmp/in")
    graft.streaming.EventStreams.prioritySampleSink(
      graft.streaming.EventStreams.fileStream(spark, src.schema, s"$tmp/in"),
      "k", "w_c", s"$tmp/state", s"$tmp/ckpt", k = 64).awaitTermination()
    w2.write.mode("append").parquet(s"$tmp/in")
    graft.streaming.EventStreams.prioritySampleSink(
      graft.streaming.EventStreams.fileStream(spark, src.schema, s"$tmp/in"),
      "k", "w_c", s"$tmp/state", s"$tmp/ckpt", k = 64).awaitTermination()

    val (sSamp, sTau) = graft.streaming.EventStreams
      .servingPrioritySample(spark, s"$tmp/state", k = 64)
    val pri = graft.operators.PrioritySample.withPriority(
      src, col("k"), col("w_c"))
    val (bSamp, bTau) = graft.operators.PrioritySample.sampleWithTau(pri, 64)
    assert(sSamp.select("__key").as[String].collect().toSet
      === bSamp.select("__key").as[String].collect().toSet)
    assert(sTau.head().getDouble(0) === bTau.head().getDouble(0))
    graft.operators.OperatorCaches.release()
  }

  test("streamed takedowns: interleaved append+delete labels equal the rebuild over survivors") {
    val tmp = Files.createTempDirectory("streamspec").toString
    def rep(s: String, n: Int) = Array.fill(n)(s).mkString(" ")
    val A = rep("alpha beta gamma delta", 6)
    val C = rep("epsilon zeta eta theta", 6)
    val R = rep("rho sigma tau upsilon", 6)
    // 2 is the only BRIDGE between 1 and 3 (half its shingles from each)
    val bridge = rep("alpha beta gamma delta", 3) + " " +
      rep("epsilon zeta eta theta", 3)
    val wave1 = Seq(
      (1L, A, "add"), (2L, bridge, "add"), (3L, C, "add"),
      (4L, A + " tail", "add"), (7L, R, "add"), (8L, R + " tail", "add"))
      .toDF("doc_id", "text", "op")
    // interleaved: takedown of 8 arrives WITH new documents — 14's op
    // is NULL on purpose (anything that is not a tombstone is an
    // arriving document, NULL included; the final corpus assertion
    // proves it was not silently dropped)
    val wave2 = Seq(
      (13L, A + " more", "add"),
      (14L, rep("nu xi omicron pi", 6), null.asInstanceOf[String]),
      (8L, "", "delete")).toDF("doc_id", "text", "op")
    // the bridge takedown, plus a takedown of corpus keeper 7 in the
    // same batch as the arrival of 7's twin — deletes apply first, so
    // 15 must be KEPT
    val wave3 = Seq(
      (2L, "", "delete"), (7L, "", "delete"), (15L, R + " coda", "add"))
      .toDF("doc_id", "text", "op")

    // the planted structure must actually surface through the LSH
    // pipeline, or the bridge assertions are vacuous
    import graft.operators.Dedup
    val planted = Dedup.lshPairs(wave1.select("doc_id", "text"),
        "doc_id", "text", rowsPerBand = 1)
      .select("a_id", "b_id").as[(Long, Long)].collect()
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSet
    assert(planted.contains((1L, 2L)) && planted.contains((2L, 3L)),
      s"bridge edges not surfaced by LSH — fixture vacuous: $planted")
    assert(!planted.contains((1L, 3L)), "1 and 3 must only meet via 2")

    def run(wave: org.apache.spark.sql.DataFrame): Unit = {
      wave.write.mode("append").parquet(s"$tmp/in")
      EventStreams.nearDupIngestSink(
        EventStreams.fileStream(spark, wave1.schema, s"$tmp/in"),
        "doc_id", "text", s"$tmp/corpus", s"$tmp/ckpt",
        rowsPerBand = 1, opCol = "op")
        .awaitTermination()
    }
    def epochLabels(): Set[(Long, Long)] = {
      val ldir = new java.io.File(s"$tmp/corpus_labels")
      val epochs = ldir.listFiles.map(_.getName.stripPrefix("epoch=").toLong)
      spark.read.parquet(s"$tmp/corpus_labels/epoch=${epochs.max}")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }

    run(wave1)
    // component {1,2,3,4} via the bridge; {7,8}
    assert(epochLabels() === Set((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (7L, 7L), (8L, 7L)))
    run(wave2)
    // 8's takedown drains {7,8} (7 is a singleton now — absent); the
    // bridge component is intact and 13 joined it
    assert(epochLabels() === Set((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (13L, 1L)))
    run(wave3)
    // the bridge takedown SPLITS {1,2,3,4,13}: 3 falls out as a
    // singleton — a label filter would have kept it merged under 1
    val finalLabels = epochLabels()
    assert(finalLabels === Set((1L, 1L), (4L, 1L), (13L, 1L)))
    // ... and equals the batch rebuild over the surviving arrivals
    val survivingArrivals = Seq((1L, A), (3L, C), (4L, A + " tail"),
      (13L, A + " more"), (14L, rep("nu xi omicron pi", 6)),
      (15L, R + " coda")).toDF("doc_id", "text")
    val refLabels = Dedup.dupClusters(
        Dedup.lshPairs(survivingArrivals, "doc_id", "text",
          rowsPerBand = 1))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(finalLabels === refLabels)
    // corpus merge-on-read: 7 is tombstoned out, 15 was kept because
    // its only twin was deleted in the same batch it arrived
    val tombs = spark.read.parquet(s"$tmp/corpus_tombstones")
      .select("doc_id").distinct()
    val live = spark.read.parquet(s"$tmp/corpus")
      .join(tombs, Seq("doc_id"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    assert(live === Set(1L, 14L, 15L))
    graft.operators.OperatorCaches.release()
    graft.operators.FramePool.release()
  }

  test("compactTakedowns folds tombstones physically; the stream resumes cleanly") {
    val tmp = Files.createTempDirectory("streamspec").toString
    def rep(s: String, n: Int) = Array.fill(n)(s).mkString(" ")
    val A = rep("alpha beta gamma delta", 6)
    val R = rep("rho sigma tau upsilon", 6)
    val wave1 = Seq(
      (1L, A, "add"), (4L, A + " tail", "add"),
      (7L, R, "add"), (8L, R + " tail", "add"),
      (14L, rep("nu xi omicron pi", 6), "add"))
      .toDF("doc_id", "text", "op")
    val wave2 = Seq((7L, "", "delete"), (8L, "", "delete"))
      .toDF("doc_id", "text", "op")
    def run(wave: org.apache.spark.sql.DataFrame): Unit = {
      wave.write.mode("append").parquet(s"$tmp/in")
      EventStreams.nearDupIngestSink(
        EventStreams.fileStream(spark, wave1.schema, s"$tmp/in"),
        "doc_id", "text", s"$tmp/corpus", s"$tmp/ckpt",
        rowsPerBand = 1, opCol = "op").awaitTermination()
    }
    run(wave1); run(wave2)

    val n = EventStreams.compactTakedowns(spark, s"$tmp/corpus", "doc_id")
    // live rows only, read WITHOUT any tombstone anti-join
    val live = spark.read.parquet(s"$tmp/corpus")
      .select("doc_id").as[Long].collect().toSet
    assert(live === Set(1L, 14L) && n === 2L)
    // the pair state lost every tombstone-touching pair (7~8), kept 1~4
    val pairKeys = spark.read.parquet(s"$tmp/corpus_pairs")
      .select("a_id", "b_id").as[(Long, Long)].collect()
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSet
    assert(pairKeys === Set((1L, 4L)))
    assert(!new java.io.File(s"$tmp/corpus_tombstones").exists())

    // the stream continues over the compacted layout: 16 is a twin of
    // still-live 14 (dropped, pair recorded); labels fold incrementally
    run(Seq((16L, rep("nu xi omicron pi", 6) + " coda", "add"))
      .toDF("doc_id", "text", "op"))
    val live2 = spark.read.parquet(s"$tmp/corpus")
      .select("doc_id").as[Long].collect().toSet
    assert(live2 === Set(1L, 14L))
    val ldir = new java.io.File(s"$tmp/corpus_labels")
    val epochs = ldir.listFiles.map(_.getName.stripPrefix("epoch=").toLong)
    val labels = spark.read.parquet(s"$tmp/corpus_labels/epoch=${epochs.max}")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(labels === Set((1L, 1L), (4L, 1L), (14L, 14L), (16L, 14L)))
    // re-compaction with no new tombstone ids is idempotent (ops-mode
    // batches always write a — possibly empty — tombstone frame, so
    // the fold re-runs; the corpus must come through unchanged)
    assert(EventStreams.compactTakedowns(spark, s"$tmp/corpus", "doc_id")
      === 2L)
    assert(spark.read.parquet(s"$tmp/corpus")
      .select("doc_id").as[Long].collect().toSet === Set(1L, 14L))
    graft.operators.OperatorCaches.release()
    graft.operators.FramePool.release()
  }

  test("streamed containment ingest drops subset docs within and across batches") {
    val tmp = Files.createTempDirectory("streamspec").toString
    // long base docs built from distinct vocab per doc; "chunks" are
    // verbatim token slices — containment ≈ 1, Jaccard low
    def longDoc(seed: Int) = {
      val rng = new scala.util.Random(seed)
      val vocab = Vector("r", "s", "t", "u", "v", "w", "x", "y", "z")
        .map(_ + seed)
      Seq.fill(60)(vocab(rng.nextInt(vocab.size))).mkString(" ")
    }
    val full1 = longDoc(1); val full2 = longDoc(2)
    // wave 1: two full docs + a chunk of doc 1 (within-batch containment)
    val wave1 = Seq(
      (1L, full1), (2L, full2),
      (3L, full1.split(" ").slice(10, 22).mkString(" ")))
      .toDF("doc_id", "text")
    // wave 2: a chunk of doc 2 (cross-batch containment), one fresh doc,
    // and a SUPERSET of doc 1 (shared mass ≥ 0.8 of its shingles but
    // larger than the incumbent — the richer arrival must be KEPT under
    // the incumbent-aware size rule, not dropped as "contained")
    val wave2 = Seq(
      (11L, full2.split(" ").slice(30, 44).mkString(" ")),
      (12L, longDoc(9)),
      (13L, full1 + " p9 q9 r9"))
      .toDF("doc_id", "text")
    wave1.write.parquet(s"$tmp/in")
    EventStreams.containmentIngestSink(
      EventStreams.fileStream(spark, wave1.schema, s"$tmp/in"),
      "doc_id", "text", s"$tmp/corpus", s"$tmp/ckpt").awaitTermination()
    wave2.write.mode("append").parquet(s"$tmp/in")
    EventStreams.containmentIngestSink(
      EventStreams.fileStream(spark, wave1.schema, s"$tmp/in"),
      "doc_id", "text", s"$tmp/corpus", s"$tmp/ckpt").awaitTermination()
    val streamed = spark.read.parquet(s"$tmp/corpus")
      .select("doc_id").as[Long].collect().toSet
    // sequential reference: within-batch acyclic drop, then bipartite
    import graft.operators.Dedup
    def withinKeep(w: org.apache.spark.sql.DataFrame) =
      w.join(Dedup.containmentPairs(w, "doc_id", "text", 3, 0.8)
        .filter(col("na") < col("nb") ||
          (col("na") === col("nb") && col("a_id") > col("b_id")))
        .select(col("a_id").as("doc_id")).distinct(), Seq("doc_id"), "left_anti")
    val kept1 = withinKeep(wave1)
    val kept2w = withinKeep(wave2)
    val kept2 = kept2w.join(
      Dedup.containmentAgainst(kept2w, kept1, "doc_id", "text", 3, 0.8)
        .filter(col("n_new") <= col("n_corpus")) // incumbent-aware size rule
        .select(col("new_id").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")
    val direct = kept1.select("doc_id").as[Long].collect().toSet ++
      kept2.select("doc_id").as[Long].collect().toSet
    assert(streamed === direct)
    // planted structure: chunks dropped (3 within-batch, 11 cross-batch),
    // full docs, the fresh doc, and the richer SUPERSET of doc 1 kept
    assert(streamed === Set(1L, 2L, 12L, 13L))
    graft.operators.OperatorCaches.release()
    graft.operators.FramePool.release()
  }

  test("streamed containment takedowns: tombstoned container frees its chunk; compaction folds") {
    val tmp = Files.createTempDirectory("streamspec").toString
    def longDoc(seed: Int) = {
      val rng = new scala.util.Random(seed)
      val vocab = Vector("r", "s", "t", "u", "v", "w", "x", "y", "z")
        .map(_ + seed)
      Seq.fill(60)(vocab(rng.nextInt(vocab.size))).mkString(" ")
    }
    val full1 = longDoc(1); val full2 = longDoc(2)
    def run(wave: org.apache.spark.sql.DataFrame): Unit = {
      wave.write.mode("append").parquet(s"$tmp/in")
      EventStreams.containmentIngestSink(
        EventStreams.fileStream(spark, wave.schema, s"$tmp/in"),
        "doc_id", "text", s"$tmp/corpus", s"$tmp/ckpt",
        opCol = "op").awaitTermination()
    }
    run(Seq((1L, full1, "add"), (2L, full2, "add"))
      .toDF("doc_id", "text", "op"))
    // wave 2: full2's takedown arrives IN THE SAME BATCH as a chunk of
    // it — the chunk's only container is gone, so it must be KEPT
    // (deletes apply before the containment filter); a chunk of
    // still-live full1 must still be dropped
    run(Seq(
      (2L, "", "delete"),
      (21L, full2.split(" ").slice(5, 20).mkString(" "), "add"),
      (22L, full1.split(" ").slice(10, 25).mkString(" "), "add"))
      .toDF("doc_id", "text", "op"))
    // merge-on-read: a reader anti-joins the tombstones
    val tombs = spark.read.parquet(s"$tmp/corpus_tombstones")
      .select("doc_id").distinct()
    val live = spark.read.parquet(s"$tmp/corpus")
      .join(tombs, Seq("doc_id"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    assert(live === Set(1L, 21L))
    // physical compaction: live rows only under batch=-1, no tombstone
    // dir, stream resumes over the compacted layout
    assert(EventStreams.compactTakedowns(spark, s"$tmp/corpus", "doc_id")
      === 2L)
    assert(spark.read.parquet(s"$tmp/corpus")
      .select("doc_id").as[Long].collect().toSet === Set(1L, 21L))
    assert(!new java.io.File(s"$tmp/corpus_tombstones").exists())
    run(Seq(
      (31L, full1.split(" ").slice(20, 35).mkString(" "), "add"),
      (32L, longDoc(9), "add")).toDF("doc_id", "text", "op"))
    assert(spark.read.parquet(s"$tmp/corpus")
      .select("doc_id").as[Long].collect().toSet === Set(1L, 21L, 32L))
    graft.operators.OperatorCaches.release()
    graft.operators.FramePool.release()
  }

  test("streamed embedding takedowns: tombstoned twin frees its dup; compaction folds") {
    val tmp = Files.createTempDirectory("streamspec").toString
    val planes = graft.functions.VectorFunctions.gaussianPlanes(8, 8)
    def jitter(v: Seq[Double], eps: Double) = v.map(_ + eps)
    val base1 = Seq(1.0, 2.0, -1.0, 0.5, 3.0, -2.0, 1.5, 0.25)
    val base2 = Seq(-3.0, 1.0, 2.0, -0.5, 1.0, 2.5, -1.0, 0.75)
    def run(wave: org.apache.spark.sql.DataFrame): Unit = {
      wave.write.mode("append").parquet(s"$tmp/in")
      EventStreams.embeddingIngestSink(
        EventStreams.fileStream(spark, wave.schema, s"$tmp/in"),
        "vec_id", "v", s"$tmp/corpus", s"$tmp/ckpt",
        planes, planesPerBand = 4, minCos = 0.999,
        opCol = "op").awaitTermination()
    }
    run(Seq((1L, base1, "add"), (3L, base2, "add"))
      .toDF("vec_id", "v", "op"))
    // wave 2: 3's takedown arrives with its own near-twin 13 — 13 must
    // be KEPT (its only semantic twin is gone); 14, a twin of still-live
    // 1, must be dropped
    run(Seq(
      (3L, Seq.fill(8)(0.0), "delete"),
      (13L, jitter(base2, 1e-4), "add"),
      (14L, jitter(base1, 1e-4), "add")).toDF("vec_id", "v", "op"))
    val tombs = spark.read.parquet(s"$tmp/corpus_tombstones")
      .select("vec_id").distinct()
    val live = spark.read.parquet(s"$tmp/corpus")
      .join(tombs, Seq("vec_id"), "left_anti")
      .select("vec_id").as[Long].collect().toSet
    assert(live === Set(1L, 13L))
    assert(EventStreams.compactTakedowns(spark, s"$tmp/corpus", "vec_id")
      === 2L)
    assert(spark.read.parquet(s"$tmp/corpus")
      .select("vec_id").as[Long].collect().toSet === Set(1L, 13L))
    graft.operators.OperatorCaches.release()
    graft.operators.FramePool.release()
  }

  test("post-compaction restart with a lost checkpoint neither hides nor destroys the corpus") {
    val tmp = Files.createTempDirectory("streamspec").toString
    def rep(s: String, n: Int) = Array.fill(n)(s).mkString(" ")
    val A = rep("alpha beta gamma delta", 6)
    val R = rep("rho sigma tau upsilon", 6)
    def run(wave: org.apache.spark.sql.DataFrame, in: String,
            ckpt: String): Unit = {
      wave.write.mode("append").parquet(in)
      EventStreams.nearDupIngestSink(
        EventStreams.fileStream(spark, wave.schema, in),
        "doc_id", "text", s"$tmp/corpus", ckpt,
        rowsPerBand = 1, opCol = "op").awaitTermination()
    }
    run(Seq((1L, A, "add"), (7L, R, "add")).toDF("doc_id", "text", "op"),
      s"$tmp/in", s"$tmp/ckpt")
    run(Seq((7L, "", "delete")).toDF("doc_id", "text", "op"),
      s"$tmp/in", s"$tmp/ckpt")
    assert(EventStreams.compactTakedowns(spark, s"$tmp/corpus", "doc_id")
      === 1L)
    // the disaster drill: the checkpoint is lost (fresh dir) and the old
    // inputs are archived (fresh input dir) — the restarted stream's
    // first micro-batch runs as batchId=0. The compacted corpus lives
    // under batch=-1, so it is (a) still visible to dedup (16, a twin
    // of compacted survivor 1, must be dropped) and (b) not clobbered
    // by the batch's own mode(overwrite) write to corpus/batch=0
    run(Seq((16L, A + " coda", "add")).toDF("doc_id", "text", "op"),
      s"$tmp/in2", s"$tmp/ckpt2")
    assert(spark.read.parquet(s"$tmp/corpus")
      .select("doc_id").as[Long].collect().toSet === Set(1L))
    graft.operators.OperatorCaches.release()
    graft.operators.FramePool.release()
  }

  test("restart with opCol unset over existing tombstones fails loudly") {
    // the INVERSE misconfiguration of the mid-stream guard: batch 0 runs
    // in ops mode and takes a doc down; a restart with opCol=null would
    // silently ignore the tombstone dir — the deleted doc would act as a
    // dedup incumbent and drop new arrivals duplicating deleted content
    val tmp = Files.createTempDirectory("streamspec").toString
    def rep(s: String, n: Int) = Array.fill(n)(s).mkString(" ")
    val wave1 = Seq(
      (1L, rep("alpha beta gamma delta", 6), "add"),
      (7L, rep("rho sigma tau upsilon", 6), "add"),
      (7L, "", "delete")).toDF("doc_id", "text", "op")
    wave1.write.parquet(s"$tmp/in")
    EventStreams.containmentIngestSink(
      EventStreams.fileStream(spark, wave1.schema, s"$tmp/in"),
      "doc_id", "text", s"$tmp/corpus", s"$tmp/ckpt",
      opCol = "op").awaitTermination()
    assert(new java.io.File(s"$tmp/corpus_tombstones").isDirectory)
    val wave2 = Seq((2L, rep("mu nu xi omicron", 6), "add"))
      .toDF("doc_id", "text", "op")
    wave2.write.mode("append").parquet(s"$tmp/in")
    val ex = intercept[Exception] {
      EventStreams.containmentIngestSink(
        EventStreams.fileStream(spark, wave2.schema, s"$tmp/in"),
        "doc_id", "text", s"$tmp/corpus", s"$tmp/ckpt")
        .awaitTermination()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("ops mode")))
    // compaction folds the tombstones physically and DROPS the dir —
    // after it, dropping ops mode is legitimate and the guard stands down
    EventStreams.compactTakedowns(spark, s"$tmp/corpus", "doc_id")
    EventStreams.containmentIngestSink(
      EventStreams.fileStream(spark, wave2.schema, s"$tmp/in"),
      "doc_id", "text", s"$tmp/corpus", s"$tmp/ckpt")
      .awaitTermination()
    assert(spark.read.parquet(s"$tmp/corpus")
      .select("doc_id").as[Long].collect().toSet === Set(1L, 2L))
    graft.operators.OperatorCaches.release()
    graft.operators.FramePool.release()
  }

  test("ops mode enabled mid-stream fails loudly on the first takedown") {
    val tmp = Files.createTempDirectory("streamspec").toString
    def rep(s: String, n: Int) = Array.fill(n)(s).mkString(" ")
    val wave1 = Seq((1L, rep("alpha beta gamma delta", 6)),
      (7L, rep("rho sigma tau upsilon", 6))).toDF("doc_id", "text")
    wave1.write.parquet(s"$tmp/in")
    // batch 0 runs WITHOUT opCol: labels fold, but no pair history is
    // persisted
    EventStreams.nearDupIngestSink(
      EventStreams.fileStream(spark, wave1.schema, s"$tmp/in"),
      "doc_id", "text", s"$tmp/corpus", s"$tmp/ckpt",
      rowsPerBand = 1).awaitTermination()
    // batch 1 (same checkpoint — the stream keeps counting) enables ops
    // WITHOUT any takedown: the guard must fire on the FIRST ops batch,
    // not the first delete — an ops add-only batch would otherwise
    // create pair history that masks the pre-ops gap from a later
    // takedown's label re-derivation
    val wave2 = Seq((16L, rep("mu nu xi omicron", 6), "add"))
      .toDF("doc_id", "text", "op")
    wave2.write.mode("append").parquet(s"$tmp/in")
    val ex = intercept[Exception] {
      EventStreams.nearDupIngestSink(
        EventStreams.fileStream(spark, wave2.schema, s"$tmp/in"),
        "doc_id", "text", s"$tmp/corpus", s"$tmp/ckpt",
        rowsPerBand = 1, opCol = "op").awaitTermination()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("pre-ops components")))
    graft.operators.OperatorCaches.release()
    graft.operators.FramePool.release()
  }

  test("streaming KMV sketch maintenance equals the batch sketch over all arrivals") {
    import graft.operators.CorpusStats
    val tmp = Files.createTempDirectory("streamspec").toString
    def doc(seed: Int) = {
      val rng = new scala.util.Random(seed)
      val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
      Seq.fill(30)(vocab(rng.nextInt(vocab.size))).mkString(" ")
    }
    // sources straddle the waves, so the serving sketch must merge
    // partials from both batches per source
    val wave1 = (1 to 20).map(i => (i.toLong, s"src${i % 4}", doc(i)))
      .toDF("doc_id", "source", "text")
    val wave2 = (21 to 40).map(i => (i.toLong, s"src${i % 5}", doc(i * 7)))
      .toDF("doc_id", "source", "text")
    wave1.write.parquet(s"$tmp/in")
    EventStreams.kmvSketchSink(
      EventStreams.fileStream(spark, wave1.schema, s"$tmp/in"),
      "source", "text", s"$tmp/state", s"$tmp/ckpt",
      k = 3, sketchK = 8).awaitTermination()
    wave2.write.mode("append").parquet(s"$tmp/in")
    EventStreams.kmvSketchSink(
      EventStreams.fileStream(spark, wave1.schema, s"$tmp/in"),
      "source", "text", s"$tmp/state", s"$tmp/ckpt",
      k = 3, sketchK = 8).awaitTermination()
    val streamed = EventStreams.servingSourceSketch(spark, s"$tmp/state", 8)
      .as[(String, Long)].collect().toSet
    val direct = CorpusStats
      .kmvSourceSketch(wave1.unionByName(wave2), "source", "text", k = 3, sketchK = 8)
      .as[(String, Long)].collect().toSet
    assert(streamed === direct)
    assert(streamed.nonEmpty)
    // the truncation path was actually exercised: every source's sketch
    // is full (8 rows) and smaller than its true distinct shingle count
    val perSrc = streamed.groupBy(_._1).view.mapValues(_.size)
    assert(perSrc.values.forall(_ === 8))
    graft.operators.OperatorCaches.release()
  }

  test("source-balance monitor's streamed Gini equals the batch computation") {
    import graft.operators.CorpusStats
    val tmp = Files.createTempDirectory("streamspec").toString
    // wave 2 deliberately skews the mix toward src0
    val wave1 = (1 to 20).map(i =>
      (i.toLong, s"src${i % 4}", Seq.fill(5 + i % 7)("tk").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val wave2 = (21 to 40).map(i =>
      (i.toLong, s"src${i % 2}", Seq.fill(20 + i % 5)("tk").mkString(" ")))
      .toDF("doc_id", "source", "text")
    wave1.write.parquet(s"$tmp/in")
    EventStreams.sourceBalanceMonitorSink(
      EventStreams.fileStream(spark, wave1.schema, s"$tmp/in"),
      "source", "text", s"$tmp/state", s"$tmp/report", s"$tmp/ckpt")
      .awaitTermination()
    wave2.write.mode("append").parquet(s"$tmp/in")
    EventStreams.sourceBalanceMonitorSink(
      EventStreams.fileStream(spark, wave1.schema, s"$tmp/in"),
      "source", "text", s"$tmp/state", s"$tmp/report", s"$tmp/ckpt")
      .awaitTermination()
    val streamed = spark.read.parquet(s"$tmp/report")
      .as[(Long, Long, Double)].collect().toSeq
    val direct = CorpusStats.giniFromVolumes(
      wave1.unionByName(wave2)
        .groupBy(col("source"))
        .agg(sum(size(split(col("text"), " ")).cast("long")).as("x")))
      .as[(Long, Long, Double)].collect().toSeq
    assert(streamed === direct)
    assert(streamed.head._1 === 4L) // all four sources present in the union
    assert(streamed.head._3 > 0.0) // the skew is visible
  }

  test("served water-filled budget from streamed volumes equals the batch allocation") {
    val tmp = Files.createTempDirectory("streamspec").toString
    val wave1 = (1 to 20).map(i =>
      (i.toLong, s"src${i % 4}", Seq.fill(5 + i % 7)("tk").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val wave2 = (21 to 40).map(i =>
      (i.toLong, s"src${i % 2}", Seq.fill(20 + i % 5)("tk").mkString(" ")))
      .toDF("doc_id", "source", "text")
    wave1.write.parquet(s"$tmp/in")
    EventStreams.sourceBalanceMonitorSink(
      EventStreams.fileStream(spark, wave1.schema, s"$tmp/in"),
      "source", "text", s"$tmp/state", s"$tmp/report", s"$tmp/ckpt")
      .awaitTermination()
    wave2.write.mode("append").parquet(s"$tmp/in")
    EventStreams.sourceBalanceMonitorSink(
      EventStreams.fileStream(spark, wave1.schema, s"$tmp/in"),
      "source", "text", s"$tmp/state", s"$tmp/report", s"$tmp/ckpt")
      .awaitTermination()
    val served = EventStreams.servingTokenBudget(spark, s"$tmp/state")
      .orderBy("source").as[(String, Long, Long, Long)].collect().toSeq
    val direct = graft.operators.Mixture.waterfill(
      wave1.unionByName(wave2).groupBy(col("source"))
        .agg(sum(size(split(col("text"), " ")).cast("long")).as("tokens")))
      .orderBy("source").as[(String, Long, Long, Long)].collect().toSeq
    assert(served === direct)
    // the level binds: at least one source is capped below its volume
    assert(served.exists(r => r._3 < r._2))
  }

  test("streaming modularity monitor equals the batch q206 over all arrivals") {
    val tmp = Files.createTempDirectory("streamspec").toString
    // exact-duplicate texts pin the pair set (SourceModularitySpec's
    // fixture, split so the load-bearing edges are CROSS-BATCH: (3,4)
    // within-source across waves, (1,5)/(2,5) cross-source across waves,
    // (1,2) within one batch)
    val t1 = "alpha beta gamma delta epsilon"
    val t2 = "one two three four five"
    val t3 = "north south east west center"
    val wave1 = Seq((1L, t1, "x"), (2L, t1, "x"), (3L, t2, "x"))
      .toDF("doc_id", "text", "source")
    val wave2 = Seq((4L, t2, "x"), (5L, t1, "y"), (6L, t3, "z"))
      .toDF("doc_id", "text", "source")
    wave1.write.parquet(s"$tmp/in")
    EventStreams.modularityMonitorSink(
      EventStreams.fileStream(spark, wave1.schema, s"$tmp/in"),
      "doc_id", "text", "source",
      s"$tmp/corpus", s"$tmp/state", s"$tmp/ckpt").awaitTermination()
    wave2.write.mode("append").parquet(s"$tmp/in")
    EventStreams.modularityMonitorSink(
      EventStreams.fileStream(spark, wave1.schema, s"$tmp/in"),
      "doc_id", "text", "source",
      s"$tmp/corpus", s"$tmp/state", s"$tmp/ckpt").awaitTermination()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))).toSeq
    val streamed = rows(EventStreams.servingModularity(spark, s"$tmp/state"))
    // the registered batch query over the union of all arrivals
    wave1.unionByName(wave2).write.parquet(s"$tmp/all/documents.parquet")
    val batchQ = rows(
      SparkEntry.queries("q206_dupgraph_source_modularity")(spark, s"$tmp/all"))
    assert(streamed === batchQ)
    // and the hand-computed table, so BOTH paths are pinned to the math
    assert(streamed === Seq(
      ("x", 2L, 2L, 6L, 0.5, 0.5625, -0.0625),
      ("y", 0L, 2L, 2L, 0.0, 0.0625, -0.0625)))
    graft.operators.OperatorCaches.release()
    graft.operators.FramePool.release()
  }

  test("streaming burst monitor equals the batch q215 over all arrivals") {
    val tmp = Files.createTempDirectory("streamspec").toString
    def mk(s: String) = java.sql.Timestamp.valueOf(s)
    // the hour-24 cell is SPLIT across the waves (1 event in wave 1,
    // 2 in wave 2), so the serving report must merge partials for one
    // (type, hour) cell — the failure mode a per-batch-only report has
    val wave1 = ((0 until 24).map(h => (mk(f"2024-03-01 $h%02d:15:00"), "e"))
      :+ ((mk("2024-03-02 00:30:00"), "e"))).toDF("ts", "event_type")
    val wave2 = (Seq.fill(2)((mk("2024-03-02 00:30:00"), "e"))
      ++ Seq.fill(4)((mk("2024-03-02 01:30:00"), "e"))).toDF("ts", "event_type")
    wave1.write.parquet(s"$tmp/in")
    EventStreams.burstMonitorSink(
      EventStreams.fileStream(spark, wave1.schema, s"$tmp/in"),
      "ts", "event_type", s"$tmp/state", s"$tmp/report", s"$tmp/ckpt")
      .awaitTermination()
    wave2.write.mode("append").parquet(s"$tmp/in")
    EventStreams.burstMonitorSink(
      EventStreams.fileStream(spark, wave1.schema, s"$tmp/in"),
      "ts", "event_type", s"$tmp/state", s"$tmp/report", s"$tmp/ckpt")
      .awaitTermination()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("event_type", "hour").collect().map(r =>
        (r.getString(0), r.getTimestamp(1).toString, r.getLong(2),
          r.getLong(3),
          if (r.isNullAt(4)) -1.0 else r.getDouble(4), // null: NaN != NaN
          r.getBoolean(5))).toSeq
    val streamed = rows(spark.read.parquet(s"$tmp/report"))
    wave1.unionByName(wave2).write.parquet(s"$tmp/all/events.parquet")
    val batchQ = rows(
      SparkEntry.queries("q215_burst_detection")(spark, s"$tmp/all"))
    assert(streamed === batchQ)
    // the split cell merged to n=3 (exactly 3x: not a burst) and the
    // hour-25 spike IS flagged
    val h24 = streamed.find(_._2 == "2024-03-02 00:00:00.0").get
    assert(h24._3 === 3L && h24._4 === 24L && !h24._6)
    assert(streamed.exists(_._6))
  }

  test("streaming CMS maintenance equals the batch q217 over all arrivals") {
    val tmp = Files.createTempDirectory("streamspec").toString
    // probe terms 'spark'/'join'/'scan' straddle the waves, so serving
    // must merge both counter AND exact partials per term
    val wave1 = Seq((1L, "spark join filter spark"), (2L, "scan the window"))
      .toDF("doc_id", "text")
    val wave2 = Seq((3L, "spark stream batch"), (4L, "join scan hash hash"))
      .toDF("doc_id", "text")
    val terms = graft.queries.TextQueries.CmsTerms
    wave1.write.parquet(s"$tmp/in")
    EventStreams.cmsMonitorSink(
      EventStreams.fileStream(spark, wave1.schema, s"$tmp/in"),
      "text", terms, s"$tmp/state", s"$tmp/report", s"$tmp/ckpt")
      .awaitTermination()
    wave2.write.mode("append").parquet(s"$tmp/in")
    EventStreams.cmsMonitorSink(
      EventStreams.fileStream(spark, wave1.schema, s"$tmp/in"),
      "text", terms, s"$tmp/state", s"$tmp/report", s"$tmp/ckpt")
      .awaitTermination()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("term").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
    val streamed = rows(spark.read.parquet(s"$tmp/report"))
    wave1.unionByName(wave2).select("doc_id", "text")
      .write.parquet(s"$tmp/all/documents.parquet")
    val batchQ = rows(
      SparkEntry.queries("q217_countmin_heavyhitters")(spark, s"$tmp/all"))
    assert(streamed === batchQ)
    // the straddling terms merged to their true totals
    val byTerm = streamed.map(t => t._1 -> t._2).toMap
    assert(byTerm("spark") === 3L && byTerm("join") === 2L
      && byTerm("scan") === 2L && byTerm("hash") === 2L)
    assert(streamed.forall(t => t._3 >= t._2)) // one-sided, streamed too
  }

  test("streaming Bloom maintenance equals the batch q219 over all arrivals") {
    val tmp = Files.createTempDirectory("streamspec").toString
    // the member stream is src0 text arriving in two waves; probes are
    // src1's vocabulary — q219's exact shape, with probe terms present
    // in BOTH waves so serving must merge bit AND member partials
    val wave1 = Seq((1L, "alpha beta gamma", "src0"),
      (2L, "delta epsilon", "src0")).toDF("doc_id", "text", "source")
    val wave2 = Seq((3L, "zeta eta alpha", "src0"),
      (4L, "theta iota", "src0")).toDF("doc_id", "text", "source")
    val probeDocs = Seq((5L, "alpha theta nu xi omicron", "src1"))
      .toDF("doc_id", "text", "source")
    val probes = probeDocs
      .select(explode(split(col("text"), " ")).as("term")).distinct()
    wave1.write.parquet(s"$tmp/in")
    EventStreams.bloomMonitorSink(
      EventStreams.fileStream(spark, wave1.schema, s"$tmp/in"),
      "text", probes, s"$tmp/state", s"$tmp/report", s"$tmp/ckpt")
      .awaitTermination()
    wave2.write.mode("append").parquet(s"$tmp/in")
    EventStreams.bloomMonitorSink(
      EventStreams.fileStream(spark, wave1.schema, s"$tmp/in"),
      "text", probes, s"$tmp/state", s"$tmp/report", s"$tmp/ckpt")
      .awaitTermination()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("term").collect()
        .map(r => (r.getString(0), r.getBoolean(1), r.getBoolean(2),
          r.getBoolean(3))).toSeq
    val streamed = rows(spark.read.parquet(s"$tmp/report"))
    wave1.unionByName(wave2).unionByName(probeDocs)
      .write.parquet(s"$tmp/all/documents.parquet")
    val batchQ = rows(
      SparkEntry.queries("q219_bloom_membership")(spark, s"$tmp/all"))
    assert(streamed === batchQ)
    // members straddling the waves test positive; no false negatives
    val byTerm = streamed.map(t => t._1 -> t).toMap
    assert(byTerm("alpha")._2 && byTerm("alpha")._3)
    assert(byTerm("theta")._2 && byTerm("theta")._3)
    assert(streamed.forall(t => !t._3 || t._2))
  }

  test("streaming histogram maintenance equals batch q224 estimates over all arrivals") {
    val tmp = Files.createTempDirectory("streamspec").toString
    // values straddle bin boundaries and the waves split unevenly, so
    // serving must merge per-bin partials (sums of sums), not read the
    // last batch; wave2 shifts the distribution to move the quantiles
    def ev(id: Long, v: Double) =
      (id, java.sql.Timestamp.valueOf("2024-03-01 10:00:00"), 1L,
        "m", v, "{}")
    val wave1 = (0 until 40).map(i => ev(i.toLong, 0.5 + i * 0.35))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val wave2 = (0 until 25).map(i => ev(100L + i, 9.25 + i * 1.1))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    wave1.write.parquet(s"$tmp/in")
    EventStreams.histMonitorSink(
      EventStreams.fileStream(spark, wave1.schema, s"$tmp/in"),
      "value", s"$tmp/state", s"$tmp/report", s"$tmp/ckpt")
      .awaitTermination()
    wave2.write.mode("append").parquet(s"$tmp/in")
    EventStreams.histMonitorSink(
      EventStreams.fileStream(spark, wave1.schema, s"$tmp/in"),
      "value", s"$tmp/state", s"$tmp/report", s"$tmp/ckpt")
      .awaitTermination()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("p_pct").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val streamed = rows(spark.read.parquet(s"$tmp/report"))
    wave1.unionByName(wave2).write.parquet(s"$tmp/all/events.parquet")
    val batchQ = SparkEntry.queries("q224_hist_quantile_sketch")(spark, s"$tmp/all")
      .select(col("p_pct"), col("target_rank"), col("est_fp"))
    assert(streamed === rows(batchQ))
    assert(streamed.map(_._1) === Seq(1L, 5L, 25L, 50L, 75L, 90L, 99L))
  }

  test("streaming OLS maintenance equals batch q222 over all arrivals") {
    val tmp = Files.createTempDirectory("streamspec").toString
    // y = 3 + 2x split across waves mid-series: the solved trend is
    // only correct if the five sufficient statistics truly merge
    def ev(id: Long, day: Int, typ: String, v: Double) =
      (id, java.sql.Timestamp.valueOf(f"2024-01-${day + 1}%02d 06:00:00"),
        1L, typ, v, "{}")
    val wave1 = ((0 until 5).map(x => ev(x.toLong, x, "lin", 3.0 + 2.0 * x))
      :+ ev(50L, 4, "flat", 7.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val wave2 = (5 until 10).map(x => ev(x.toLong, x, "lin", 3.0 + 2.0 * x))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    wave1.write.parquet(s"$tmp/in")
    EventStreams.olsMonitorSink(
      EventStreams.fileStream(spark, wave1.schema, s"$tmp/in"),
      s"$tmp/state", s"$tmp/report", s"$tmp/ckpt")
      .awaitTermination()
    wave2.write.mode("append").parquet(s"$tmp/in")
    EventStreams.olsMonitorSink(
      EventStreams.fileStream(spark, wave1.schema, s"$tmp/in"),
      s"$tmp/state", s"$tmp/report", s"$tmp/ckpt")
      .awaitTermination()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("event_type").collect()
        .map(r => (r.getString(0), r.getLong(1),
          Option(r.get(2)), Option(r.get(3)))).toSeq
    val streamed = rows(spark.read.parquet(s"$tmp/report"))
    wave1.unionByName(wave2).write.parquet(s"$tmp/all/events.parquet")
    assert(streamed ===
      rows(SparkEntry.queries("q222_ols_value_trend")(spark, s"$tmp/all")))
    // and the merged solve is the exact planted line
    val byType = streamed.map(t => t._1 -> t).toMap
    assert(byType("lin")._3 === Some(2000000000L))
    assert(byType("lin")._4 === Some(3000000000L))
    assert(byType("flat") === (("flat", 1L, None, None)))
  }

  test("streaming anisotropy maintenance equals batch q250 over all arrivals") {
    val tmp = Files.createTempDirectory("streamspec").toString
    // a planted dominant direction split across waves: the centered
    // scatter G = n²M − n·S₁S₂ is only right if BOTH moment frames
    // truly merge (wave 2 shifts the mean, so a per-wave centering
    // would get a different G than the global one)
    val wave1 = Seq(
      (1L, Seq(0.1, 0.2, 0.0)), (2L, Seq(0.2, 0.4, 0.01)),
      (3L, Seq(-0.1, -0.2, 0.0)))
      .toDF("vec_id", "v")
    val wave2 = Seq(
      (4L, Seq(0.3, 0.6, -0.01)), (5L, Seq(0.5, 1.0, 0.02)))
      .toDF("vec_id", "v")
    wave1.write.parquet(s"$tmp/in")
    EventStreams.anisotropyMonitorSink(
      EventStreams.fileStream(spark, wave1.schema, s"$tmp/in"),
      "vec_id", "v", s"$tmp/state", s"$tmp/report", s"$tmp/ckpt")
      .awaitTermination()
    wave2.write.mode("append").parquet(s"$tmp/in")
    EventStreams.anisotropyMonitorSink(
      EventStreams.fileStream(spark, wave1.schema, s"$tmp/in"),
      "vec_id", "v", s"$tmp/state", s"$tmp/report", s"$tmp/ckpt")
      .awaitTermination()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("pos").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq
    val streamed = rows(spark.read.parquet(s"$tmp/report"))
    val batch = rows(graft.operators.Similarity.dominantDirection(
      wave1.unionByName(wave2), "vec_id", "v"))
    assert(streamed === batch)
    // the report sees the planted near-1D geometry
    assert(streamed.head._4 > 9900L) // aniso_bp ≈ 10⁴
    graft.operators.OperatorCaches.release()
  }

  test("streaming centroid maintenance merges SUMS, not truncations") {
    val tmp = Files.createTempDirectory("streamspec").toString
    // label 0 splits 1+2 across the waves with a count-3 division that
    // truncates: merged mu = (1+2+4)e8 // 3 = 233333333 — averaging the
    // per-wave centroids (1e8, 3e8) would give 2e8 instead, so the
    // assert only passes if the state truly merges moment partials
    val wave1 = Seq((1L, Seq(0.1), 0), (2L, Seq(-0.5), 1))
      .toDF("vec_id", "v", "label")
    val wave2 = Seq((3L, Seq(0.2), 0), (4L, Seq(0.4), 0))
      .toDF("vec_id", "v", "label")
    wave1.write.parquet(s"$tmp/in")
    EventStreams.centroidMonitorSink(
      EventStreams.fileStream(spark, wave1.schema, s"$tmp/in"),
      "vec_id", "v", "label", s"$tmp/state", s"$tmp/report", s"$tmp/ckpt")
      .awaitTermination()
    wave2.write.mode("append").parquet(s"$tmp/in")
    EventStreams.centroidMonitorSink(
      EventStreams.fileStream(spark, wave1.schema, s"$tmp/in"),
      "vec_id", "v", "label", s"$tmp/state", s"$tmp/report", s"$tmp/ckpt")
      .awaitTermination()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("clbl", "pos").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
    val streamed = rows(spark.read.parquet(s"$tmp/report"))
    val batch = rows(graft.operators.Similarity.centroidsFromMoments(
      graft.operators.Similarity.labelMoments(
        wave1.unionByName(wave2), "vec_id", "v", "label")))
    assert(streamed === batch)
    assert(streamed === Seq((0, 0, 233333333L), (1, 0, -500000000L)))
    graft.operators.OperatorCaches.release()
  }

  test("streaming source cap equals batch sourceCap over all arrivals, " +
      "evictions audited") {
    val tmp = Files.createTempDirectory("streamspec").toString
    // cap=2. Wave 1 fills source a with ids 1 (q=50) and 2 (q=90);
    // wave 2's id 3 (q=70) EVICTS the weaker incumbent 1, its id 4
    // ties id 3 at q=70 and loses on the id tiebreak (rejected on
    // arrival), and source b's lone doc rides through untouched —
    // order-independence means this must equal batch sourceCap(all)
    val wave1 = Seq((1L, "a", 50L, "t1"), (2L, "a", 90L, "t2"),
      (5L, "b", 7L, "t5"))
      .toDF("doc_id", "source", "q", "text")
    val wave2 = Seq((3L, "a", 70L, "t3"), (4L, "a", 70L, "t4"))
      .toDF("doc_id", "source", "q", "text")
    wave1.write.parquet(s"$tmp/in")
    EventStreams.sourceCapSink(
      EventStreams.fileStream(spark, wave1.schema, s"$tmp/in"),
      "source", "doc_id", "q", 2, s"$tmp/base", s"$tmp/audit",
      s"$tmp/ckpt").awaitTermination()
    wave2.write.mode("append").parquet(s"$tmp/in")
    EventStreams.sourceCapSink(
      EventStreams.fileStream(spark, wave1.schema, s"$tmp/in"),
      "source", "doc_id", "q", 2, s"$tmp/base", s"$tmp/audit",
      s"$tmp/ckpt").awaitTermination()
    val streamed = spark.read.parquet(s"$tmp/base")
      .select("doc_id", "source", "q", "text")
      .as[(Long, String, Long, String)].collect().toSeq.sortBy(_._1)
    val allDocs = wave1.unionByName(wave2)
    val batchKeep = graft.operators.Mixture.sourceCap(
        allDocs, "source", "doc_id",
        org.apache.spark.sql.functions.col("q"), 2)
      .filter(org.apache.spark.sql.functions.col("rk") <= 2)
      .select("source", "doc_id")
    val batch = allDocs.join(batchKeep, Seq("source", "doc_id"))
      .select("doc_id", "source", "q", "text")
      .as[(Long, String, Long, String)].collect().toSeq.sortBy(_._1)
    assert(streamed === batch)
    assert(streamed.map(_._1) === Seq(2L, 3L, 5L))
    // the audit log carries the eviction (id 1) and the rejection (id 4)
    val audited = spark.read.parquet(s"$tmp/audit")
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(audited === Seq(1L, 4L))
    graft.operators.OperatorCaches.release()
  }

  test("streaming epoch schedule merges token COUNTS, not schedules") {
    val tmp = Files.createTempDirectory("streamspec").toString
    // source a splits 10+90 tokens across the waves: scheduling wave 1
    // alone would cap a at 4 epochs of 10 tokens; the merged 100-token
    // count schedules differently — only count-merging gets this right
    def doc(id: Long, src: String, words: Int) =
      (id, Seq.fill(words)("w").mkString(" "), src)
    val wave1 = Seq(doc(1, "a", 10), doc(2, "b", 200), doc(3, "c", 50))
      .toDF("doc_id", "text", "source")
    val wave2 = Seq(doc(4, "a", 90), doc(5, "c", 30))
      .toDF("doc_id", "text", "source")
    wave1.write.parquet(s"$tmp/in")
    EventStreams.epochScheduleMonitorSink(
      EventStreams.fileStream(spark, wave1.schema, s"$tmp/in"),
      "source", "text", s"$tmp/state", s"$tmp/report", s"$tmp/ckpt")
      .awaitTermination()
    wave2.write.mode("append").parquet(s"$tmp/in")
    EventStreams.epochScheduleMonitorSink(
      EventStreams.fileStream(spark, wave1.schema, s"$tmp/in"),
      "source", "text", s"$tmp/state", s"$tmp/report", s"$tmp/ckpt")
      .awaitTermination()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("source").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    val streamed = rows(spark.read.parquet(s"$tmp/report"))
    val batch = rows(graft.operators.Mixture.epochSchedule(
      wave1.unionByName(wave2).groupBy(col("source"))
        .agg(org.apache.spark.sql.functions.sum(
          size(split(col("text"), " ")).cast("long")).as("tokens"))))
    assert(streamed === batch)
    // total 380 tokens, budget 760, target 253: a (100 tok) needs 3
    // epochs and still misses 253 → wave-1-only scheduling (4 epochs of
    // 10 = 40 served) would differ everywhere
    assert(streamed.find(_._1 == "a").get._4 === 3L)  // epochs
    assert(streamed.find(_._1 == "a").get._5 === 253L) // served = target
    graft.operators.OperatorCaches.release()
  }

  test("streaming logit training merges raw FEATURE partials and " +
      "re-trains at serve — per-wave training would center per-wave " +
      "means and diverge") {
    val tmp = Files.createTempDirectory("streamspec").toString
    // waves with sharply different length/stopword profiles: the
    // centering means over either wave alone truncate differently from
    // the merged means, so only raw-partial merging + serve-time
    // re-training reproduces batch training over all arrivals. doc 5
    // takes the planted boilerplate label (doc_id % 5 = 0) so both
    // classes are present in the merged training frame.
    def doc(id: Long, words: Int, stop: Int) =
      (id, (Seq.fill(stop)("the") ++ Seq.fill(words - stop)("word"))
        .mkString(" "))
    val wave1 = Seq(doc(1, 10, 5), doc(2, 12, 1), doc(3, 9, 0))
      .toDF("doc_id", "text")
    val wave2 = Seq(doc(4, 220, 40), doc(5, 180, 2), doc(6, 260, 10))
      .toDF("doc_id", "text")
    wave1.write.parquet(s"$tmp/in")
    def open() = EventStreams.logitMonitorSink(
      EventStreams.fileStream(spark, wave1.schema, s"$tmp/in"),
      "doc_id", "text", s"$tmp/state", s"$tmp/report", s"$tmp/ckpt")
    open().awaitTermination()
    wave2.write.mode("append").parquet(s"$tmp/in")
    open().awaitTermination()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("round").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq
    val streamed = rows(spark.read.parquet(s"$tmp/report"))
    // batch twin over ALL arrivals through the same operator tree
    val all = wave1.unionByName(wave2)
    val batch = graft.operators.Logit.trainTrajectory(
      graft.operators.Logit.features(graft.operators.Logit.augment(all)))
      .map(w => (w.round, w.w0, w.w1, w.w2, w.w3))
    assert(streamed === batch)
    // and the closure is non-trivial: training wave 2 alone (its own
    // means) yields a DIFFERENT trajectory than the merged one
    val w2only = graft.operators.Logit.trainTrajectory(
      graft.operators.Logit.features(graft.operators.Logit.augment(
        wave2)))
      .map(w => (w.round, w.w0, w.w1, w.w2, w.w3))
    assert(w2only !== batch)
    graft.operators.OperatorCaches.release()
  }

  test("streaming embedding drift merges MOMENTS, not centroids") {
    val tmp = Files.createTempDirectory("streamspec").toString
    // label 0 / half 0 (even ids) splits across waves with a count-3
    // division that truncates: merged mu0 = (1+2+4)e5·1000 // 3 =
    // 233333333 — the per-wave centroids average to something else, so
    // the assert only passes if the state merges raw sums
    val wave1 = Seq((2L, Seq(0.1), 0), (4L, Seq(0.2), 0),
      (1L, Seq(-0.5), 0)).toDF("vec_id", "v", "label")
    val wave2 = Seq((6L, Seq(0.4), 0), (3L, Seq(0.3), 0))
      .toDF("vec_id", "v", "label")
    wave1.write.parquet(s"$tmp/in")
    EventStreams.embeddingDriftMonitorSink(
      EventStreams.fileStream(spark, wave1.schema, s"$tmp/in"),
      "vec_id", "v", "label", s"$tmp/state", s"$tmp/report", s"$tmp/ckpt")
      .awaitTermination()
    wave2.write.mode("append").parquet(s"$tmp/in")
    EventStreams.embeddingDriftMonitorSink(
      EventStreams.fileStream(spark, wave1.schema, s"$tmp/in"),
      "vec_id", "v", "label", s"$tmp/state", s"$tmp/report", s"$tmp/ckpt")
      .awaitTermination()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("label").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
    val streamed = rows(spark.read.parquet(s"$tmp/report"))
    val batch = rows(graft.operators.Similarity.driftFromMoments(
      graft.operators.Similarity.driftMoments(
        wave1.unionByName(wave2), "vec_id", "v", "label")))
    assert(streamed === batch)
    // exact trajectory: half-0 mu = 7e5·1000 // 3 = 233333333;
    // half-1 mu = (−5e5 + 3e5)·1000 // 2 = −100000000;
    // drift_q2 = 333333333² // 10⁶ = 111111110888
    assert(streamed === Seq((0, 3L, 2L, 111111110888L)))
    graft.operators.OperatorCaches.release()
  }

  test("streaming l-diversity merges the PAIR SET, not per-batch l") {
    val tmp = Files.createTempDirectory("streamspec").toString
    // group (1, A): wave 1 is all bucket 10, wave 2 adds bucket 20 —
    // per-batch l would read 1 in both waves; only the unioned distinct
    // pair set sees the cross-wave diversity (l = 2)
    val wave1 = Seq((1, "A", 10L), (1, "A", 10L), (2, "B", 7L))
      .toDF("nat", "seg", "sens")
    val wave2 = Seq((1, "A", 20L), (2, "B", 7L))
      .toDF("nat", "seg", "sens")
    wave1.write.parquet(s"$tmp/in")
    EventStreams.lDiversityMonitorSink(
      EventStreams.fileStream(spark, wave1.schema, s"$tmp/in"),
      Seq("nat", "seg"), "sens", s"$tmp/state", s"$tmp/report",
      s"$tmp/ckpt").awaitTermination()
    wave2.write.mode("append").parquet(s"$tmp/in")
    EventStreams.lDiversityMonitorSink(
      EventStreams.fileStream(spark, wave1.schema, s"$tmp/in"),
      Seq("nat", "seg"), "sens", s"$tmp/state", s"$tmp/report",
      s"$tmp/ckpt").awaitTermination()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("l_distinct").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getBoolean(3))).toSeq
    val streamed = rows(spark.read.parquet(s"$tmp/report"))
    val all = wave1.unionByName(wave2)
    val batch = rows(graft.operators.Quality.lDiversityReport(
      all.groupBy(col("nat"), col("seg"))
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("gsz"),
          org.apache.spark.sql.functions.countDistinct(col("sens"))
            .as("l"))))
    assert(streamed === batch)
    assert(streamed === Seq((1L, 1L, 2L, true), (2L, 1L, 3L, true)))
    graft.operators.OperatorCaches.release()
  }

  test("source cap survivor state is idempotent under checkpoint replay") {
    val tmp = Files.createTempDirectory("streamspec").toString
    val wave = Seq((1L, "a", 50L, "t1"), (2L, "a", 90L, "t2"),
      (3L, "a", 70L, "t3"), (5L, "b", 7L, "t5"))
      .toDF("doc_id", "source", "q", "text")
    wave.write.parquet(s"$tmp/in")
    EventStreams.sourceCapSink(
      EventStreams.fileStream(spark, wave.schema, s"$tmp/in"),
      "source", "doc_id", "q", 2, s"$tmp/base", s"$tmp/audit",
      s"$tmp/ckpt1").awaitTermination()
    val before = spark.read.parquet(s"$tmp/base")
      .select("doc_id", "source", "q", "text")
      .as[(Long, String, Long, String)].collect().toSeq.sorted
    // REPLAY shape: a fresh checkpoint re-delivers the same batch whose
    // rows are already merged into base. Without the across-the-merge
    // dedupe each key would rank twice (two cap slots / spurious audit
    // rows) and the keepIds join would multiply duplicates into the
    // survivor state permanently.
    EventStreams.sourceCapSink(
      EventStreams.fileStream(spark, wave.schema, s"$tmp/in"),
      "source", "doc_id", "q", 2, s"$tmp/base", s"$tmp/audit",
      s"$tmp/ckpt2").awaitTermination()
    val after = spark.read.parquet(s"$tmp/base")
      .select("doc_id", "source", "q", "text")
      .as[(Long, String, Long, String)].collect().toSeq.sorted
    assert(after === before) // identical survivor set, no duplicate rows
    assert(after.map(_._1) === Seq(2L, 3L, 5L))
    // the audit log is at-least-once BY CONTRACT: the replayed batch
    // re-appends its evictions, and read-side dedupe on
    // (source, id, batch_id) recovers the exact original log
    val audit = spark.read.parquet(s"$tmp/audit")
      .select("source", "doc_id", "batch_id")
      .as[(String, Long, Long)].collect().toSeq
    assert(audit.distinct.sorted === Seq(("a", 1L, 0L)))
    graft.operators.OperatorCaches.release()
  }

  test("media ingest corpus rows carry batch_id for replay dedupe") {
    val tmp = Files.createTempDirectory("streamspec").toString
    import graft.multimodal.Multimodal
    val wave = Seq((2L, Multimodal.encodePng(2L)),
      (3L, Multimodal.encodeWav(3L))).toDF("asset_id", "bytes")
    wave.write.parquet(s"$tmp/in")
    EventStreams.mediaIngestSink(
      EventStreams.fileStream(spark, wave.schema, s"$tmp/in"),
      s"$tmp/corpus", s"$tmp/quarantine", s"$tmp/ckpt")
      .awaitTermination()
    val corpus = spark.read.parquet(s"$tmp/corpus")
    // both append-only logs share the replay remedy: dedupe on
    // (asset_id, batch_id) — which requires batch_id on the corpus side
    // too, not just the quarantine log
    assert(corpus.columns.contains("batch_id"))
    assert(corpus.select("asset_id", "batch_id")
      .as[(Long, Long)].collect().toSeq.sorted === Seq((2L, 0L), (3L, 0L)))
    graft.operators.OperatorCaches.release()
  }

  test("streaming media ingest quarantines damage and matches batch " +
      "classification") {
    val tmp = Files.createTempDirectory("streamspec").toString
    import graft.multimodal.Multimodal
    val goodPng = Multimodal.encodePng(2L)
    val goodWav = Multimodal.encodeWav(3L)
    val badPng = {
      val c = Multimodal.encodePng(4L).clone()
      c(45) = (c(45) ^ 0x1).toByte; c
    }
    val wave1 = Seq((2L, goodPng), (3L, goodWav))
      .toDF("asset_id", "bytes")
    val wave2 = Seq((4L, badPng),
      (5L, Array.tabulate[Byte](64)(i => (i * 37).toByte)),
      (6L, Multimodal.encodeWav(6L)))
      .toDF("asset_id", "bytes")
    wave1.write.parquet(s"$tmp/in")
    EventStreams.mediaIngestSink(
      EventStreams.fileStream(spark, wave1.schema, s"$tmp/in"),
      s"$tmp/corpus", s"$tmp/quarantine", s"$tmp/ckpt")
      .awaitTermination()
    wave2.write.mode("append").parquet(s"$tmp/in")
    EventStreams.mediaIngestSink(
      EventStreams.fileStream(spark, wave1.schema, s"$tmp/in"),
      s"$tmp/corpus", s"$tmp/quarantine", s"$tmp/ckpt")
      .awaitTermination()
    val corpus = spark.read.parquet(s"$tmp/corpus")
      .select("asset_id", "bucket", "n_units", "checksum")
      .as[(Long, String, Long, Long)].collect().toSeq.sortBy(_._1)
    val batch = Multimodal.classifyMedia(wave1.unionByName(wave2))
      .filter(!org.apache.spark.sql.functions.col("bucket").isin(
        "png_corrupt", "wav_corrupt", "unknown_format"))
      .select("asset_id", "bucket", "n_units", "checksum")
      .as[(Long, String, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(corpus === batch)
    assert(corpus.map(r => (r._1, r._2)) ===
      Seq((2L, "png"), (3L, "wav"), (6L, "wav")))
    val q = spark.read.parquet(s"$tmp/quarantine")
      .select("asset_id", "bucket").as[(Long, String)]
      .collect().toSeq.sortBy(_._1)
    assert(q === Seq((4L, "png_corrupt"), (5L, "unknown_format")))
    graft.operators.OperatorCaches.release()
  }

  test("streaming KS drift maintenance equals batch q225 over all arrivals") {
    val tmp = Files.createTempDirectory("streamspec").toString
    // every source straddles both waves with overlapping lengths, so
    // the served D is only right if count partials truly merge — and
    // wave 2 shifts src1's distribution to move its sup point
    def doc(id: Long, src: String, len: Long) =
      (id, "x" * len.toInt, "en", src, len)
    val wave1 = Seq(doc(1, "src0", 4), doc(2, "src0", 7), doc(3, "src0", 9),
      doc(4, "src1", 7), doc(5, "src1", 12), doc(6, "src2", 4))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val wave2 = Seq(doc(7, "src0", 5), doc(8, "src0", 12),
      doc(9, "src1", 15), doc(10, "src1", 18), doc(11, "src2", 9))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    wave1.write.parquet(s"$tmp/in")
    EventStreams.ksMonitorSink(
      EventStreams.fileStream(spark, wave1.schema, s"$tmp/in"),
      "source", "n_chars", "src0", s"$tmp/state", s"$tmp/report", s"$tmp/ckpt")
      .awaitTermination()
    wave2.write.mode("append").parquet(s"$tmp/in")
    EventStreams.ksMonitorSink(
      EventStreams.fileStream(spark, wave1.schema, s"$tmp/in"),
      "source", "n_chars", "src0", s"$tmp/state", s"$tmp/report", s"$tmp/ckpt")
      .awaitTermination()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("source").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getDouble(4))).toSeq
    val streamed = rows(spark.read.parquet(s"$tmp/report"))
    wave1.unionByName(wave2).write.parquet(s"$tmp/all/documents.parquet")
    assert(streamed ===
      rows(SparkEntry.queries("q225_ks_drift")(spark, s"$tmp/all")))
    assert(streamed.map(_._1) === Seq("src1", "src2"))
  }

  test("drift monitor reports arriving-batch drift against accumulated counts") {
    val tmp = Files.createTempDirectory("streamspec").toString
    val wave1 = (0 until 30).map(i => (i.toLong, "x y x y x")).toDF("doc_id", "text")
    val wave2 = (30 until 60).map(i => (i.toLong, "drifty x drifty x z"))
      .toDF("doc_id", "text")
    wave1.write.parquet(s"$tmp/in")
    EventStreams.driftMonitorSink(
      EventStreams.fileStream(spark, wave1.schema, s"$tmp/in"), "text",
      s"$tmp/state", s"$tmp/report", s"$tmp/ckpt", minTotal = 10L)
      .awaitTermination()
    // batch 0 has no baseline → no report dir yet
    assert(!new java.io.File(s"$tmp/report").isDirectory)
    wave2.write.mode("append").parquet(s"$tmp/in")
    EventStreams.driftMonitorSink(
      EventStreams.fileStream(spark, wave1.schema, s"$tmp/in"), "text",
      s"$tmp/state", s"$tmp/report", s"$tmp/ckpt", minTotal = 10L)
      .awaitTermination()
    val report = spark.read.parquet(s"$tmp/report")
      .orderBy(desc("drift6"), col("tok")).collect()
    // the planted new token dominates the drift ranking
    assert(report.head.getString(0) === "drifty", report.toSeq.toString)
    // streamed report == the counts-form operator applied batch-vs-corpus
    val direct = graft.operators.CorpusStats.tokenDriftFromCounts(
      graft.operators.CorpusStats.tokenCounts(wave2, "text"),
      graft.operators.CorpusStats.tokenCounts(wave1, "text"),
      minTotal = 10L)
      .collect().map(r => (r.getString(0), r.getLong(3))).toSeq
    assert(report.map(r => (r.getString(0), r.getLong(3))).toSeq === direct)
    // and the counts form agrees with the one-pass batch operator on the
    // equivalent side-labeled corpus
    val labeled = wave2.withColumn("side", lit("A"))
      .unionByName(wave1.withColumn("side", lit("B")))
    val onePass = graft.operators.CorpusStats.tokenDrift(
      labeled, "text", sideA = col("side") === "A", minTotal = 10L)
      .collect().map(r => (r.getString(0), r.getLong(3))).toSeq
    assert(direct === onePass)
  }

  test("anomaly monitor over streamed waves equals the batch computation") {
    val tmp = Files.createTempDirectory("streamspec").toString
    val base = 1767225600L // 2026-01-01 00:00:00 UTC
    def wave(hrs: Range) = hrs.flatMap { hr =>
      val n = if (hr == 30) 100 else 10
      (0 until n).map(i => (hr.toLong * 1000 + i, base + hr * 3600L + 1800L))
    }.toDF("event_id", "epoch")
      .select(col("event_id"), timestamp_seconds(col("epoch")).as("ts"))
    val w1 = wave(0 until 20); val w2 = wave(20 until 31)
    w1.write.parquet(s"$tmp/in")
    EventStreams.anomalyMonitorSink(
      EventStreams.fileStream(spark, w1.schema, s"$tmp/in"), "ts",
      s"$tmp/state", s"$tmp/report", s"$tmp/ckpt").awaitTermination()
    w2.write.mode("append").parquet(s"$tmp/in")
    EventStreams.anomalyMonitorSink(
      EventStreams.fileStream(spark, w1.schema, s"$tmp/in"), "ts",
      s"$tmp/state", s"$tmp/report", s"$tmp/ckpt").awaitTermination()
    val report = spark.read.parquet(s"$tmp/report").orderBy("h").collect()
    assert(report.length === 31)
    val flagged = report.filter(_.getBoolean(4))
    assert(flagged.length === 1 && flagged.head.getLong(1) === 100L)
    // full-window quiet hours carry dev = 0 against a zero-variance
    // baseline → never flagged; partial windows are gated off by n = 24
    assert(report.count(r => r.getLong(2) === 24L) === 31 - 24)
  }

  test("streamed embedding ingest drops semantic dups within and across batches") {
    val tmp = Files.createTempDirectory("streamspec").toString
    val planes = graft.functions.VectorFunctions.gaussianPlanes(8, 8)
    def jitter(v: Seq[Double], eps: Double) = v.map(_ + eps)
    val base1 = Seq(1.0, 2.0, -1.0, 0.5, 3.0, -2.0, 1.5, 0.25)
    val base2 = Seq(-3.0, 1.0, 2.0, -0.5, 1.0, 2.5, -1.0, 0.75)
    val base3 = Seq(0.5, -1.5, 2.5, 3.0, -2.0, 1.0, 0.25, -0.75)
    val wave1 = Seq((1L, base1), (2L, jitter(base1, 1e-4)), (3L, base2))
      .toDF("vec_id", "v")
    val wave2 = Seq((11L, base3), (12L, jitter(base3, 1e-4)),
      (13L, jitter(base1, 1e-4)), (14L, base2.map(-_)))
      .toDF("vec_id", "v")
    wave1.write.parquet(s"$tmp/in")
    EventStreams.embeddingIngestSink(
      EventStreams.fileStream(spark, wave1.schema, s"$tmp/in"),
      "vec_id", "v", s"$tmp/corpus", s"$tmp/ckpt",
      planes, planesPerBand = 4, minCos = 0.999).awaitTermination()
    wave2.write.mode("append").parquet(s"$tmp/in")
    EventStreams.embeddingIngestSink(
      EventStreams.fileStream(spark, wave1.schema, s"$tmp/in"),
      "vec_id", "v", s"$tmp/corpus", s"$tmp/ckpt",
      planes, planesPerBand = 4, minCos = 0.999).awaitTermination()
    val kept = spark.read.parquet(s"$tmp/corpus")
      .select("vec_id").as[Long].collect().toSet
    // one survivor per near-identical group; the negated vector (cos = -1
    // to base2) and true uniques survive; the cross-batch twin of base1
    // is dropped against batch 1's survivor
    assert(kept === Set(1L, 3L, 11L, 14L))
  }

  test("upsertSink applies streamed CDC batches over a parquet base") {
    val tmp = Files.createTempDirectory("streamspec").toString
    val base = s"$tmp/base"
    // generation 0: seed the base directly
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
      .write.parquet(base)
    // batch 1 arrives on the stream: update k=2, insert k=4
    val updates1 = Seq((2L, "B"), (4L, "D")).toDF("k", "v")
    updates1.write.parquet(s"$tmp/in")
    val q1 = EventStreams.upsertSink(
      EventStreams.fileStream(spark, updates1.schema, s"$tmp/in"),
      Seq("k"), base, s"$tmp/ckpt")
    q1.awaitTermination()
    assert(spark.read.parquet(base).orderBy("k").as[(Long, String)].collect().toSeq
      === Seq((1L, "a"), (2L, "B"), (3L, "c"), (4L, "D")))
    // batch 2: a later AvailableNow run picks up only the NEW file
    // (checkpoint remembers batch 1) and applies it over the new base
    Seq((4L, "DD"), (5L, "E")).toDF("k", "v")
      .write.mode("append").parquet(s"$tmp/in")
    val q2 = EventStreams.upsertSink(
      EventStreams.fileStream(spark, updates1.schema, s"$tmp/in"),
      Seq("k"), base, s"$tmp/ckpt")
    q2.awaitTermination()
    assert(spark.read.parquet(base).orderBy("k").as[(Long, String)].collect().toSeq
      === Seq((1L, "a"), (2L, "B"), (3L, "c"), (4L, "DD"), (5L, "E")))
  }

  test("changelogSink applies streamed tombstones: deletes drop keys, latest seq wins") {
    val tmp = Files.createTempDirectory("streamspec").toString
    val base = s"$tmp/base"
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
      .write.parquet(base)
    // batch 1: delete k=2, update k=3 twice (seq 2 must win), insert k=4
    val ch1 = Seq((2L, "x", "D", 1L), (3L, "C1", "U", 1L),
      (3L, "C2", "U", 2L), (4L, "d", "I", 1L)).toDF("k", "v", "op", "seq")
    ch1.write.parquet(s"$tmp/in")
    EventStreams.changelogSink(
      EventStreams.fileStream(spark, ch1.schema, s"$tmp/in"),
      Seq("k"), base, s"$tmp/ckpt", seqCol = Some("seq")).awaitTermination()
    assert(spark.read.parquet(base).orderBy("k").as[(Long, String)].collect().toSeq
      === Seq((1L, "a"), (3L, "C2"), (4L, "d")))
    // batch 2: a delete for a key that never existed is a no-op; k=1 goes
    val ch2 = Seq((1L, "x", "D", 1L), (9L, "x", "D", 1L)).toDF("k", "v", "op", "seq")
    ch2.write.mode("append").parquet(s"$tmp/in")
    EventStreams.changelogSink(
      EventStreams.fileStream(spark, ch1.schema, s"$tmp/in"),
      Seq("k"), base, s"$tmp/ckpt", seqCol = Some("seq")).awaitTermination()
    assert(spark.read.parquet(base).orderBy("k").as[(Long, String)].collect().toSeq
      === Seq((3L, "C2"), (4L, "d")))
    // streamed result == the batch operator applied to the same changelog
    val batchEquiv = graft.operators.Snapshots.applyChangelog(
      graft.operators.Snapshots.applyChangelog(
        Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"),
        ch1, Seq("k"), "op", "seq"),
      ch2, Seq("k"), "op", "seq")
    assert(batchEquiv.orderBy("k").as[(Long, String)].collect().toSeq
      === Seq((3L, "C2"), (4L, "d")))
  }

  test("compact folds the small files a streamed upsert leaves behind") {
    val tmp = Files.createTempDirectory("streamspec").toString
    val base = s"$tmp/base"
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").write.parquet(base)
    // each upsert batch rewrites the base through the merge shuffle, so
    // the directory ends up as one part file per shuffle partition —
    // tiny files when the table is small; compact folds them back
    for (g <- 1 to 3) {
      val up = Seq((g * 10L, s"g$g")).toDF("k", "v")
      up.write.mode("append").parquet(s"$tmp/in")
      EventStreams.upsertSink(
        EventStreams.fileStream(spark, up.schema, s"$tmp/in"),
        Seq("k"), base, s"$tmp/ckpt").awaitTermination()
    }
    val expect = spark.read.parquet(base).orderBy("k")
      .as[(Long, String)].collect().toSeq
    val (nBefore, nAfter) = graft.operators.Layout.compact(
      spark, base, targetBytesPerFile = 1L << 30)
    assert(nBefore > 1)   // the rewrite left one file per shuffle partition
    assert(nAfter === 1)
    assert(spark.read.parquet(base).orderBy("k")
      .as[(Long, String)].collect().toSeq === expect)
  }

  test("upsertSink resolves same-key records within one batch by seqCol") {
    val tmp = Files.createTempDirectory("streamspec").toString
    val base = s"$tmp/base"
    // one AvailableNow run over BOTH files → a single micro-batch holding
    // two records for k=2; the seq column must pick the winner
    Seq((1L, "a", 10L), (2L, "b", 10L)).toDF("k", "v", "seq")
      .write.parquet(s"$tmp/in")
    Seq((2L, "B2", 20L), (3L, "c", 20L)).toDF("k", "v", "seq")
      .write.mode("append").parquet(s"$tmp/in")
    val schema = Seq((0L, "", 0L)).toDF("k", "v", "seq").schema
    val q = EventStreams.upsertSink(
      EventStreams.fileStream(spark, schema, s"$tmp/in"),
      Seq("k"), base, s"$tmp/ckpt", seqCol = Some("seq"))
    q.awaitTermination()
    val out = spark.read.parquet(base).orderBy("k")
      .as[(Long, String, Long)].collect()
    assert(out.toSeq === Seq((1L, "a", 10L), (2L, "B2", 20L), (3L, "c", 20L)))
  }

  test("stream-static enrichment join equals the batch broadcast join") {
    val tmp = Files.createTempDirectory("streamspec").toString
    val src = eventsBatch.select("event_id", "ts", "user_id", "event_type", "value")
      .limit(2000)
    src.write.parquet(s"$tmp/in")
    // static dim: user_id → segment (some users deliberately missing so
    // the left join's null path is exercised)
    val dim = spark.range(0, 30).toDF("user_id")
      .withColumn("segment", concat(lit("seg"), pmod(col("user_id"), lit(3))))

    val stream = EventStreams.fileStream(spark, src.schema, s"$tmp/in")
    val streamed = EventStreams.runAvailableNow(
      EventStreams.enrichWithDim(stream, dim, "user_id")
        .groupBy("segment").agg(count(lit(1)).as("n")),
      "enrich_stream", OutputMode.Complete)
      .orderBy(asc_nulls_first("segment"))
      .as[(String, Long)].collect()

    val batch = EventStreams.enrichWithDim(src, dim, "user_id")
      .groupBy("segment").agg(count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("segment"))
      .as[(String, Long)].collect()

    assert(streamed.toSeq === batch.toSeq)
    assert(streamed.map(_._2).sum === src.count())
    assert(streamed.nonEmpty)
  }

  test("census-derived watermark keeps every observed late row; a tighter " +
      "bound drops exactly the stragglers past it") {
    // the q277 → actuator loop closed end to end: a lateness census over
    // the REAL arrival order feeds suggestedWatermark, and the
    // watermarked hourly agg (q13's twin) runs over the same arrivals
    val tmp = Files.createTempDirectory("streamspec").toString
    def ev(id: Long, ts: String) =
      (id, Timestamp.valueOf(ts), 1L, "view", 1.0)
    val wave1 = Seq(ev(1, "2024-03-01 00:30:00"), ev(2, "2024-03-01 01:30:00"),
      ev(3, "2024-03-01 02:30:00"), ev(4, "2024-03-01 04:30:00"))
    val wave2 = Seq(
      ev(5, "2024-03-01 03:30:00"), // 1h behind the running max
      ev(6, "2024-02-29 20:30:00")) // the 8h straggler
    // far-future sentinel: advances the watermark past every real
    // window so Append mode finalizes them; its own window never emits
    val wave3 = Seq(ev(7, "2024-03-03 12:00:00"))
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value")

    // lateness census over the actual arrival order — q277's derivation
    // (distributed running max of event time at arrival)
    val arrivals = (wave1 ++ wave2).zipWithIndex.map { case (e, i) =>
      (i.toLong, e._4, e._2)
    }.toDF("arr", "event_type", "ts")
      .withColumn("us", expr("unix_micros(ts)"))
    val (rm) = graft.operators.PrefixSum.rankedRunningMax(
      arrivals, Seq(col("arr")), col("us"), "__rn", "pm")
    val census = rm.select(col("event_type"),
        when(col("pm").isNotNull && col("pm") > col("us"),
          col("pm") - col("us")).otherwise(0L).as("late_us"))
      .groupBy(col("event_type"),
        expr("CAST(CASE WHEN late_us = 0 THEN -1" +
          " ELSE late_us DIV 3600000000 END AS BIGINT)").as("late_bucket_h"))
      .agg(count(lit(1)).as("n_events"), max(col("late_us")).as("max_late_us"))
    val suggested = EventStreams.suggestedWatermark(census)
    // max observed lateness 8h (28800 s) + 25% margin = 36000 s
    assert(suggested === "36000 seconds")

    def deliver(dir: String, rows: Seq[(Long, Timestamp, Long, String, Double)],
                first: Boolean): Unit =
      rows.toDF(cols: _*).write.mode(if (first) "errorifexists" else "append")
        .parquet(dir)
    def run(tag: String, watermark: String): Map[String, Long] = {
      val in = s"$tmp/in_$tag"
      Seq(wave1, wave2, wave3).zipWithIndex.foreach { case (w, i) =>
        deliver(in, w, first = i == 0)
        val schema = wave1.toDF(cols: _*).schema
        // parquet Append sink + one shared checkpoint: watermark state
        // carries across the re-attached AvailableNow runs, so wave 2
        // is filtered against the watermark wave 1 advanced
        EventStreams.hourlyCounts(
            EventStreams.fileStream(spark, schema, in), watermark)
          .writeStream.format("parquet")
          .option("path", s"$tmp/out_$tag")
          .option("checkpointLocation", s"$tmp/ckpt_$tag")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start().awaitTermination()
      }
      spark.read.parquet(s"$tmp/out_$tag")
        .collect().map(r => r.getTimestamp(0).toString -> r.getLong(2)).toMap
    }

    // direction 1: the census-derived bound covers every OBSERVED
    // straggler — nothing is dropped (all 6 real rows accounted for)
    val kept = run("suggested", suggested)
    assert(kept.values.sum === 6L, s"suggested bound dropped rows: $kept")
    // direction 2: a 2h bound is tighter than the 8h straggler (but not
    // the 1h late row) — exactly the straggler is dropped
    val tight = run("tight", "2 hours")
    assert(tight.values.sum === 5L, s"expected one dropped row: $tight")
    assert(!tight.contains("2024-02-29 20:00:00.0")) // the straggler's window
    assert(tight.contains("2024-03-01 03:00:00.0")) // the 1h-late row's window
    assert(kept.contains("2024-02-29 20:00:00.0"))
  }
}
