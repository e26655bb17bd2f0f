package graft

import org.apache.spark.sql.functions._

import graft.operators.Quality

/** Quality operators: signal arithmetic on hand-checked docs, scrub
  * behavior/idempotence, and the stratified sampler's determinism and
  * partitioning-invariance. */
class QualitySpec extends SparkSpec {

  import spark.implicits._

  test("gopherSignals computes hand-checked values and flags repetition") {
    val docs = Seq(
      (1L, "aa bb cc dd"),            // 4 distinct tokens, all bigrams unique
      (2L, "aa aa aa aa"),            // fully repetitive
      (3L, "ab cd ab cd ab cd"),      // one dominant bigram
      (4L, "solitary")                // single token, no bigrams
    ).toDF("doc_id", "text")
    val r = Quality.gopherSignals(docs, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "dup_token_frac", "top_bigram_frac",
        "mean_token_len", "flagged")
      .collect()

    val r1 = r(0)
    assert(r1.getLong(1) === 4L)
    assert(r1.getDouble(2) === 0.0)
    assert(math.abs(r1.getDouble(3) - 1.0 / 3.0) < 1e-12) // 3 bigrams, each once
    assert(r1.getDouble(4) === 2.0)
    assert(r1.getBoolean(5) === true) // top_bigram_frac 1/3 > 0.18, mean len 2 < 3

    val r2 = r(1)
    assert(r2.getDouble(2) === 0.75) // 1 distinct of 4
    assert(r2.getDouble(3) === 1.0)  // "aa aa" fills all 3 slots
    assert(r2.getBoolean(5) === true)

    val r3 = r(2)
    assert(math.abs(r3.getDouble(3) - 3.0 / 5.0) < 1e-12) // "ab cd" 3 of 5

    val r4 = r(3)
    assert(r4.getLong(1) === 1L)
    assert(r4.getDouble(3) === 0.0) // no bigrams → 0 via left-join coalesce
  }

  test("piiScrub redacts all three categories and is idempotent") {
    val df = Seq(
      (1L, "mail me at jo.doe@mail.org or visit https://ex.org/a_b then call 555-0199"),
      (2L, "clean text with no pii at all")
    ).toDF("doc_id", "text")
    val out = Quality.piiScrub(df, "text").orderBy("doc_id").collect()
    val row = out(0)
    assert(row.getAs[Int]("n_email") === 1)
    assert(row.getAs[Int]("n_url") === 1)
    assert(row.getAs[Int]("n_phone") === 1)
    val scrubbed = row.getAs[String]("scrubbed")
    assert(scrubbed.contains("<EMAIL>") && scrubbed.contains("<URL>") &&
      scrubbed.contains("<PHONE>"))
    assert(!scrubbed.contains("@") && !scrubbed.contains("https"))
    assert(out(1).getAs[Int]("n_email") === 0)
    assert(out(1).getAs[String]("scrubbed") === "clean text with no pii at all")

    // idempotent: scrubbing scrubbed text changes nothing (the
    // replacement tokens contain no scrubbable patterns)
    val again = Quality.piiScrub(
      Quality.piiScrub(df, "text").select(col("doc_id"), col("scrubbed").as("text")),
      "text").orderBy("doc_id").collect()
    assert(again(0).getAs[String]("scrubbed") === scrubbed)
  }

  test("stratifiedHashSample is partitioning-invariant and rate-ordered") {
    val docs = spark.range(0, 2000).toDF("doc_id")
      .withColumn("lang",
        element_at(array(lit("en"), lit("de"), lit("es"), lit("fr")),
          (pmod(col("doc_id"), lit(4)) + 1).cast("int")))
    val rates = Seq("en" -> 10, "de" -> 25, "es" -> 50)
    def keptIds(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      Quality.stratifiedHashSample(df, "doc_id", "lang", rates, defaultRate = 75)
        .select("doc_id").as[Long].collect().sorted.toSeq

    val a = keptIds(docs)
    val b = keptIds(docs.repartition(7, col("lang")))
    assert(a === b, "hash gate must not depend on partitioning")

    val byLang = Quality.stratifiedHashSample(docs, "doc_id", "lang", rates, 75)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    // 500 per stratum; rates order the kept counts (loose bounds — the
    // gate is a hash, not an exact-n sampler)
    assert(byLang("en") < byLang("de") && byLang("de") < byLang("es") &&
      byLang("es") < byLang("fr"))
    assert(byLang("en") > 20 && byLang("en") < 90)
    assert(byLang("fr") > 310 && byLang("fr") < 440)
  }

  test("chunkTokens covers every token with the declared overlap") {
    // 100 tokens, chunk 64 / overlap 16 (stride 48) → chunks at 1 and 49
    val doc = Seq((1L, (1 to 100).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = Quality.chunkTokens(doc, "doc_id", "text", 64, 16)
      .orderBy("chunk_id")
      .select("chunk_id", "chunk_tokens", "chunk_text")
      .as[(Long, Long, String)].collect()
    assert(chunks.length === 2)
    assert(chunks(0)._2 === 64L && chunks(0)._3.startsWith("w1 ") &&
      chunks(0)._3.endsWith(" w64"))
    assert(chunks(1)._2 === 52L && chunks(1)._3.startsWith("w49 ") &&
      chunks(1)._3.endsWith(" w100"))
    // short doc → exactly one whole-doc chunk
    val short = Quality.chunkTokens(
      Seq((2L, "a b c")).toDF("doc_id", "text"), "doc_id", "text", 64, 16)
      .collect()
    assert(short.length === 1 && short(0).getAs[Long]("chunk_tokens") === 3L)
  }

  test("packContiguous bins follow the running token offset") {
    val docs = Seq((1L, 300), (2L, 300), (3L, 300), (4L, 50))
      .map { case (id, n) => (id, (1 to n).map(_ => "t").mkString(" ")) }
      .toDF("doc_id", "text")
    val bins = Quality.packContiguous(docs, "doc_id", "text", budget = 512)
      .orderBy("doc_id").select("doc_id", "bin_id").as[(Long, Long)].collect()
    // starts at offsets 0, 300, 600, 900 → bins 0, 0, 1, 1
    assert(bins.toSeq === Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L)))
  }

  test("hashSplit is exhaustive, deterministic, and near the declared rates") {
    val df = spark.range(0, 10000).toDF("doc_id")
    val counts = Quality.hashSplit(df, "doc_id")
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum === 10000L)
    assert(counts("train") > 8700 && counts("train") < 9300)
    assert(counts("val") > 300 && counts("val") < 700)
    assert(counts("test") > 300 && counts("test") < 700)
    val again = Quality.hashSplit(df.repartition(13), "doc_id")
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(again === counts)
  }

  test("dedupSentences keeps first occurrences in original order") {
    val docs = Seq(
      (1L, "buy now. great deal. buy now. call us. great deal"),
      (2L, "unique one. unique two")
    ).toDF("doc_id", "text")
    val out = Quality.dedupSentences(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out === Seq(
      (1L, 5L, 3L, "buy now. great deal. call us"),
      (2L, 2L, 2L, "unique one. unique two")))
  }

  test("dedupLinesGlobal keeps each line at its globally first (doc, pos) only") {
    val docs = Seq(
      (1L, "cookie banner. real content one. footer"),
      (2L, "cookie banner. real content two. footer"),
      (3L, "cookie banner. footer")
    ).toDF("doc_id", "text")
    val out = Quality.dedupLinesGlobal(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out === Seq(
      (1L, 3L, 3L, "cookie banner. real content one. footer"),
      (2L, 3L, 1L, "real content two"),
      (3L, 2L, 0L, "")))
  }

  test("trainingShuffle is a partitioning-invariant permutation with dense positions") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val a = Quality.trainingShuffle(docs, "doc_id", nShards = 4)
      .orderBy("shard", "pos").as[(Long, Long, Long)].collect().toSeq
    // every doc appears exactly once
    assert(a.map(_._1).distinct.size === docs.count())
    // positions are dense 1..n per shard
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted === (1L to rows.size).toSeq)
    }
    // identical layout on a different input partitioning
    val b = Quality.trainingShuffle(docs.repartition(13), "doc_id", nShards = 4)
      .orderBy("shard", "pos").as[(Long, Long, Long)].collect().toSeq
    assert(b === a)
  }

  test("contaminatedDocs finds exactly the docs sharing a k-gram") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "x alpha beta gamma delta y"),       // shares 3-grams of the run
      (2L, "alpha gamma beta delta epsilon"),   // same words, no shared 3-gram
      (3L, "totally different words here now")
    ).toDF("doc_id", "text")
    val out = Quality.contaminatedDocs(train, bench, "doc_id", "text", k = 3)
      .orderBy("doc_id").as[(Long, Long)].collect()
    // doc 1 shares "alpha beta gamma" and "beta gamma delta" → 2 hashes
    assert(out.toSeq === Seq((1L, 2L)))
  }

  test("bloomContaminatedDocs equals the exact operator and prunes the probe side") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val bench = docs.filter(col("doc_id") % 7 === 0)
    val train = docs.filter(col("doc_id") % 7 =!= 0)
    val exact = Quality.contaminatedDocs(train, bench, "doc_id", "text", k = 6)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    val bloomed = Quality.bloomContaminatedDocs(train, bench, "doc_id", "text", k = 6)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    // The Bloom stage is a pure prefilter: bit-identical result.
    assert(bloomed === exact)
    assert(exact.nonEmpty) // fixture must actually exercise the overlap path
    graft.operators.OperatorCaches.release()
  }

  test("CorpusClean.clean applies gate, dedup, and decontamination in order") {
    import graft.operators.CorpusClean
    val bench = Seq((100L, (1 to 12).map(i => s"b$i").mkString(" ")))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, "too short"),                                          // gated out (<10 tokens)
      (2L, (1 to 11).map(i => s"w$i").mkString(" ")),             // survives
      (3L, (1 to 11).map(i => s"w$i").mkString(" ") + "!"),       // normalized dup of 2 → dropped
      (4L, (1 to 11).map(i => s"x$i").mkString(" ")),             // survives
      (5L, (1 to 8).map(i => s"b$i").mkString(" ") + " y z w")    // shares an 8-gram with bench → dropped
    ).toDF("doc_id", "text")
    val kept = CorpusClean.clean(docs, bench, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(2L, 4L))
  }

  test("bloom prefilter passes a superset of true overlaps and a fraction of the rest") {
    import graft.plans.GraftFunctions
    GraftFunctions.ensureRegistered(spark)
    val bf = org.apache.spark.util.sketch.BloomFilter.create(100, 0.03)
    (0L until 100L).foreach(bf.putLong)
    val bytes = { val b = new java.io.ByteArrayOutputStream(); bf.writeTo(b); b.toByteArray }
    val probe = spark.range(0, 10000).select(col("id"))
      .filter(GraftFunctions.mightContainNative(lit(bytes), col("id")))
      .as[Long].collect()
    // no false negatives …
    assert((0L until 100L).forall(probe.contains))
    // … and the pass-through rate on non-members is in the fpp ballpark
    assert(probe.length < 100 + 600)
  }

  test("exact-moments aggregator matches decimal arithmetic on a known set") {
    import graft.functions.ExactMoments
    val ds = Seq(("A", 1.25), ("A", 2.75), ("A", 4.00), ("B", 10.10))
      .toDS()
    val out = ds.groupByKey(_._1).agg(ExactMoments.of2.toColumn.name("m"))
      .select(col("key"), col("m.n"), col("m.mean"), col("m.varSamp"))
      .orderBy("key")
      .as[(String, Long, Double, Double)].collect()
    val (_, n, mean, v) = out(0)
    assert(n === 3L)
    assert(math.abs(mean - 8.0 / 3.0) < 1e-12)
    // var = (ss - s*s/n)/(n-1) with s=8, ss=1.25²+2.75²+4² = 25.125
    assert(math.abs(v - (25.125 - 64.0 / 3.0) / 2.0) < 1e-12)
    val (_, n2, mean2, v2) = out(1)
    assert(n2 === 1L && mean2 === 10.10 && v2.isNaN)
  }

  test("leakageSafeSplit: cluster members share a split; singletons match hashSplit") {
    val docs = (1L to 40L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // clusters: {1,2,3} keyed by 1, {10,11} keyed by 10 — rest singletons
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "cluster_id")
    val out = Quality.leakageSafeSplit(docs, "doc_id", clusters)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // every doc is assigned, near-dups never straddle splits
    assert(out.size === 40)
    assert(Set(out(1L), out(2L), out(3L)).size === 1)
    assert(out(10L) === out(11L))
    assert(out(1L)._1 === 1L && out(10L)._1 === 10L)
    // a singleton's assignment equals the per-doc hashSplit at the same
    // percentages (cluster_key = own id ⇒ identical gate input)
    val perDoc = Quality.hashSplit(docs.filter(col("doc_id") === 25L),
      "doc_id", trainPct = 80, valPct = 10)
      .select("split").as[String].head()
    assert(out(25L) === ((25L, perDoc)))
    // all three labels appear over 40 ids at 80/10/10 would be flaky-ish;
    // just require the labels are from the contract's domain
    assert(out.values.map(_._2).toSet.subsetOf(Set("train", "val", "test")))
  }
}
