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
}
