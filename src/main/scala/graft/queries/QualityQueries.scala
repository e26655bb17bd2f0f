package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Quality
import Q._

/** Corpus-quality surface: Gopher-style repetition signals, PII
  * scrubbing, and deterministic stratified sampling — the quality-filter
  * stages of a training-data pipeline, each oracle-checked.
  */
object QualityQueries {

  /** PII injection: the fixture text is clean, so both engines append the
    * same synthetic PII to a deterministic subset of docs before
    * scrubbing — the scrub itself is then a real-work parity check. */
  private def injectPii(textCol: org.apache.spark.sql.Column,
                        idCol: org.apache.spark.sql.Column) = {
    val m = pmod(idCol, lit(7))
    when(m === 0, concat(textCol, lit(" contact user"), idCol.cast("string"),
      lit("@example.com now")))
      .when(m === 1, concat(textCol, lit(" visit http://site"), idCol.cast("string"),
        lit(".example.org/page today")))
      .when(m === 2, concat(textCol, lit(" call 555-"),
        lpad(pmod(idCol, lit(10000)).cast("string"), 4, "0")))
      .otherwise(textCol)
  }

  private val injectPiiSql =
    """CASE doc_id % 7
      |    WHEN 0 THEN text || ' contact user' || doc_id || '@example.com now'
      |    WHEN 1 THEN text || ' visit http://site' || doc_id || '.example.org/page today'
      |    WHEN 2 THEN text || ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      |    ELSE text END""".stripMargin

  val specs: Seq[QuerySpec] = Seq(

    // Gopher-style repetition signals + the quality flag. The bigram
    // top-count is explode → two partial-aggregated shuffles keyed by
    // doc_id (never a per-row interpreted sort); the other signals are
    // single-pass codegen arithmetic.
    QuerySpec("q68_gopher_quality",
      (s, d) => Quality.gopherSignals(t(s, d, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("n_tokens"),
          round(col("dup_token_frac"), 6).as("dup_frac6"),
          round(col("top_bigram_frac"), 6).as("bigram_frac6"),
          round(col("mean_token_len"), 6).as("mean_len6"),
          col("flagged"))
        .orderBy("doc_id"),
      Some("""WITH toks AS (
             |  SELECT doc_id, text, string_split(text, ' ') AS s FROM documents
             |), base AS (
             |  SELECT doc_id, len(s) AS n_tokens, len(list_distinct(s)) AS n_distinct,
             |    len(text) - (len(s) - 1) AS sum_len
             |  FROM toks
             |), bg AS (
             |  SELECT doc_id, s[i] || ' ' || s[i+1] AS bigram
             |  FROM (SELECT doc_id, s, unnest(range(1, len(s))) AS i
             |        FROM toks WHERE len(s) >= 2)
             |), bgc AS (
             |  SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY doc_id, bigram
             |), bga AS (
             |  SELECT doc_id, max(c) AS top_cnt, sum(c) AS n_bigrams FROM bgc GROUP BY doc_id
             |), sig AS (
             |  SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
             |    1.0 - CAST(b.n_distinct AS DOUBLE) / b.n_tokens AS dup_token_frac,
             |    COALESCE(CAST(a.top_cnt AS DOUBLE) / a.n_bigrams, 0.0) AS top_bigram_frac,
             |    CAST(b.sum_len AS DOUBLE) / b.n_tokens AS mean_token_len
             |  FROM base b LEFT JOIN bga a ON a.doc_id = b.doc_id
             |)
             |SELECT doc_id, n_tokens,
             |  round(dup_token_frac, 6) AS dup_frac6,
             |  round(top_bigram_frac, 6) AS bigram_frac6,
             |  round(mean_token_len, 6) AS mean_len6,
             |  (dup_token_frac > 0.6 OR top_bigram_frac > 0.18
             |    OR mean_token_len < 3.0 OR mean_token_len > 10.0) AS flagged
             |FROM sig ORDER BY doc_id""".stripMargin)),

    // PII scrub over deterministically-injected emails/URLs/phones:
    // per-category redaction counts + md5 of the scrubbed text (the
    // strictest possible equality on the rewrite itself).
    QuerySpec("q69_pii_scrub",
      (s, d) => {
        val aug = t(s, d, "documents")
          .select(col("doc_id"), injectPii(col("text"), col("doc_id")).as("text"))
        Quality.piiScrub(aug, "text")
          .select(col("doc_id"),
            col("n_email").cast("long").as("n_email"),
            col("n_url").cast("long").as("n_url"),
            col("n_phone").cast("long").as("n_phone"),
            md5(col("scrubbed")).as("scrub_md5"))
          .orderBy("doc_id")
      },
      Some(s"""WITH aug AS (
              |  SELECT doc_id,
              |    $injectPiiSql AS text
              |  FROM documents
              |), scrub AS (
              |  SELECT doc_id, text,
              |    regexp_replace(text, '${Quality.EmailPattern}', '<EMAIL>', 'g') AS t1
              |  FROM aug
              |), scrub2 AS (
              |  SELECT doc_id, text, t1,
              |    regexp_replace(t1, '${Quality.UrlPattern}', '<URL>', 'g') AS t2
              |  FROM scrub
              |)
              |SELECT doc_id,
              |  CAST(len(regexp_extract_all(text, '${Quality.EmailPattern}')) AS BIGINT) AS n_email,
              |  CAST(len(regexp_extract_all(t1, '${Quality.UrlPattern}')) AS BIGINT) AS n_url,
              |  CAST(len(regexp_extract_all(t2, '${Quality.PhonePattern}')) AS BIGINT) AS n_phone,
              |  md5(regexp_replace(t2, '${Quality.PhonePattern}', '<PHONE>', 'g')) AS scrub_md5
              |FROM scrub2 ORDER BY doc_id""".stripMargin)),

    // Deterministic stratified sampling: per-language keep rates gated on
    // a content hash — reproducible on any partitioning/engine, unlike
    // seeded RNG sampling (q06's count contract is the closest RNG gets).
    QuerySpec("q70_stratified_sample",
      (s, d) => Quality.stratifiedHashSample(
        t(s, d, "documents"), "doc_id", "lang",
        rates = Seq("en" -> 10, "de" -> 25, "es" -> 50), defaultRate = 75)
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, lang FROM documents
             |WHERE ('0x' || substr(md5('strat|' || doc_id), 1, 15))::BIGINT % 100 <
             |  CASE lang WHEN 'en' THEN 10 WHEN 'de' THEN 25 WHEN 'es' THEN 50
             |       ELSE 75 END
             |ORDER BY doc_id""".stripMargin))
  )
}
