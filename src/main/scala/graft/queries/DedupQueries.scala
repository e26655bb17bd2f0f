package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import Q._

/** Deduplication surface over `documents`: exact (hash-groupBy), MinHash+LSH
  * (shingle → minhash → band → bucket equi-join), SimHash, and n-gram
  * Jaccard — the training-data-pipeline dedup family.
  *
  * Scale shape: every variant reduces to groupBy/equi-join on a derived key
  * (content hash, band hash, bucket) — shuffle-partitionable by that key,
  * never an O(n²) cross join. The only pairwise work (exact Jaccard) runs on
  * LSH candidates, whose count is governed by true similarity, not n².
  *
  * Hashing is md5-derived (see TextFunctions) so each stage is reproducible
  * in DuckDB — the MinHash signature and LSH pair queries are fully
  * oracle-checked, which is rare for sketch pipelines.
  */
object DedupQueries {

  private val P = MinhashP
  private val NumSigs = 8
  private val NumBands = 4 // band size 1 (r=1, b=4): high-recall demo setting

  /** DuckDB twin of TextFunctions.shingles(k=3) + md5Long, as a CTE prefix. */
  private val shingleCte =
    """WITH sh AS (
      |  SELECT doc_id,
      |    unnest(list_distinct(list_transform(range(1, len(s)-1),
      |      i -> s[i] || ' ' || s[i+1] || ' ' || s[i+2]))) AS shingle
      |  FROM (SELECT doc_id, string_split(text, ' ') AS s FROM documents)
      |), h AS (
      |  SELECT doc_id,
      |    ('0x' || substr(md5(shingle),1,15))::BIGINT % 2147483647 AS hp
      |  FROM sh
      |), sig AS (
      |  SELECT doc_id, """.stripMargin +
      (0 until NumSigs).map(j =>
        s"min((${MinhashA(j)}*hp + ${MinhashB(j)}) % $P) AS m$j").mkString(",\n    ") +
      "\n  FROM h GROUP BY doc_id\n)"

  val specs: Seq[QuerySpec] = Seq(

    // Exact dedup: group by content, keep the smallest doc_id. The 100 TB
    // form groups by md5(content) (fixed-width shuffle key) rather than the
    // content itself; both shown here.
    QuerySpec("q30_dedup_exact",
      (s, d) => t(s, d, "documents")
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_count"))
        .select(md5(col("text")).as("text_md5"), col("keep_id"), col("dup_count"))
        .orderBy("keep_id"),
      Some("""SELECT md5(text) AS text_md5, min(doc_id) AS keep_id,
             |  count(*) AS dup_count
             |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin)),

    // MinHash signatures: 8 universal hashes over the 3-gram shingle set.
    QuerySpec("q31_minhash_sig",
      (s, d) => {
        val sh = t(s, d, "documents")
          .filter(size(tokens(col("text"))) >= 3)
          .select(col("doc_id"), shingles(col("text"), 3).as("shset"))
        sh.select(col("doc_id") +:
          (0 until NumSigs).map(j => minhash(col("shset"), j).as(s"m$j")): _*)
          .orderBy("doc_id")
      },
      Some(shingleCte +
        "\nSELECT * FROM sig ORDER BY doc_id")),

    // MinHash LSH near-dup candidates: explode signatures into (band, value)
    // keys, equi-join per band (shuffle-partitionable — the scale path),
    // dedup pairs, then exact-Jaccard the survivors.
    QuerySpec("q32_minhash_lsh_pairs",
      (s, d) => {
        val docs = t(s, d, "documents").filter(size(tokens(col("text"))) >= 3)
        val withSets = docs.select(col("doc_id"), shingles(col("text"), 3).as("shset"))
        val sigs = withSets.select(col("doc_id") +:
          (0 until NumBands).map(j => minhash(col("shset"), j).as(s"m$j")): _*)
        val bands = sigs.select(col("doc_id"), explode(array(
          (0 until NumBands).map(j => struct(lit(j).as("band"), col(s"m$j").as("mv"))): _*))
          .as("bv"))
          .select(col("doc_id"), col("bv.band").as("band"), col("bv.mv").as("mv"))
        val cand = bands.as("a").join(bands.as("b"),
            col("a.band") === col("b.band") && col("a.mv") === col("b.mv") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
          .distinct()
        cand
          .join(withSets.withColumnRenamed("doc_id", "a_id")
            .withColumnRenamed("shset", "a_set"), "a_id")
          .join(withSets.withColumnRenamed("doc_id", "b_id")
            .withColumnRenamed("shset", "b_set"), "b_id")
          .select(col("a_id"), col("b_id"), jaccard(col("a_set"), col("b_set")).as("jac"))
          .filter(col("jac") >= 0.1)
          .orderBy("a_id", "b_id")
      },
      Some(shingleCte +
        """, sets AS (
          |  SELECT doc_id, list_distinct(list(shingle)) AS shset FROM sh GROUP BY doc_id
          |), bands AS (
          |""".stripMargin +
        (0 until NumBands).map(j =>
          s"  SELECT doc_id, $j AS band, m$j AS mv FROM sig").mkString("\n  UNION ALL\n") +
        """
          |), cand AS (
          |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
          |  FROM bands a JOIN bands b
          |    ON a.band = b.band AND a.mv = b.mv AND a.doc_id < b.doc_id
          |)
          |SELECT a_id, b_id,
          |  CAST(len(list_intersect(sa.shset, sb.shset)) AS DOUBLE)
          |    / len(list_distinct(list_concat(sa.shset, sb.shset))) AS jac
          |FROM cand
          |JOIN sets sa ON sa.doc_id = a_id
          |JOIN sets sb ON sb.doc_id = b_id
          |WHERE CAST(len(list_intersect(sa.shset, sb.shset)) AS DOUBLE)
          |    / len(list_distinct(list_concat(sa.shset, sb.shset))) >= 0.1
          |ORDER BY a_id, b_id""".stripMargin)),

    // SimHash: 16-bit majority-vote sketch per document (near-dup = small
    // hamming distance; pairing happens by code-prefix buckets at scale).
    QuerySpec("q33_simhash",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"), simhash(col("text"), 16).as("simhash16"))
        .orderBy("doc_id"),
      Some("""WITH tok AS (
             |  SELECT doc_id, unnest(string_split(text,' ')) AS tk FROM documents
             |), h AS (
             |  SELECT doc_id, ('0x' || substr(md5(tk),1,15))::BIGINT AS hv FROM tok
             |), votes AS (
             |  SELECT doc_id, b,
             |    count(*) FILTER (((hv >> b) & 1) = 1) AS ones, count(*) AS n
             |  FROM h CROSS JOIN (SELECT unnest(range(16)) AS b) bs
             |  GROUP BY doc_id, b
             |)
             |SELECT doc_id,
             |  CAST(sum(CASE WHEN 2*ones > n THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS simhash16
             |FROM votes GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // n-gram Jaccard within (lang, source) blocks: blocked pairwise
    // similarity — the block key bounds the quadratic term, and at scale
    // becomes the shuffle partition key.
    QuerySpec("q34_ngram_jaccard",
      (s, d) => {
        val docs = t(s, d, "documents")
          .filter(size(tokens(col("text"))) >= 3)
          .select(col("doc_id"), col("lang"), col("source"),
            shingles(col("text"), 3).as("shset"))
        docs.as("a").join(docs.as("b"),
            col("a.lang") === col("b.lang") && col("a.source") === col("b.source") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
            col("a.lang").as("lang"), col("a.source").as("source"),
            jaccard(col("a.shset"), col("b.shset")).as("jac"))
          .orderBy("a_id", "b_id")
      },
      Some("""WITH s3 AS (
             |  SELECT doc_id, lang, source,
             |    list_distinct(list_transform(range(1, len(s)-1),
             |      i -> s[i] || ' ' || s[i+1] || ' ' || s[i+2])) AS shset
             |  FROM (SELECT doc_id, lang, source, string_split(text,' ') AS s
             |        FROM documents WHERE len(string_split(text,' ')) >= 3)
             |)
             |SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.lang AS lang,
             |  a.source AS source,
             |  CAST(len(list_intersect(a.shset, b.shset)) AS DOUBLE)
             |    / len(list_distinct(list_concat(a.shset, b.shset))) AS jac
             |FROM s3 a JOIN s3 b
             |  ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
             |ORDER BY a_id, b_id""".stripMargin))
  )
}
