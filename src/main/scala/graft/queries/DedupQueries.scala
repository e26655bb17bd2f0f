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

  /** DuckDB twin of TextFunctions.shingleHashSet(k=3), as a CTE prefix:
    * 60-bit md5 hash per 3-gram shingle, distinct per doc. */
  private val shingleCte =
    """WITH sh AS (
      |  SELECT DISTINCT doc_id,
      |    ('0x' || substr(md5(s[i] || ' ' || s[i+1] || ' ' || s[i+2]),1,15))::BIGINT AS h60
      |  FROM (SELECT doc_id, s, unnest(range(1, len(s)-1)) AS i
      |        FROM (SELECT doc_id, string_split(text, ' ') AS s FROM documents))
      |), h AS (
      |  SELECT doc_id, h60 % 2147483647 AS hp FROM sh
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
      (s, d) => graft.operators.Dedup.exact(t(s, d, "documents"), "doc_id", "text")
        .orderBy("keep_id"),
      Some("""SELECT md5(text) AS text_md5, min(doc_id) AS keep_id,
             |  count(*) AS dup_count
             |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin)),

    // MinHash signatures: 8 universal hashes over the 3-gram shingle hash
    // set. One md5 per shingle, then 8 cheap arithmetic mins.
    QuerySpec("q31_minhash_sig",
      (s, d) => graft.operators.Dedup.minhashSignatures(
        graft.operators.Dedup.shingleSets(t(s, d, "documents"), "doc_id", "text", 3),
        "doc_id", NumSigs)
        .orderBy("doc_id"),
      Some(shingleCte +
        "\nSELECT * FROM sig ORDER BY doc_id")),

    // MinHash LSH near-dup candidates: explode signatures into (band, value)
    // keys, equi-join per band (shuffle-partitionable — the scale path),
    // dedup pairs, then exact-Jaccard the survivors.
    QuerySpec("q32_minhash_lsh_pairs",
      (s, d) => graft.operators.Dedup.lshPairs(t(s, d, "documents"),
        "doc_id", "text", numBands = NumBands, minJaccard = 0.1, k = 3)
        .orderBy("a_id", "b_id"),
      Some(shingleCte +
        """, sets AS (
          |  SELECT doc_id, list(DISTINCT h60) AS shset FROM sh GROUP BY doc_id
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
      (s, d) => graft.operators.Dedup.simhashCodes(t(s, d, "documents"), "doc_id", "text", 16)
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
          .select(col("doc_id"), col("lang"), col("source"), tokens(col("text")).as("toks"))
          .select(col("doc_id"), col("lang"), col("source"),
            shinglesFromTokens(col("toks"), 3).as("shset"))
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
             |ORDER BY a_id, b_id""".stripMargin)),

    // Embedding-cosine near-dup: within-label blocked pairs above a cosine
    // threshold. Same blocked-pair scale shape as q34; cosine composed from
    // the codegen'd native dot expression with the exact oracle formula.
    QuerySpec("q35_embedding_neardup",
      (s, d) => {
        graft.plans.GraftFunctions.ensureRegistered(s)
        import graft.plans.GraftFunctions.dotNative
        val e = t(s, d, "embeddings")
          .select(col("vec_id"), col("label"),
            col("embedding").cast("array<double>").as("v"))
        def cos(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
          dotNative(a, b) / (sqrt(dotNative(a, a)) * sqrt(dotNative(b, b)))
        e.as("a").join(e.as("b"),
            col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
          .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
            col("a.label").as("label"), cos(col("a.v"), col("b.v")).as("cos"))
          .filter(col("cos") >= 0.35)
          .select(col("a_id"), col("b_id"), col("label"), round(col("cos"), 4).as("cos4"))
          .orderBy("a_id", "b_id")
      },
      Some("""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
             |p AS (
             |  SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.label AS label,
             |    list_dot_product(a.v, b.v)
             |      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos
             |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
             |)
             |SELECT a_id, b_id, label, round(cos, 4) AS cos4
             |FROM p WHERE cos >= 0.35 ORDER BY a_id, b_id""".stripMargin))
  )
}
