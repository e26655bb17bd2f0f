package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Deduplication operators over a (idCol, textCol) document table.
  *
  * Scale shapes (all shuffle-by-derived-key, never O(n²)):
  *  - exact: groupBy md5(content) — fixed-width shuffle key
  *  - MinHash LSH: shingle-hash once → signatures → explode (band, value) →
  *    per-band equi-join → candidate pairs → exact Jaccard on survivors
  *  - SimHash: one 64/16-bit code per doc; near-dup pairing happens on
  *    code-prefix buckets at scale
  */
object Dedup {

  /** doc_id + distinct 60-bit shingle-hash set (one md5 pass, see
    * TextFunctions.shingleHashSetFromTokens for the projection discipline). */
  def shingleSets(docs: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame =
    docs
      .filter(size(split(col(textCol), " ")) >= k)
      .select(col(idCol), split(col(textCol), " ").as("toks"))
      .select(col(idCol), shingleHashSetFromTokens(col("toks"), k).as("hset"))

  /** MinHash signatures m0..m{n-1} from the shingle-hash sets. */
  def minhashSignatures(sets: DataFrame, idCol: String, numSigs: Int): DataFrame =
    sets.select(col(idCol) +:
      (0 until numSigs).map(j =>
        minhashFromHashes(transform(col("hset"), h => h % MinhashP), j).as(s"m$j")): _*)

  /** LSH candidate pairs (a_id < b_id) sharing any of `numBands` bands,
    * with exact Jaccard computed on the candidates and filtered. */
  def lshPairs(docs: DataFrame, idCol: String, textCol: String,
               numBands: Int = 4, minJaccard: Double = 0.1, k: Int = 3): DataFrame = {
    val sets = shingleSets(docs, idCol, textCol, k)
    val sigs = minhashSignatures(sets, idCol, numBands)
    val bands = sigs.select(col(idCol), explode(array(
      (0 until numBands).map(j => struct(lit(j).as("band"), col(s"m$j").as("mv"))): _*))
      .as("bv"))
      .select(col(idCol), col("bv.band").as("band"), col("bv.mv").as("mv"))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.mv") === col("b.mv") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("a_id"), col(s"b.$idCol").as("b_id"))
      .distinct()
    cand
      .join(sets.select(col(idCol).as("a_id"), col("hset").as("a_set")), "a_id")
      .join(sets.select(col(idCol).as("b_id"), col("hset").as("b_set")), "b_id")
      .select(col("a_id"), col("b_id"), jaccard(col("a_set"), col("b_set")).as("jac"))
      .filter(col("jac") >= minJaccard)
  }

  /** Exact dedup: one surviving row (min id) per distinct content value. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))
      .select(md5(col(textCol)).as("text_md5"), col("keep_id"), col("dup_count"))

  /** Per-doc SimHash codes. */
  def simhashCodes(docs: DataFrame, idCol: String, textCol: String, bits: Int = 16): DataFrame =
    docs.select(col(idCol), simhash(col(textCol), bits).as(s"simhash$bits"))
}
