package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.GraftFunctions.normalizeNative

/** The end-to-end corpus-cleaning pass a training-data pipeline runs
  * before tokenization, composed from the engine's own operators:
  *
  *   1. token-count gate (drop fragments and monsters),
  *   2. near-exact dedup on normalized content (keep the smallest id),
  *   3. benchmark decontamination (drop docs sharing any word-k-gram
  *      with the held-out benchmark — [[Quality.contaminatedDocs]]).
  *
  * Each stage is shuffle-by-derived-key (md5 of normalized content;
  * shingle hash), so the composition inherits every stage's 100 TB shape
  * — the point of this operator is demonstrating the stages COMPOSE:
  * filters stream out of the scan, the dedup groupBy keys on a
  * fixed-width hash, and the decontamination join only ever moves
  * shingle hashes, never text.
  */
object CorpusClean {

  /** Rows of `docs` that survive all three stages, schema unchanged.
    * `minTokens`/`maxTokens` bound the whitespace token count
    * (inclusive); `k` is the decontamination n-gram width. */
  def clean(docs: DataFrame, benchmark: DataFrame, idCol: String,
            textCol: String, minTokens: Int = 10, maxTokens: Int = 1000,
            k: Int = 8): DataFrame = {
    graft.plans.GraftFunctions.ensureRegistered(docs.sparkSession)
    // gated/deduped are multiply consumed but deliberately NOT persisted:
    // both recompute as a columnar scan + codegen'd filter/semi-join with
    // no shuffle, and caching full text rows costs ~3× more in cold
    // columnar serialization than the recomputes save (measured,
    // PERF_NOTES.md "CorpusClean persist experiment"). The genuinely
    // expensive intermediates (shingle-hash streams) live behind the
    // decontamination join keyed by hash, not here.
    val gated = docs.filter(
      size(split(col(textCol), " ")).between(minTokens, maxTokens))
    // keep-min per normalized content; the group key is the md5 of the
    // normalized text — fixed-width shuffle key, never the text itself
    val keepIds = gated
      .select(col(idCol), md5(normalizeNative(col(textCol))).as("__nk"))
      .groupBy(col("__nk"))
      .agg(min(col(idCol)).as(idCol))
      .select(col(idCol))
    val deduped = gated.join(keepIds, Seq(idCol), "left_semi")
    val contaminated = Quality
      .contaminatedDocs(deduped, benchmark, idCol, textCol, k)
      .select(col(idCol))
    deduped.join(contaminated, Seq(idCol), "left_anti")
  }
}
