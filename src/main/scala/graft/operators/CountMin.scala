package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch over a token stream — the mergeable heavy-hitter
  * counter of a 100 TB ingest path (the frequency sibling of the KMV
  * distinct sketch q187 serves): d = 4 affine hash rows × w = 1024
  * buckets of EXACT long counters, estimate = min over the 4 bucket
  * reads, one-sided error (estimate ≥ true count, always — collisions
  * only ever inflate).
  *
  * Exactness contract: the term hash is the md5 bridge
  * ([[graft.functions.TextFunctions.md5Long]] — bit-identical in
  * DuckDB), the row hashes are affine `(a·h + b) mod P mod w` with the
  * constants fixed below so the oracle mirrors them literally, and the
  * counters are plain integer sums — so the sketch, its estimates, AND
  * its merge are all hash-checkable, not just statistically plausible.
  *
  * Scale shape: the build is one explode (4 rows per token) + one
  * keyed aggregation into a ≤ d·w = 4096-row frame — map-side combine
  * does the heavy lifting, and the counter frame is constant-size no
  * matter the corpus. Counters over any PARTITION of the stream merge
  * by (row, bucket) addition, which is what the streaming monitor
  * rides ([[graft.streaming.EventStreams.cmsMonitorSink]]): per-batch
  * partials, summed at serve time, equal the one-pass sketch. */
object CountMin {

  val P = 2147483647L
  val W = 1024L

  /** (a, b) per hash row — public affine family, mirrored verbatim in
    * every oracle. a·(P−1) < 2^62, so the products stay in BIGINT on
    * both engines. */
  val RowParams: Seq[(Long, Long)] = Seq(
    (1103515245L, 12345L), (214013L, 2531011L),
    (134775813L, 1L), (22695477L, 7777L))

  private def hp(termCol: Column): Column =
    graft.functions.TextFunctions.md5Long(termCol) % lit(P)

  /** The 4 (row, bucket) pairs of one term, as an exploded-ready array
    * column (hash is non-negative, so plain % is already pmod). */
  private def rowBuckets(termCol: Column): Column = {
    val h = hp(termCol)
    array(RowParams.zipWithIndex.map { case ((a, b), r) =>
      struct(lit(r).as("r"),
        ((lit(a) * h + lit(b)) % lit(P) % lit(W)).as("bkt"))
    }: _*)
  }

  /** Build the counter frame (r, bkt, c) from a token frame — the
    * whole sketch is ≤ 4096 rows of exact longs. */
  def sketch(tokens: DataFrame, termCol: String): DataFrame =
    tokens.select(explode(rowBuckets(col(termCol))).as("p"))
      .select(col("p.r").as("r"), col("p.bkt").as("bkt"))
      .groupBy(col("r"), col("bkt")).agg(count(lit(1)).as("c"))

  /** Point estimates for a term frame against a counter frame:
    * min over the term's 4 bucket counters (absent bucket = 0). */
  def estimates(counters: DataFrame, terms: DataFrame,
                termCol: String): DataFrame =
    terms.select(col(termCol).as("term"),
        explode(rowBuckets(col(termCol))).as("p"))
      .select(col("term"), col("p.r").as("r"), col("p.bkt").as("bkt"))
      .join(counters, Seq("r", "bkt"), "left")
      .groupBy(col("term"))
      .agg(min(coalesce(col("c"), lit(0L))).as("cms_estimate"))

  /** CMS inner products per hash row — the sketch-based JOIN-SIZE
    * estimate (AGMS/CMS classic): for token streams A and B,
    * Σ_b cA[r][b]·cB[r][b] ≥ Σ_t fA(t)·fB(t) for every row r, with the
    * min over rows the usable estimate — a one-sided equijoin
    * cardinality bound from two constant-size frames, no matter how
    * large the joined inputs (what a planner consults before picking a
    * strategy). Products are exact longs (bucket counts ≤ stream
    * length; c·c ≤ 2^62 far beyond any fixture). Returns (r,
    * estimate). */
  def joinSizeEstimates(countersA: DataFrame,
                        countersB: DataFrame): DataFrame =
    countersA.join(
        countersB.withColumnsRenamed(Map("c" -> "cb")),
        Seq("r", "bkt"))
      .groupBy(col("r"))
      .agg(sum(col("c") * col("cb")).as("estimate"))

  /** DELETE maintenance by sketch LINEARITY — the counters are plain
    * per-(row, bucket) sums, so subtracting the deleted stream's own
    * sketch leaves EXACTLY the sketch a fresh build over the remainder
    * would produce (zero-count buckets dropped — a fresh build never
    * materializes untouched buckets), spec-pinned. This is the
    * sketch-family property Bloom and KMV provably lack: a plain Bloom
    * filter cannot unset a bit two members share, and a KMV sketch
    * cannot recover the (k+1)-th minimum it discarded — deletion there
    * means rebuild, deletion here is a |deleted|-sized adjustment. */
  def delete(counters: DataFrame, deletedCounters: DataFrame): DataFrame =
    counters.join(
        deletedCounters.withColumnsRenamed(Map("c" -> "cd")),
        Seq("r", "bkt"), "left")
      .select(col("r"), col("bkt"),
        (col("c") - coalesce(col("cd"), lit(0L))).as("c"))
      .filter(col("c") > 0L)

  /** The heavy-hitter report q217 and the streaming monitor SHARE:
    * for each query term, its exact count (0 when absent), the CMS
    * estimate, and the one-sided overcount. `exacts` is (term,
    * exact_cnt) — merged partials or a one-pass count, identically. */
  def report(counters: DataFrame, exacts: DataFrame,
             terms: DataFrame): DataFrame =
    terms.select(col("term"))
      .join(exacts, Seq("term"), "left")
      .select(col("term"), coalesce(col("exact_cnt"), lit(0L)).as("exact_cnt"))
      .join(estimates(counters, terms, "term"), Seq("term"))
      .select(col("term"), col("exact_cnt"), col("cms_estimate"),
        (col("cms_estimate") - col("exact_cnt")).as("overcount"))
      .orderBy("term")
}
