package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter membership sketch as a FIRST-CLASS served frame — the
  * set-membership sibling of the Count-Min frequency sketch
  * ([[CountMin]]) and the KMV distinct sketch (q187): k = 3 affine hash
  * rows into m = 16384 bits, a term is "possibly present" iff ALL k of
  * its bits are set, absent bits prove absence (NO false negatives,
  * ever — the one-sided guarantee the decontamination prefilter q92
  * leans on, here surfaced as an auditable artifact instead of an
  * opaque driver-built binary).
  *
  * Exactness contract: the term hash is the md5 bridge
  * ([[graft.functions.TextFunctions.md5Long]]) and the row hashes the
  * same public affine family as [[CountMin]] with the constants fixed
  * below, so the SET-BIT FRAME ITSELF, membership verdicts, and the
  * false-positive audit are all bit-identical in DuckDB — the filter is
  * hash-CHECKED, not statistically trusted.
  *
  * Scale shape: the build is one explode (k rows per distinct term) +
  * one DISTINCT into a ≤ m-row (bit) frame — constant-size state no
  * matter the corpus, and mergeable by plain set union (distinct of
  * unioned partials ≡ the one-pass sketch), which is what the streaming
  * monitor rides ([[graft.streaming.EventStreams.bloomMonitorSink]]).
  * Probing is a bit-keyed equi-join: cost is k rows per probe term,
  * never a corpus pass. */
object BloomSet {

  val P = 2147483647L
  val M = 16384L
  val K = 3

  /** (a, b) per hash row — public affine family (same shape as
    * [[CountMin.RowParams]]), mirrored verbatim in every oracle.
    * a·(P−1) < 2^62 keeps the products in BIGINT on both engines. */
  val RowParams: Seq[(Long, Long)] = Seq(
    (1103515245L, 12345L), (214013L, 2531011L), (134775813L, 1L))

  private def hp(termCol: Column): Column =
    graft.functions.TextFunctions.md5Long(termCol) % lit(P)

  /** The k bit positions of one term, as an exploded-ready array column
    * (hash is non-negative, so plain % is already pmod). */
  def bitsOf(termCol: Column): Column = {
    val h = hp(termCol)
    array(RowParams.map { case (a, b) =>
      (lit(a) * h + lit(b)) % lit(P) % lit(M)
    }: _*)
  }

  /** Build the set-bit frame (bit) from a term frame — the whole filter
    * is ≤ m = 16384 rows of longs, distinct-reduced map-side. */
  def sketch(terms: DataFrame, termCol: String): DataFrame =
    terms.select(explode(bitsOf(col(termCol))).as("bit")).distinct()

  /** Membership verdicts for a probe frame against a set-bit frame:
    * in_bloom iff all K probe bits are present. One bit-keyed left
    * join, k rows per probe term. */
  def membership(bits: DataFrame, probes: DataFrame,
                 termCol: String): DataFrame =
    // distinct first: a duplicated probe term would explode to 2k
    // (term,bit) rows, count(__set) could reach 2k but never == K, and
    // a genuine member would read in_bloom=false — breaking the
    // no-false-negatives guarantee for any caller-supplied probe frame
    probes.select(col(termCol).as("term")).distinct()
      .select(col("term"), explode(bitsOf(col("term"))).as("bit"))
      .join(bits.withColumn("__set", lit(1L)), Seq("bit"), "left")
      .groupBy(col("term"))
      .agg((count(col("__set")) === lit(K.toLong)).as("in_bloom"))

  /** The audit report q219 and the streaming monitor SHARE: for each
    * probe term, the filter's verdict, ground truth (probe ∈ member
    * set, computed exactly beside it), and the false-positive flag —
    * false NEGATIVES are impossible by construction, which the planted
    * spec pins. `members` is the exact member-term frame (merged
    * partials or a one-pass distinct, identically). */
  def report(bits: DataFrame, members: DataFrame,
             probes: DataFrame): DataFrame =
    membership(bits, probes, "term")
      .join(members.select(col("term"), lit(true).as("present")),
        Seq("term"), "left")
      .select(col("term"), col("in_bloom"),
        coalesce(col("present"), lit(false)).as("present"))
      .withColumn("false_positive", col("in_bloom") && !col("present"))
      .orderBy("term")
}
