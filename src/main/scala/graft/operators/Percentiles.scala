package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed EXACT interpolated percentiles by global-rank selection.
  *
  * Spark's `percentile` aggregate is exact but centralizes: every
  * partition builds a value→count map, and ONE reducer merges and sorts
  * all of them — memory and time O(distinct values) on a single task,
  * the classic 100 TB cliff (and measurably the slowest step of the
  * sf0.1 bench's q102 at 2.4 s of its 2.5 s).
  *
  * Rank selection instead: range-partition by value ([[PrefixSum]]'s
  * machinery — only per-partition COUNTS touch the driver), compute each
  * row's global rank from broadcast offsets, and fetch just the ≤ 2·|ps|
  * rows sitting at the interpolation ranks. The sort shuffle is fully
  * parallel, no task ever holds more than its partition, and the driver
  * receives 2·|ps| doubles. Interpolation reproduces Spark's Percentile
  * formula bit for bit: pos = p·(n−1);
  * result = (⌈pos⌉−pos)·v[⌊pos⌋] + (pos−⌊pos⌋)·v[⌈pos⌉].
  *
  * Ties across partition boundaries are harmless here (unlike general
  * ranking): rows with equal values can take either rank, but the VALUE
  * at any rank in the tie run is identical, which is all a percentile
  * reads.
  */
object Percentiles {

  /** Exact interpolated percentiles of `valueCol` (non-null rows), as one
    * driver-side Seq aligned with `ps`. Empty input → empty Seq. */
  def exactInterpolated(df: DataFrame, valueCol: String,
                        ps: Seq[Double]): Seq[Double] = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"percentiles must be in [0,1] (got $ps)")
    val vals = df.select(col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
    // rankedRunningSum persists the range-partitioned frame (tracked in
    // OperatorCaches — the harness/caller releases per query, the
    // library-wide convention)
    val (ranked, n) = PrefixSum.rankedRunningSum(
      vals, Seq(col("__v")), lit(1L), rnCol = "__rn", cumCol = "__cum")
    if (n == 0L) return Seq.empty
    // 0-based continuous positions → the 1-based ranks that bracket them
    val positions = ps.map(_ * (n - 1))
    val wanted = positions
      .flatMap(p => Seq(p.floor.toLong + 1, p.ceil.toLong + 1)).distinct
    val atRank = ranked.filter(col("__rn").isin(wanted: _*))
      .select(col("__rn"), col("__v"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    positions.map { pos =>
      val (lo, hi) = (pos.floor.toLong, pos.ceil.toLong)
      if (lo == hi) atRank(lo + 1)
      else (hi - pos) * atRank(lo + 1) + (pos - lo) * atRank(hi + 1)
    }
  }
}
