package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Equi-join plan for point-in-interval (range) joins.
  *
  * Spark has no range-join optimization: `points.join(intervals,
  * p >= lo && p <= hi)` with no equi-key plans a BroadcastNestedLoopJoin
  * (or a cartesian product when neither side broadcasts) — O(|P|·|I|)
  * comparisons, the textbook 100 TB cliff. The standard fix is BINNING:
  * pick a bin width, explode every interval into the bins it covers, map
  * every point to its single bin, equi-join on the bin id, and re-check
  * exact containment as a residual filter. The join becomes a hash
  * shuffle on the bin key; each interval contributes
  * ⌈width/binWidth⌉+1 rows, each point exactly one.
  *
  * `binWidth` tunes the replication-vs-selectivity trade: ~the median
  * interval width is the usual choice (≤2 bins per interval, and a
  * point's bin holds only intervals overlapping its neighborhood).
  * RangeJoinSpec asserts the plan contains no nested-loop or cartesian
  * operator and that results match the naive predicate join.
  */
object RangeJoin {

  /** Rows of `points` × `intervals` with
    * `points(pointCol)` ∈ [`intervals(loCol)`, `intervals(hiCol)`] —
    * every column of both inputs is kept (the caller aggregates).
    * Inverted intervals (lo > hi) produce no bins and therefore no rows,
    * matching the empty-interval semantics of the predicate form (an
    * unguarded 2-arg sequence() would instead count DOWN through them).
    * Neither input may already contain a `__bin` column. */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive (got $binWidth)")
    require(!points.columns.contains("__bin") && !intervals.columns.contains("__bin"),
      "pointInInterval reserves the column name __bin; rename it on the inputs")
    val loBin = floor(col(loCol) / binWidth).cast("long")
    val hiBin = floor(col(hiCol) / binWidth).cast("long")
    val binnedIv = intervals.withColumn("__bin",
      explode(when(loBin <= hiBin, sequence(loBin, hiBin))
        .otherwise(typedLit(Seq.empty[Long]))))
    val binnedPts = points.withColumn("__bin",
      floor(col(pointCol) / binWidth).cast("long"))
    binnedPts.join(binnedIv, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }
}
