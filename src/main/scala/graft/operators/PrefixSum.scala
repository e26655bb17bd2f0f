package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global rank + running sum — the two-pass replacement for a
  * `Window.orderBy(...)` with no partition clause, which plans an
  * `Exchange SinglePartition` and funnels the whole frame through one task
  * (fine for a dimension table, fatal at a billion rows).
  *
  * The shape (proven for ranks in [[Dedup.sortedNeighborPairs]]):
  *   1. range-repartition on the TOTAL order's sort expressions — rows land
  *      in globally ordered, disjoint partitions;
  *   2. one tiny aggregation collects per-partition (row count, value sum)
  *      to the driver — P rows cross the wire, never data;
  *   3. a per-partition window (parallel across partitions) computes the
  *      local rank and local running sum; broadcast per-partition prefix
  *      OFFSETS (a P-entry map literal) lift both to global values.
  *
  * Results are bit-identical to the single-partition window as long as the
  * sort expressions form a total order (callers must include a tiebreak
  * column — range partition boundaries are otherwise free to split ties
  * across partitions, which would make local ranks non-deterministic).
  */
object PrefixSum {

  /** Add a global 1-based row number and a global inclusive running sum of
    * `value` (must be integral — the offsets are exact long arithmetic)
    * over the total order given by `sortExprs`. Returns the augmented
    * frame plus the grand total (free from the driver-side stats, saving
    * callers an unbounded-following window). The intermediate range-
    * partitioned frame is persisted (tracked in [[OperatorCaches]] — it
    * feeds both the stats aggregation and the windowed output).
    */
  def rankedRunningSum(df: DataFrame, sortExprs: Seq[Column], value: Column,
                       rnCol: String, cumCol: String,
                       numPartitions: Int = 0): (DataFrame, Long) = {
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val ranged = OperatorCaches.persistTracked(
      df.withColumn("__psv", value.cast("long"))
        .repartitionByRange(parts, sortExprs: _*)
        .withColumn("__pid", spark_partition_id()))
    // per-partition (count, sum) — P rows to the driver, never data rows
    val stats = ranged.groupBy(col("__pid"))
      .agg(count(lit(1)).as("n"), sum(col("__psv")).as("s"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val pids = stats.map(_._1)
    val rnOffsets: Map[Int, Long] =
      pids.zip(stats.map(_._2).scanLeft(0L)(_ + _)).toMap
    val sumOffsets: Map[Int, Long] =
      pids.zip(stats.map(_._3).scanLeft(0L)(_ + _)).toMap
    val total = stats.map(_._3).sum
    val w = Window.partitionBy(col("__pid")).orderBy(sortExprs: _*)
    val out = ranged
      .withColumn(rnCol,
        row_number().over(w).cast("long") +
          element_at(typedLit(rnOffsets), col("__pid")))
      .withColumn(cumCol,
        sum(col("__psv")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) +
          element_at(typedLit(sumOffsets), col("__pid")))
      .drop("__psv", "__pid")
    (out, total)
  }

  /** Add a global 1-based row number and the EXCLUSIVE prefix maximum of
    * `value` (the max over all STRICT predecessors in the total order —
    * null when there are none) — the running-max sibling of
    * [[rankedRunningSum]], same two-pass shape with the per-partition
    * offset being a prefix MAX of partition maxima instead of a prefix
    * sum. Exclusive rather than inclusive because its consumer is
    * dominance testing (skyline/Pareto sweeps, q198): "is my value
    * strictly above everything cheaper than me" reads the
    * strict-predecessor max, and the inclusive form cannot recover it.
    * `value` must be integral and non-null (filter upstream); callers
    * must include a tiebreak column in `sortExprs`. */
  def rankedRunningMax(df: DataFrame, sortExprs: Seq[Column], value: Column,
                       rnCol: String, maxCol: String,
                       numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val ranged = OperatorCaches.persistTracked(
      df.withColumn("__pmv", value.cast("long"))
        .repartitionByRange(parts, sortExprs: _*)
        .withColumn("__pid", spark_partition_id()))
    val stats = ranged.groupBy(col("__pid"))
      .agg(count(lit(1)).as("n"), max(col("__pmv")).as("m"))
      .collect().map { r =>
        require(!r.isNullAt(2), "rankedRunningMax: value must be non-null")
        (r.getInt(0), r.getLong(1), r.getLong(2))
      }.sortBy(_._1)
    val pids = stats.map(_._1)
    val rnOffsets: Map[Int, Long] =
      pids.zip(stats.map(_._2).scanLeft(0L)(_ + _)).toMap
    // exclusive prefix max of the preceding partitions' maxima; the
    // first non-empty partition has no entry (→ null via element_at)
    val exclMax: Map[Int, Long] = pids
      .zip(stats.map(_._3).scanLeft(Option.empty[Long]) {
        (acc, m) => Some(acc.fold(m)(math.max(_, m)))
      })
      .collect { case (pid, Some(m)) => pid -> m }
      .toMap
    val w = Window.partitionBy(col("__pid")).orderBy(sortExprs: _*)
    ranged
      .withColumn(rnCol,
        row_number().over(w).cast("long") +
          element_at(typedLit(rnOffsets), col("__pid")))
      .withColumn(maxCol,
        greatest(
          max(col("__pmv")).over(
            w.rowsBetween(Window.unboundedPreceding, -1)),
          // the first non-empty partition is INTENTIONALLY absent from
          // exclMax — try_element_at makes the missing-key→null contract
          // explicit (map-typed element_at happens to return null even
          // under ANSI, but that is easy to misread against the
          // array-typed form, which throws)
          try_element_at(typedLit(exclMax), col("__pid"))))
      .drop("__pmv", "__pid")
  }
}
