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

  /** GROUPED exact interpolated percentiles — and unlike
    * `groupBy(g).agg(percentile(...))`, a giant group does not pin a
    * reducer: rows range-partition on (group, value), so one group's
    * values SPAN partitions, and global in-group ranks come from
    * per-(partition, group) count offsets (the [[PrefixSum]] trick with a
    * composite key). The per-(partition, group) stat rows that reach the
    * driver number ≈ groups + partitions, never data.
    *
    * Returns a DataFrame (`groupCol`, `p`, `value`) — one row per
    * (group, requested percentile); group keys ride as strings (callers
    * re-cast/join as needed; percentile reports are driver-sized by
    * nature). Null groups and null values are excluded, matching the
    * aggregate's contract. Interpolation = Spark's Percentile formula,
    * identical to [[exactInterpolated]].
    */
  def groupedExactInterpolated(df: DataFrame, groupCol: String,
                               valueCol: String,
                               ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"percentiles must be in [0,1] (got $ps)")
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df
      .select(col(groupCol).cast("string").as("__g"),
        col(valueCol).cast("double").as("__v"))
      .filter(col("__g").isNotNull && col("__v").isNotNull)
    val parts = spark.sessionState.conf.numShufflePartitions
    val ranged = OperatorCaches.persistTracked(
      vals.repartitionByRange(parts, col("__g"), col("__v"))
        .withColumn("__pid", spark_partition_id()))
    // per-(partition, group) counts: ≈ |groups| + |partitions| rows
    val stats = ranged.groupBy(col("__pid"), col("__g"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val nPerG: Map[String, Long] =
      stats.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    // rank offset for group g in partition p = g-rows in partitions < p
    val offsets: Map[String, Long] = stats.groupBy(_._2).flatMap {
      case (g, rows) =>
        val sorted = rows.sortBy(_._1)
        sorted.map(_._1).zip(sorted.map(_._3).scanLeft(0L)(_ + _))
          .map { case (pid, off) => s"$pid\u0001$g" -> off }
    }
    // driver-built bracket-rank wishlist, broadcast-joined against ranks
    val wanted = nPerG.toSeq.flatMap { case (g, n) =>
      ps.flatMap { p =>
        val pos = p * (n - 1)
        Seq(g -> (pos.floor.toLong + 1), g -> (pos.ceil.toLong + 1))
      }
    }.distinct
    val wantedDf = wanted.toDF("__g", "__rn")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid"), col("__g")).orderBy(col("__v"))
    val bracket = ranged
      .withColumn("__rn", row_number().over(w).cast("long") +
        element_at(typedLit(offsets),
          concat_ws("\u0001", col("__pid"), col("__g"))))
      .join(broadcast(wantedDf), Seq("__g", "__rn"))
      .select(col("__g"), col("__rn"), col("__v"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val out = nPerG.toSeq.sortBy(_._1).flatMap { case (g, n) =>
      ps.map { p =>
        val pos = p * (n - 1)
        val (lo, hi) = (pos.floor.toLong, pos.ceil.toLong)
        val v =
          if (lo == hi) bracket((g, lo + 1))
          else (hi - pos) * bracket((g, lo + 1)) + (pos - lo) * bracket((g, hi + 1))
        (g, p, v)
      }
    }
    out.toDF(groupCol, "p", "value")
  }

  /** Per-group EXACT order statistics at caller-chosen integer ranks —
    * the no-interpolation sibling of [[groupedExactInterpolated]] (same
    * range-partition + broadcast-offset machinery, same scale shape:
    * a group's values span partitions, per-(partition, group) COUNTS
    * cross the driver, never values). `ranksOf` maps each group's size n
    * to the 1-based ranks wanted from its sorted values; returns
    * (group, rn, value) for each requested rank. Integer ranks make the
    * result engine-exact with no interpolation-formula coupling: the
    * value AT a sorted rank is well-defined even under duplicate values,
    * whatever partitioning splits the ties. */
  def groupedAtRanks(df: DataFrame, groupCol: String, valueCol: String,
                     ranksOf: Long => Seq[Long]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df
      .select(col(groupCol).cast("string").as("__g"),
        col(valueCol).cast("double").as("__v"))
      .filter(col("__g").isNotNull && col("__v").isNotNull)
    val parts = spark.sessionState.conf.numShufflePartitions
    val ranged = OperatorCaches.persistTracked(
      vals.repartitionByRange(parts, col("__g"), col("__v"))
        .withColumn("__pid", spark_partition_id()))
    val stats = ranged.groupBy(col("__pid"), col("__g"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val nPerG: Map[String, Long] =
      stats.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val offsets: Map[String, Long] = stats.groupBy(_._2).flatMap {
      case (g, rows) =>
        val sorted = rows.sortBy(_._1)
        sorted.map(_._1).zip(sorted.map(_._3).scanLeft(0L)(_ + _))
          .map { case (pid, off) => s"$pid\u0001$g" -> off }
    }
    val wanted = nPerG.toSeq
      .flatMap { case (g, n) => ranksOf(n).map(g -> _) }.distinct
    val wantedDf = wanted.toDF("__g", "__rn")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid"), col("__g")).orderBy(col("__v"))
    ranged
      .withColumn("__rn", row_number().over(w).cast("long") +
        element_at(typedLit(offsets),
          concat_ws("\u0001", col("__pid"), col("__g"))))
      .join(broadcast(wantedDf), Seq("__g", "__rn"))
      .select(col("__g").as(groupCol), col("__rn").as("rn"),
        col("__v").as("value"))
  }
}
