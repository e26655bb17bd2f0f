package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Snapshot/changelog operators — the data-management half of a corpus
  * pipeline: applying update batches, building validity intervals, and
  * diffing snapshot generations.
  *
  * Scale shapes: upsert is a left-anti + union (one shuffle on the key);
  * SCD2 is one window pass partitioned by entity; diff is a single
  * full-outer join on the key. Nothing materializes on the driver.
  */
object Snapshots {

  /** Upsert (MERGE semantics without a table format): rows of `updates`
    * replace same-key rows of `base`; unmatched base rows survive,
    * unmatched updates insert. Key-partitioned anti-join + union — the
    * CDC-apply step for parquet-resident corpora. Both frames must share
    * a schema (unionByName tolerates column order drift). */
  def upsert(base: DataFrame, updates: DataFrame, keyCols: Seq[String]): DataFrame =
    base.join(updates.select(keyCols.map(col): _*), keyCols, "left_anti")
      .unionByName(updates)

  /** Full MERGE/CDC semantics over a changelog with operations: the
    * latest change per key wins (`seqCol` order, ties broken by the
    * higher sequence — callers supply a total per-key order), then
    * deletes (`opCol` = "D") REMOVE the key, anything else
    * replaces-or-inserts ([[upsert]] can't drop rows — Debezium-style
    * streams need tombstones applied). One window keyed by the primary
    * key + one anti-join + union: everything shuffles on the key once,
    * nothing touches the driver. `changes` must carry the base schema
    * plus (`opCol`, `seqCol`). */
  def applyChangelog(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
                     opCol: String = "op", seqCol: String = "seq"): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(desc(seqCol))
    val latest = changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val survivors = latest.filter(upper(col(opCol)) =!= "D")
      .drop(opCol, seqCol)
    base.join(latest.select(keyCols.map(col): _*), keyCols, "left_anti")
      .unionByName(survivors)
  }

  /** SCD2-style validity intervals from an event log: for each entity,
    * keep the rows where `attrCol` CHANGED (vs the previous event in
    * (tsCol, tieCol) order), and close each interval at the next change's
    * timestamp (null = current). One window pass partitioned by the
    * entity key. The tie column must make the per-entity order total. */
  def scd2(events: DataFrame, entityCol: String, attrCol: String,
           tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(entityCol)).orderBy(col(tsCol), col(tieCol))
    // change detection must be null-safe: a transition INTO a null
    // attribute is a real change (prev =!= null would evaluate to null
    // and silently drop it), and lag()'s null cannot distinguish "no
    // previous row" from "previous value was null" — row_number marks
    // the true first row.
    val changes = events
      .withColumn("__rn", row_number().over(w))
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .filter(col("__rn") === 1 || !(col("__prev") <=> col(attrCol)))
    val wc = Window.partitionBy(col(entityCol)).orderBy(col(tsCol), col(tieCol))
    changes
      .withColumn("valid_to", lead(col(tsCol), 1).over(wc))
      .select(col(entityCol), col(attrCol),
        col(tsCol).as("valid_from"), col("valid_to"))
  }

  /** Time-travel read over an [[scd2]] interval frame: the rows valid at
    * instant `at` — i.e. the table as it stood then. A half-open interval
    * check (`valid_from <= at < valid_to`, open-ended rows with null
    * `valid_to` always current), so consecutive versions never overlap at
    * the boundary instant. Pure filter, no shuffle of its own. The
    * scan-pruning payoff applies when `intervals` is a MATERIALIZED
    * history table (the usual shape — SCD2 frames are built once and
    * persisted): then the predicates push into the parquet scan and any
    * historical generation reconstructs in one pruned pass. Composed
    * directly over [[scd2]] the window still processes the full log
    * first — build once, store, then time-travel. */
  def asOf(intervals: DataFrame, at: Column): DataFrame =
    intervals.filter(col("valid_from") <= at &&
      (col("valid_to").isNull || col("valid_to") > at))

  /** Snapshot diff: per-key status between two generations — `added`
    * (only in `next`), `removed` (only in `prev`), `changed` (both, any
    * compared column differs), `unchanged`. One full-outer join on the
    * key; comparison via null-safe equality so null attribute values
    * diff correctly. */
  def diff(prev: DataFrame, next: DataFrame, keyCols: Seq[String],
           compareCols: Seq[String]): DataFrame = {
    // presence is detected by explicit marker columns, not key
    // null-ness: a legitimately null-keyed row must still read as
    // present on its side. (Null keys never MATCH across sides — ===
    // join semantics — so such rows always diff as removed/added.)
    val p = prev.select(((keyCols ++ compareCols).map(c => col(c).as(s"p_$c")) :+
      lit(true).as("__in_prev")): _*)
    val n = next.select(((keyCols ++ compareCols).map(c => col(c).as(s"n_$c")) :+
      lit(true).as("__in_next")): _*)
    val joinCond = keyCols.map(c => col(s"p_$c") === col(s"n_$c")).reduce(_ && _)
    val inPrev = coalesce(col("__in_prev"), lit(false))
    val inNext = coalesce(col("__in_next"), lit(false))
    val same = compareCols.map(c => col(s"p_$c") <=> col(s"n_$c")).reduce(_ && _)
    p.join(n, joinCond, "full_outer")
      .withColumn("status",
        when(!inPrev, lit("added"))
          .when(!inNext, lit("removed"))
          .when(same, lit("unchanged"))
          .otherwise(lit("changed")))
      .select(
        keyCols.map(c => coalesce(col(s"p_$c"), col(s"n_$c")).as(c)) :+
          col("status"): _*)
  }
}
