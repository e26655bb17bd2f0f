package graft.operators

import org.apache.spark.sql.DataFrame
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

  /** SCD2-style validity intervals from an event log: for each entity,
    * keep the rows where `attrCol` CHANGED (vs the previous event in
    * (tsCol, tieCol) order), and close each interval at the next change's
    * timestamp (null = current). One window pass partitioned by the
    * entity key. The tie column must make the per-entity order total. */
  def scd2(events: DataFrame, entityCol: String, attrCol: String,
           tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(entityCol)).orderBy(col(tsCol), col(tieCol))
    val changes = events
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col(attrCol))
    val wc = Window.partitionBy(col(entityCol)).orderBy(col(tsCol), col(tieCol))
    changes
      .withColumn("valid_to", lead(col(tsCol), 1).over(wc))
      .select(col(entityCol), col(attrCol),
        col(tsCol).as("valid_from"), col("valid_to"))
  }

  /** Snapshot diff: per-key status between two generations — `added`
    * (only in `next`), `removed` (only in `prev`), `changed` (both, any
    * compared column differs), `unchanged`. One full-outer join on the
    * key; comparison via null-safe equality so null attribute values
    * diff correctly. */
  def diff(prev: DataFrame, next: DataFrame, keyCols: Seq[String],
           compareCols: Seq[String]): DataFrame = {
    val p = prev.select((keyCols ++ compareCols).map(c => col(c).as(s"p_$c")): _*)
    val n = next.select((keyCols ++ compareCols).map(c => col(c).as(s"n_$c")): _*)
    val joinCond = keyCols.map(c => col(s"p_$c") === col(s"n_$c")).reduce(_ && _)
    val inPrev = col(s"p_${keyCols.head}").isNotNull
    val inNext = col(s"n_${keyCols.head}").isNotNull
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
