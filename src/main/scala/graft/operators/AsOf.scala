package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Generalized as-of (nearest-event) join — pandas `merge_asof` semantics
  * with `direction` (backward / forward) and an optional `tolerance`,
  * composed from the tagged-union + running-window trick (q15's shape;
  * reference behavior: utils/merge semantics, not copied code).
  *
  * Why a union, not a join: the naive formulation is a non-equi join
  * (`l.on >= r.on`) plus an argmax — a nested-loop plan. Unioning both
  * sides and running ONE window partitioned by the key turns it into a
  * single shuffle on `by` with an O(n log n) per-partition sort, the same
  * cost as a sort-merge join — and it inherits AQE skew handling on the
  * partition key. At 100 TB both sides stream through one exchange each;
  * nothing is broadcast, nothing loops.
  */
object AsOf {

  /** Left rows with the nearest right row attached.
    *
    * @param left       probe side; ALL its columns are kept
    * @param right      reference side; its payload columns come back
    *                   prefixed `asof_` (so schemas can overlap)
    * @param byCol      equality key (both sides)
    * @param onCol      ordering column (both sides) — numeric or timestamp
    * @param direction  "backward" (latest right with r.on <= l.on) or
    *                   "forward" (earliest right with r.on >= l.on)
    * @param tolerance  max |l.on − r.on| in ON-units (microseconds when
    *                   `onCol` is a timestamp); beyond it the match is
    *                   nulled, the left row is kept (merge_asof contract)
    *
    * Right-side ties on (by, on) break deterministically by the right
    * payload struct's field order (struct comparison is lexicographic) —
    * callers should put an id column first in `right` for a meaningful
    * tiebreak.
    */
  def asofJoin(left: DataFrame, right: DataFrame, byCol: String, onCol: String,
               direction: String = "backward",
               tolerance: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward (got $direction)")
    val payloadCols = right.columns.filter(c => c != byCol && c != onCol).toSeq
    require(payloadCols.nonEmpty, "right side needs at least one payload column")

    // matched right payload travels as ONE struct (null on left rows) —
    // the window then carries a single value, and the struct doubles as
    // the deterministic tiebreak among equal-(by, on) right rows
    val rStruct = struct((payloadCols.map(col) :+ col(onCol).as("__on")): _*)
    // at equal `on`, the candidate right row must fall INSIDE the frame of
    // the left row that shares its timestamp: backward scans the preceding
    // frame (right first ⇒ tag 0), forward the following (right last ⇒ 1)
    val (rTag, lTag) = if (direction == "backward") (0, 1) else (1, 0)
    val r = right.select(col(byCol), col(onCol), lit(rTag).as("__tag"),
      rStruct.as("__r"))
    val l = left.withColumn("__tag", lit(lTag))
      .withColumn("__r", lit(null).cast(r.schema("__r").dataType))

    val ord = Seq(col(onCol), col("__tag"), col("__r"))
    val base = Window.partitionBy(col(byCol)).orderBy(ord: _*)
    val matched =
      if (direction == "backward")
        last(col("__r"), ignoreNulls = true)
          .over(base.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      else
        first(col("__r"), ignoreNulls = true)
          .over(base.rowsBetween(Window.currentRow, Window.unboundedFollowing))

    // |l.on − r.on| in exact integer units (µs for timestamps)
    def units(c: Column): Column = left.schema(onCol).dataType match {
      case TimestampType => unix_micros(c)
      case _ => c.cast("long")
    }
    val rCols = r.columns.toSet
    val withM = l.unionByName(r.select((l.columns.toSeq).map {
        case c if rCols.contains(c) => col(c)
        case c => lit(null).cast(left.schema(c).dataType).as(c)
      }: _*))
      .withColumn("__m", matched)
      .filter(col("__tag") === lTag)
    val inTol = tolerance match {
      case Some(t) =>
        abs(units(col(onCol)) - units(col("__m.__on"))) <= t
      case None => lit(true)
    }
    val gated = withM.withColumn("__m",
      when(col("__m").isNotNull && inTol, col("__m")))
    payloadCols.foldLeft(gated) { (df, c) =>
      df.withColumn(s"asof_$c", col(s"__m.$c"))
    }
      .withColumn(s"asof_$onCol", col("__m.__on"))
      .drop("__tag", "__r", "__m")
  }
}
