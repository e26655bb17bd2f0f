package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Skew-mitigation shapes for hot grouping keys.
  *
  * A groupBy on a power-law key (language, source domain, label, …) sends
  * every row of the hottest key to one reduce task; at 100 TB that task
  * runs alone for hours. The standard fix is two-phase aggregation under a
  * salt: phase 1 aggregates on (key, salt) — the hot key fans out over
  * `salts` tasks — phase 2 merges the per-salt partials on the key alone,
  * touching only #keys × salts rows.
  *
  * Spark's partial (map-side) aggregation already handles MOST of this for
  * algebraic aggregates; explicit salting remains the tool when the
  * map-side combine can't absorb the skew (high-cardinality secondary
  * keys, exact decimal sums over huge groups, collect-style aggregates).
  * For skewed JOINS prefer AQE's runtime skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default here).
  *
  * Sums use the engine's exact-decimal discipline (Q.dsum), so the salted
  * two-phase result is bit-identical to a single-phase groupBy — which is
  * exactly what the oracle checks.
  */
object Skew {

  /** Two-phase salted sum+count of `value` per `keys`. The salt must be
    * ROW-unique-ish, not value-derived: a hot key whose rows share few
    * distinct values (flags, counts) would otherwise collapse into a
    * couple of salt buckets and stay hot. `rand(seed)` fans every row out
    * uniformly regardless of its content; ANY assignment is
    * correctness-neutral — decimal addition is associative, so the merged
    * result is invariant to how rows landed in salt buckets (a task retry
    * reshuffling its partition's salts re-aggregates the whole partition
    * either way). */
  def saltedDsum(df: DataFrame, keys: Seq[String], value: Column,
                 salts: Int = 16, seed: Long = 7L): DataFrame = {
    val partial = df
      .withColumn("__salt", floor(rand(seed) * salts).cast("int"))
      .groupBy(keys.map(col) :+ col("__salt"): _*)
      .agg(sum(value.cast(DecimalType(18, 2))).as("__psum"),
        count(lit(1)).as("__pn"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).cast("double").as("sum_value"),
        sum(col("__pn")).as("n"))
  }
}
