package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Closed-form simple linear regression (OLS) via SUFFICIENT STATISTICS
  * — the algebra behind q222, factored out because the five-accumulator
  * form is exactly what makes the statistic streamable: (n, Σx, Σy,
  * Σxy, Σx²) over any partition of the data merge by plain per-group
  * addition, so per-batch partials summed at serve time equal the
  * one-pass aggregation EXACTLY (integer/decimal sums — no
  * floating-point reassociation anywhere), which is what
  * [[graft.streaming.EventStreams.olsMonitorSink]] rides.
  *
  * Exactness contract (shared with the q222 oracle): x = whole days
  * since 2024-01-01, y = value in micro-units via the deterministic
  * IEEE→DECIMAL(18,6)→×10⁶ cast, all sums DECIMAL(38,0)/HUGEINT, and
  * the normal-equation solution published FIXED-POINT on the 10⁹ grid
  * through integer division (truncation identical in both engines).
  * Degenerate groups (zero x-variance) report NULL. */
object Ols {

  /** The (event_type, x, y) frame both the batch query and the
    * streaming monitor aggregate — one map over the raw events. */
  def xy(events: DataFrame): DataFrame =
    events.filter(col("ts").isNotNull)
      .select(col("event_type"),
        datediff(col("ts").cast("date"), lit("2024-01-01"))
          .cast("long").as("x"),
        (col("value").cast("decimal(18,6)") * lit(1000000))
          .cast("long").as("y"))

  /** One 5-accumulator keyed aggregation — map-side combined, constant
    * output per group. The same shape aggregates raw rows AND merges
    * previously-written partials (sums of sums ≡ one-pass sums). */
  def suffStats(xyFrame: DataFrame): DataFrame =
    xyFrame.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      sum(expr("CAST(x AS DECIMAL(38,0))")).as("sx"),
      sum(expr("CAST(y AS DECIMAL(38,0))")).as("sy"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"))

  /** Merge previously-materialized sufficient-statistic partials —
    * plain per-group addition (`n` stays an exact long, the four
    * moment sums stay DECIMAL(38,0)). */
  def mergeStats(partials: DataFrame): DataFrame =
    partials.groupBy(col("event_type")).agg(
      sum(col("n")).as("n"), sum(col("sx")).as("sx"),
      sum(col("sy")).as("sy"), sum(col("sxy")).as("sxy"),
      sum(col("sxx")).as("sxx"))

  /** Solve the normal equations on the 10⁹ fixed-point grid:
    * slope·10⁹ = ⌊Sxy·10³/Sxx⌋, intercept·10⁹ =
    * ⌊(Σy·Sxx − Sxy·Σx)·10³/(n·Sxx)⌋ (the ×10³ on micro-scaled y lands
    * both on the same grid; integer division truncates toward zero
    * identically in both engines). */
  def solve(stats: DataFrame): DataFrame =
    stats.select(col("event_type"), col("n"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("s_num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("s_den"),
        col("sy"), col("sx"))
      .select(col("event_type"), col("n"),
        when(col("s_den") === 0, lit(null).cast("long"))
          .otherwise(expr("(s_num * 1000) DIV s_den"))
          .as("slope_fp9"),
        when(col("s_den") === 0, lit(null).cast("long"))
          .otherwise(
            expr("((sy * s_den - s_num * sx) * 1000) DIV (n * s_den)"))
          .as("intercept_fp9"))
      .orderBy("event_type")
}
