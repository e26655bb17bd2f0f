package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One named, oracle-checkable query (the driver contract's unit).
  *
  * @param fn     (spark, sfDir) => result; must end in a deterministic
  *               orderBy (the driver hash-compares rows in order)
  * @param oracle equivalent DuckDB SQL over the same tables; None for ops
  *               not expressible in SQL (driver falls back to a rows>0 check)
  */
final case class QuerySpec(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Shared helpers for oracle-deterministic queries. */
object Q {

  /** Load a fixture table from the scale-factor dir. */
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** The events fixture stores `ts` as parquet TIMESTAMP(NANOS), which
    * Spark 4 rejects outright (PARQUET_TYPE_ILLEGAL). Read nanos as long
    * and floor-truncate to a microsecond TimestampType — the same
    * truncation DuckDB applies when it reads TIMESTAMP_NS, so oracle
    * values line up. Integer `DIV` keeps the ~1.7e18 ns values exact
    * (a double division would lose precision past 2^53). */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(spark, sfDir, "events")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  /** Exact-arithmetic sum of a currency-ish double column: cast each value
    * to DECIMAL(18,2) (deterministic IEEE→decimal rounding), sum exactly,
    * cast the one result back to double. Sidesteps float-summation-order
    * nondeterminism between Spark partitions and the DuckDB oracle
    * (SURVEY.md §7.4.6). Oracle twin:
    * `CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE)`. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Exact-arithmetic mean built from dsum / count; oracle twin:
    * `CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / count(*)`. */
  def davg(c: Column): Column = dsum(c) / count(lit(1))
}
