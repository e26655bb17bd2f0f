package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Physical-layout control: bucketing for shuffle-free co-located joins.
  *
  * A fact–fact equi-join shuffles BOTH sides on the key every time it
  * runs. When the same join recurs (the daily pipeline shape), pre-bucket
  * both tables on the join key: each side's files are hash-partitioned by
  * bucket at WRITE time, so Catalyst proves the children are co-partitioned
  * and plans a SortMergeJoin with zero Exchange — the shuffle is paid once
  * at layout time instead of on every query. This is the 100 TB answer to
  * "the same 10 TB join runs every day".
  *
  * Bucketed tables live in the session catalog (`saveAsTable` — plain
  * parquet + bucket metadata; no Hive needed). Match `numBuckets` to the
  * natural parallelism of the big side; both sides must bucket on the same
  * key with the same count for the join to stay exchange-free.
  */
object Layout {

  /** Write `df` as a bucketed (and bucket-sorted) catalog table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    numBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-key bucketed tables — plans with no Exchange on either
    * side (asserted in LayoutSpec). */
  def bucketedEquiJoin(spark: SparkSession, left: String, right: String,
                       key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
