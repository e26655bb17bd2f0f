package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries live in graft.queries.* (one QuerySpec per operator); this object
  * just aggregates them into the driver's Map shape. */
object SparkEntry {

  /** All registered queries, in registration order. */
  def allSpecs: Seq[QuerySpec] =
    RelationalQueries.specs ++ MiscQueries.specs ++ TextQueries.specs ++
      DedupQueries.specs ++ SimilarityQueries.specs ++ MultimodalQueries.specs ++
      QualityQueries.specs ++ FormatQueries.specs ++ SnapshotQueries.specs ++
      LayoutQueries.specs ++ PqQueries.specs ++ CorpusQueries.specs ++
      CurationQueries.specs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allSpecs.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allSpecs.map(s => s.name -> s.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allSpecs.flatMap(s => s.oracle.map(s.name -> _)).toMap
}
