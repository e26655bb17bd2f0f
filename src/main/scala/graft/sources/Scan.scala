package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Scan surface (SURVEY.md §2.1, S1–S4).
  *
  * Reference behavior being re-expressed (behavioral cites, not code):
  *  - S1/S2 eager+lazy parquet scans (`utils.py:131,159,184,210,236`) — Spark
  *    reads are always lazy, so one entry point covers both shapes.
  *  - S3 multi-file scan with union-by-name schema merge and per-row file
  *    provenance (`utils.py:101-105`).
  *  - S4 header CSV scan with schema inference (`main.py:14`).
  *
  * Scale notes: `mergeSchema=true` costs a footer read per file — fine for a
  * handful of files, wrong for 100 TB; prefer [[parquetWithSchema]] there.
  */
object Scan {

  /** S1/S2: parquet scan. Lazy; Catalyst prunes columns and pushes
    * predicates down to the vectorized parquet reader automatically. */
  def parquet(spark: SparkSession, paths: String*): DataFrame =
    spark.read.parquet(paths: _*)

  /** S1 at 100 TB: explicit schema — no footer sampling over millions of
    * files, and a stable contract independent of file drift. */
  def parquetWithSchema(spark: SparkSession, schema: StructType, paths: Seq[String]): DataFrame =
    spark.read.schema(schema).parquet(paths: _*)

  /** S3: multi-file scan, union columns by name across files with drifting
    * schemas, and record each row's source file (reference
    * `union_by_name=true, filename=true`). */
  def parquetMerged(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(paths: _*)
      .withColumn("filename", input_file_name())

  /** Register every fixture table under `sfDir` as a temp view (named by
    * table), so `spark.sql` users query the same data the DataFrame
    * surface does (see q61). Missing files are skipped. The events table
    * goes through the nanos-safe read (same truncation as
    * graft.queries.Q.events — Spark 4 rejects TIMESTAMP(NANOS) outright). */
  def registerViews(spark: SparkSession, sfDir: String): Seq[String] = {
    val plain = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings")
    val registered = plain.filter { t =>
      val p = s"$sfDir/$t.parquet"
      val exists = new java.io.File(p).exists()
      if (exists) spark.read.parquet(p).createOrReplaceTempView(t)
      exists
    }
    val eventsPath = s"$sfDir/events.parquet"
    if (new java.io.File(eventsPath).exists()) {
      // one shared schema-adaptive reader (nanos-as-long, micros-NTZ, or
      // plain timestamp fixtures all normalize identically) — drift
      // between the SQL view and the DataFrame surface would silently
      // break oracle parity
      graft.queries.Q.events(spark, sfDir).createOrReplaceTempView("events")
      registered :+ "events"
    } else registered
  }

  /** S4: CSV with header + content-inferred schema (inference reads the data
    * twice — verify-scale only; use [[csvWithSchema]] at scale). */
  def csvInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** JSON-lines scan with a declared schema (schema inference over JSON
    * reads everything twice AND unions drifting types — never at scale). */
  def jsonlWithSchema(spark: SparkSession, schema: StructType, path: String,
                      timestampFormat: String = graft.operators.Convert.TimestampFormat): DataFrame =
    spark.read.schema(schema)
      .option("timestampFormat", timestampFormat)
      .option("timestampNTZFormat", timestampFormat)
      .json(path)

  /** ORC scan — columnar like parquet: pruned columns and pushed
    * predicates reach the ORC reader the same way. */
  def orc(spark: SparkSession, paths: String*): DataFrame =
    spark.read.orc(paths: _*)

  /** CSV scan with a declared schema — the scalable path. The null token
    * is an impossible sentinel (see Convert.ReaderNullSentinel) so the
    * writer's bare-empty nulls and quoted-`""` empty strings round-trip
    * distinctly. */
  def csvWithSchema(spark: SparkSession, schema: StructType, path: String,
                    timestampFormat: String = graft.operators.Convert.TimestampFormat,
                    multiLine: Boolean = false): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("timestampFormat", timestampFormat)
      .option("timestampNTZFormat", timestampFormat)
      .option("nullValue", graft.operators.Convert.ReaderNullSentinel)
      // multiLine parses quoted embedded newlines correctly but reads
      // each FILE as one unsplittable unit — at scale leave it off unless
      // string columns can actually contain line breaks (the writer
      // quotes them; the default line-mode reader would shear the record)
      .option("multiLine", multiLine)
      .csv(path)
}
