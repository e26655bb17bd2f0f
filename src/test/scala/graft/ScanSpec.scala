package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Scan

/** S1–S4 scans (SURVEY.md §2.1): schema merge, provenance, CSV inference. */
class ScanSpec extends SparkSpec {

  test("parquetMerged unions drifted schemas by name and records provenance (S3)") {
    val tmp = Files.createTempDirectory("scanspec").toString
    val n = spark.read.parquet(s"$sfDir/nation.parquet")
    n.select("n_nationkey", "n_name").write.parquet(s"$tmp/a")
    n.select("n_nationkey", "n_regionkey").write.parquet(s"$tmp/b")
    val merged = Scan.parquetMerged(spark, Seq(s"$tmp/a", s"$tmp/b"))
    assert(merged.columns.toSet === Set("n_nationkey", "n_name", "n_regionkey", "filename"))
    assert(merged.count() === 2 * n.count())
    // provenance column populated for every row
    assert(merged.filter(col("filename") === "").count() === 0)
    // rows from file a have null n_regionkey, rows from b null n_name
    assert(merged.filter(col("filename").contains("/a/")).filter(col("n_regionkey").isNotNull).count() === 0)
    assert(merged.filter(col("filename").contains("/b/")).filter(col("n_name").isNotNull).count() === 0)
  }

  test("csvInferred infers numeric and string types from content (S4)") {
    val tmp = Files.createTempDirectory("scanspec").toString
    Files.writeString(java.nio.file.Paths.get(s"$tmp/manifest.csv"),
      "num_rows,filename\n100,a.parquet\n2000,b.parquet\n")
    val df = Scan.csvInferred(spark, s"$tmp/manifest.csv")
    assert(df.schema("num_rows").dataType === IntegerType)
    assert(df.schema("filename").dataType === StringType)
    assert(df.count() === 2)
  }

  test("explicit-schema scan pins types independent of content (scale path)") {
    val tmp = Files.createTempDirectory("scanspec").toString
    Files.writeString(java.nio.file.Paths.get(s"$tmp/m.csv"),
      "num_rows,filename\n100,a.parquet\n")
    val schema = StructType(Seq(
      StructField("num_rows", LongType), StructField("filename", StringType)))
    val df = Scan.csvWithSchema(spark, schema, s"$tmp/m.csv")
    assert(df.schema("num_rows").dataType === LongType)
    assert(df.head().getLong(0) === 100L)
  }

  test("registerViews exposes every fixture table to spark.sql, events nanos-safe") {
    val names = Scan.registerViews(spark, sfDir)
    assert(names.contains("lineitem") && names.contains("events"))
    assert(spark.sql("SELECT count(*) FROM lineitem").head().getLong(0) > 0)
    // events ts is usable as a proper timestamp through SQL
    val r = spark.sql("SELECT min(ts) FROM events").head()
    assert(r.get(0).isInstanceOf[java.sql.Timestamp])
  }

  test("parquet scans prune columns and push predicates down to the reader") {
    val plan = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter(col("l_quantity") > 30)
      .select("l_orderkey", "l_quantity")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)]"),
      s"predicate not pushed:\n$plan")
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"columns not pruned:\n$plan")
  }
}
