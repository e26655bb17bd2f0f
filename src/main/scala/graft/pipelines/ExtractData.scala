package graft.pipelines

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Convert, Transforms}
import graft.sources.Scan

/** Mirror of the reference's data-acquisition pipeline
  * (`extract_data.py` → `extract_taxi_data` → `create_samples`,
  * `utils.py:47-111`), over local fixture paths instead of HTTPS (remote
  * HTTP is not a Hadoop FS — SURVEY.md §2.1 S3 note: stage downloads first).
  *
  * Steps, each mapped to its SURVEY operator id:
  *  1. multi-file scan, union-by-name, filename provenance (S3)
  *  2. per-size seeded exact-n samples (O2, V1 preconditions)
  *  3. parquet sample files (K5)
  *  4. CSV manifest of (num_rows, filename) (K6)
  */
object ExtractData {

  final case class Result(manifestPath: String, sampleFiles: Seq[(Long, String)])

  /** @param inputs        parquet paths to scan as one merged table
    * @param sampleSizes   exact sample sizes, each written as one parquet dir
    * @param outDir        output root (samples/ + extracted_files.csv)
    * @param seed          sampling seed (reference pins 721, `utils.py:73`)
    * @param skipIfPresent V2 gate mirroring `extract_data.py:8-14`: when the
    *                      manifest already exists, return its contents
    *                      without re-extracting (idempotent re-runs) */
  def run(spark: SparkSession, inputs: Seq[String], sampleSizes: Seq[Int],
          outDir: String, seed: Long = 721L,
          skipIfPresent: Boolean = true): Result = {
    require(sampleSizes.nonEmpty, "sampleSizes must be non-empty")
    require(sampleSizes.forall(_ > 0), "sample sizes must be positive") // V1
    Files.createDirectories(Paths.get(outDir))

    val manifestPath = s"$outDir/extracted_files.csv"
    if (skipIfPresent && Files.exists(Paths.get(manifestPath))) { // V2
      val existing = Scan.csvInferred(spark, manifestPath)
        .collect()
        .map(r => (r.get(0).toString.toLong, r.get(1).toString)).toSeq
      return Result(manifestPath, existing)
    }

    val merged: DataFrame = Scan.parquetMerged(spark, inputs) // S3

    val written = sampleSizes.map { n =>
      val path = s"$outDir/samples/sample_$n.parquet"
      val sample = Transforms.sampleExactN(merged.drop("filename"), n, seed) // O2
      Convert.toParquet(sample, path) // K5
      val actual = spark.read.parquet(path).count()
      (actual, s"sample_$n.parquet")
    }

    // K6: tiny manifest — row-oriented write is fine at this cardinality,
    // but stay in-engine for symmetry with the reference's csv.writer.
    import spark.implicits._
    Convert.csvSingleFile(
      written.toDF("num_rows", "filename").coalesce(1), manifestPath)
    Result(manifestPath, written)
  }

  /** Reference-shaped entry over remote sources: stage the URLs to local
    * files first (HTTP(S) is not a Hadoop FS — SURVEY §2.1 S3), then run
    * the normal extract. Both the staging and the extract are
    * skip-if-present, so a re-run touches nothing. */
  def runFromUrls(spark: SparkSession, urls: Seq[String], sampleSizes: Seq[Int],
                  outDir: String, stagingDir: String, seed: Long = 721L,
                  skipIfPresent: Boolean = true): Result = {
    val staged = graft.sources.Stage.fetchToLocal(urls, stagingDir, skipIfPresent)
    run(spark, staged.map(_.toString), sampleSizes, outDir, seed, skipIfPresent)
  }
}
