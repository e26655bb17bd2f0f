package graft.pipelines

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Convert, Transforms}
import graft.sources.Scan

/** Mirror of the reference's benchmark harness (`main.py:10-40`): read the
  * sample manifest, order work by size, randomize execution order, time
  * each conversion method once per dataset, pivot long→wide, export
  * results.csv.
  *
  * The reference compares five libraries; a single-engine mirror compares
  * the engine's own sink shapes instead — the same grid mechanics
  * (B1/B2), pivot (A1), and export (K7/K1).
  */
object BenchGrid {

  /** Conversion methods under test: name → (spark, inPath, outDir) => Unit. */
  val methods: Seq[(String, (SparkSession, String, String) => Unit)] = Seq(
    "csv_dir" -> ((s, in, out) =>
      Convert.parquetToCsv(s, in, out, maxRecordsPerFile = Long.MaxValue)),
    "csv_chunked" -> ((s, in, out) =>
      Convert.parquetToCsv(s, in, out, maxRecordsPerFile = 500000L)),
    "csv_single" -> ((s, in, out) =>
      { Convert.csvSingleFile(s.read.parquet(in), s"$out/out.csv"); () }),
    "parquet_copy" -> ((s, in, out) =>
      Convert.toParquet(s.read.parquet(in), out)))

  /** @param manifestPath CSV of (num_rows, filename) from ExtractData
    * @param samplesDir   directory containing the sample parquet files
    * @param outDir       where results.csv lands
    * @return the wide results DataFrame (size × method → seconds) */
  def run(spark: SparkSession, manifestPath: String, samplesDir: String,
          outDir: String, shuffleSeed: Long = 17L) = {
    // S4 + O1: manifest scan with inference, sorted by size
    val manifest = Scan.csvInferred(spark, manifestPath).orderBy("num_rows")
    // P4: column → driver list
    val work = manifest.select(col("num_rows").cast("long"), col("filename"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // O3: randomized execution order (driver-side, like the reference)
    val shuffled = new scala.util.Random(shuffleSeed).shuffle(
      for { (n, f) <- work; (m, _) <- methods } yield (n, f, m))

    val byName = methods.toMap
    // B1/B2: one timed run per (method, dataset) cell. V3: a failing cell
    // records -1.0 and the grid continues (reference `utils.py:128-137`
    // try/except/continue semantics) — one bad dataset must not lose the
    // whole results table.
    val cells = shuffled.map { case (n, file, method) =>
      val in = s"$samplesDir/$file"
      val out = java.nio.file.Files.createTempDirectory("benchgrid").toString
      val t0 = System.nanoTime()
      scala.util.Try(byName(method)(spark, in, s"$out/run")) match {
        case scala.util.Success(_) => (method, n, (System.nanoTime() - t0) / 1e9)
        case scala.util.Failure(e) =>
          System.err.println(s"[benchgrid] $method on $file failed: ${e.getMessage}")
          (method, n, -1.0)
      }
    }

    // A2 → A1: accumulate rows, pivot long→wide, O4 sort, K7/K1 export
    import spark.implicits._
    val wide = Transforms.pivotWide(
      cells.toDF("method", "size", "time"),
      index = "size", on = "method", value = "time",
      values = methods.map(_._1))
      .orderBy("size")
    Convert.csvSingleFile(wide.coalesce(1), s"$outDir/results.csv")
    // K7 garnish: the reference README's results figure, as standalone SVG
    Chart.resultsSvg(wide, methods.map(_._1), s"$outDir/results.svg")
    wide
  }
}
