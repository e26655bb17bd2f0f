package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.pipelines.{BenchGrid, ExtractData}

/** End-to-end mirror of the reference's two entry points: extract → sample
  * → manifest, then the timed conversion grid → pivoted results.csv. */
class PipelineSpec extends SparkSpec {

  test("ExtractData writes exact-n samples and a manifest") {
    val out = Files.createTempDirectory("pipespec").toString
    val r = ExtractData.run(spark,
      inputs = Seq(s"$sfDir/lineitem.parquet"),
      sampleSizes = Seq(100, 500), outDir = out)
    assert(r.sampleFiles.map(_._1) === Seq(100L, 500L))
    assert(Files.exists(Paths.get(r.manifestPath)))
    val manifest = Files.readAllLines(Paths.get(r.manifestPath))
    assert(manifest.get(0) === "num_rows,filename")
    assert(manifest.size() === 3)
    // sample parquet readable and exact
    assert(spark.read.parquet(s"$out/samples/sample_100.parquet").count() === 100)
  }

  test("ExtractData rejects invalid sample sizes (V1)") {
    val out = Files.createTempDirectory("pipespec").toString
    intercept[IllegalArgumentException] {
      ExtractData.run(spark, Seq(s"$sfDir/lineitem.parquet"), Seq(-5), out)
    }
  }

  test("BenchGrid times every (method, size) cell and exports pivoted results") {
    val out = Files.createTempDirectory("pipespec").toString
    val ex = ExtractData.run(spark,
      inputs = Seq(s"$sfDir/lineitem.parquet"),
      sampleSizes = Seq(100, 300), outDir = out)
    val wide = BenchGrid.run(spark, ex.manifestPath, s"$out/samples", out)
    assert(wide.columns.toSeq ===
      "size" +: BenchGrid.methods.map(_._1))
    val rows = wide.collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(100L, 300L))
    // every cell timed (positive)
    rows.foreach(r => (1 until r.length).foreach(i => assert(r.getDouble(i) > 0.0)))
    val resultsCsv = Files.readAllLines(Paths.get(s"$out/results.csv"))
    assert(resultsCsv.get(0) === "size," + BenchGrid.methods.map(_._1).mkString(","))
    assert(resultsCsv.size() === 3)
    // the results figure: one polyline + one direct end label per method
    val svg = Files.readString(Paths.get(s"$out/results.svg"))
    assert("<polyline".r.findAllIn(svg).length === BenchGrid.methods.size)
    BenchGrid.methods.foreach { case (m, _) =>
      assert(svg.contains(s">$m</text>"), s"missing label for $m")
    }
  }

  test("ExtractData skips re-extraction when the manifest exists (V2)") {
    val out = Files.createTempDirectory("pipespec").toString
    val first = ExtractData.run(spark,
      inputs = Seq(s"$sfDir/lineitem.parquet"),
      sampleSizes = Seq(100), outDir = out)
    val mtime = Files.getLastModifiedTime(Paths.get(first.manifestPath))
    val second = ExtractData.run(spark,
      inputs = Seq(s"$sfDir/lineitem.parquet"),
      sampleSizes = Seq(100), outDir = out)
    assert(second.sampleFiles === first.sampleFiles)
    assert(Files.getLastModifiedTime(Paths.get(second.manifestPath)) === mtime)
    // explicit opt-out re-extracts
    val third = ExtractData.run(spark,
      inputs = Seq(s"$sfDir/lineitem.parquet"),
      sampleSizes = Seq(100), outDir = out, skipIfPresent = false)
    assert(Files.getLastModifiedTime(Paths.get(third.manifestPath)) !== mtime)
  }

  test("Stage.fetchToLocal stages multi-URL sources and ExtractData runs from them (S3)") {
    val src = Files.createTempDirectory("pipespec_src").toString
    val staging = Files.createTempDirectory("pipespec_stage").toString
    val out = Files.createTempDirectory("pipespec_out").toString
    // two "remote" parquet files, served as file:// URLs
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    li.limit(300).coalesce(1).write.mode("overwrite").parquet(s"$src/part_a.parquet")
    li.limit(200).coalesce(1).write.mode("overwrite").parquet(s"$src/part_b.parquet")
    def onePart(dir: String): String =
      Files.list(Paths.get(dir)).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).next().toString
    val urls = Seq(
      s"file://${onePart(s"$src/part_a.parquet")}",
      s"file://${onePart(s"$src/part_b.parquet")}")
    val staged = graft.sources.Stage.fetchToLocal(urls, staging)
    assert(staged.forall(Files.exists(_)))
    // staging is idempotent (V2): second fetch leaves mtimes untouched
    val mtimes = staged.map(Files.getLastModifiedTime(_))
    val again = graft.sources.Stage.fetchToLocal(urls, staging)
    assert(again.map(Files.getLastModifiedTime(_)) === mtimes)
    val r = ExtractData.runFromUrls(spark, urls, Seq(50), out, staging)
    assert(r.sampleFiles.map(_._1) === Seq(50L))
    assert(spark.read.parquet(s"$out/samples/sample_50.parquet").count() === 50)
  }

  test("Stage.fetchToLocal leaves no .part temp files and rejects basename collisions") {
    val src = Files.createTempDirectory("stagespec_src")
    val staging = Files.createTempDirectory("stagespec_out").toString
    Files.writeString(src.resolve("a.txt"), "payload")
    val staged = graft.sources.Stage.fetchToLocal(
      Seq(s"file://${src.resolve("a.txt")}"), staging)
    assert(Files.readString(staged.head) === "payload")
    val leftovers = Files.list(Paths.get(staging)).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".part")).toSeq
    assert(leftovers.isEmpty, s"temp files left behind: $leftovers")
    // two URLs mapping to one basename must be rejected, not aliased
    val other = Files.createTempDirectory("stagespec_src2")
    Files.writeString(other.resolve("a.txt"), "different")
    intercept[IllegalArgumentException] {
      graft.sources.Stage.fetchToLocal(
        Seq(s"file://${src.resolve("a.txt")}", s"file://${other.resolve("a.txt")}"),
        staging)
    }
  }

  test("BenchGrid survives a poisoned input: bad cells are -1, grid completes (V3)") {
    import spark.implicits._
    val out = Files.createTempDirectory("pipespec").toString
    val ex = ExtractData.run(spark,
      inputs = Seq(s"$sfDir/lineitem.parquet"),
      sampleSizes = Seq(100), outDir = out)
    // poison the manifest with a nonexistent sample file
    Files.writeString(Paths.get(ex.manifestPath),
      "num_rows,filename\n100,sample_100.parquet\n999,missing.parquet\n")
    val wide = BenchGrid.run(spark, ex.manifestPath, s"$out/samples", out)
    val rows = wide.orderBy("size").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(100L, 999L))
    // good row timed, poisoned row marked -1 in every method column
    (1 until rows(0).length).foreach(i => assert(rows(0).getDouble(i) > 0.0))
    (1 until rows(1).length).foreach(i => assert(rows(1).getDouble(i) === -1.0))
  }

  test("TrainingExport writes shuffle-ordered shard files and a self-audited manifest") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("texport").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val res = graft.pipelines.TrainingExport.run(
      spark, docs, "doc_id", "text", out, nShards = 4)
    // every doc lands in exactly one shard; totals audit back to the corpus
    val written = spark.read.parquet(s"$out/shards")
    assert(written.count() === docs.count())
    assert(written.select("doc_id").distinct().count() === docs.count())
    assert(res.shards.map(_._2).sum === docs.count())
    // shard assignment matches the deterministic shuffle contract
    val expect = graft.operators.Quality
      .trainingShuffle(docs, "doc_id", nShards = 4)
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    written.select(col("doc_id"), col("shard").cast("long"))
      .as[(Long, Long)].collect()
      .foreach { case (id, sh) => assert(sh === expect(id), s"doc $id") }
    // manifest audits the written data
    val manifest = scala.io.Source.fromFile(res.manifestPath).getLines().toSeq
    assert(manifest.head === "shard,rows,tokens")
    assert(manifest.size === 5)
    // token counts are real: sum matches a direct corpus count
    val totalToks = docs.select(sum(size(split(col("text"), " ")).cast("long")))
      .head().getLong(0)
    assert(res.shards.map(_._3).sum === totalToks)
    // re-export is byte-stable in shard membership (same salt)
    val res2 = graft.pipelines.TrainingExport.run(
      spark, docs, "doc_id", "text", out, nShards = 4)
    assert(res2.shards === res.shards)
  }
}
