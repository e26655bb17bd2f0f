package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, DupGraph, FramePool, OperatorCaches}

/** Artifact ≡ live for the persisted near-dup graph: saving the LSH
  * pair frame + CC labels to parquet and loading them back must
  * reproduce the live q111 pipeline row for row — the dedup-family
  * analog of PostingsSpec (text index) and PqSpec (vector index). */
class DupGraphSpec extends SparkSpec {

  import spark.implicits._

  test("saved dup-graph frames round-trip and match the live pipeline") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val frames = DupGraph.build(docs, "doc_id", "text",
      numBands = 4, minJaccard = 0.1, k = 3, rowsPerBand = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_dupgraph_spec")
    try {
      DupGraph.save(frames, dir.toString)
      val loaded = DupGraph.load(spark, dir.toString)

      // pairs: exact round-trip (jac compared bit-for-bit — parquet
      // stores the double verbatim)
      val livePairs = Dedup.lshPairs(docs, "doc_id", "text",
        numBands = 4, minJaccard = 0.1, k = 3, rowsPerBand = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val artPairs = loaded.pairs
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(artPairs === livePairs)
      assert(livePairs.nonEmpty, "fixture produced no near-dup pairs — vacuous")

      // clusters: the loaded labels equal a fresh live clustering
      val liveClusters = Dedup.dupClustersStar(livePairs.toSeq
          .toDF("a_id", "b_id", "jac"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val artClusters = loaded.clusters
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(artClusters === liveClusters)

      // serving never touches the corpus: the loaded plan reads ONLY the
      // artifact parquet
      val scanned = loaded.clusters.inputFiles
      assert(scanned.nonEmpty && scanned.forall(_.contains(dir.toString)),
        s"serve plan reads outside the artifact: ${scanned.mkString(",")}")
    } finally {
      graft.operators.Convert.deleteRecursively(dir)
      OperatorCaches.release()
      FramePool.release()
    }
  }

  test("append to the graph artifact equals a full rebuild") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val oldDocs = docs.filter(col("doc_id") % 10 =!= 7)
    val newDocs = docs.filter(col("doc_id") % 10 === 7)
    val appended = DupGraph.append(
      DupGraph.build(oldDocs, "doc_id", "text"), oldDocs, newDocs,
      "doc_id", "text")
    val rebuilt = DupGraph.build(docs, "doc_id", "text")
    def labels(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(labels(appended.clusters) === labels(rebuilt.clusters))
    assert(labels(rebuilt.clusters).nonEmpty, "no clusters — vacuous fixture")
    // the appended pair set covers the rebuild's (orientation-free)
    def pairKeys(df: org.apache.spark.sql.DataFrame) =
      df.collect().map { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        (math.min(a, b), math.max(a, b))
      }.toSet
    assert(pairKeys(appended.pairs) === pairKeys(rebuilt.pairs))
    OperatorCaches.release()
    FramePool.release()
  }
}
