package graft

import java.nio.file.Files

import graft.operators.{FramePool, OperatorCaches}

/** Planted-semantics checks for q207's per-node local clustering
  * coefficient. Exact-duplicate texts make every dup group a CLIQUE with
  * all pairwise Jaccards 1.0 (pinned LSH pairs, as in
  * SourceModularitySpec), so degrees, per-node triangle counts, and
  * c = 2t/(d(d−1)) are hand-computable. K4 is the load-bearing fixture:
  * it has 4 distinct triangles and each node sits in exactly 3 — a
  * per-corner crediting bug (double-counted wedges, or crediting only
  * the wedge apex) lands on 6 or 1 instead. */
class LocalClusteringSpec extends SparkSpec {

  private def q207(dir: String): Seq[(Long, Long, Long, Double)] =
    SparkEntry.queries("q207_local_clustering")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq

  private def plant(rows: Seq[(Long, String)]): String = {
    val tmp = Files.createTempDirectory("clusteringspec").toString
    import spark.implicits._
    rows.map { case (id, text) => (id, text, "s") }
      .toDF("doc_id", "text", "source")
      .write.parquet(s"$tmp/documents.parquet")
    tmp
  }

  private val T1 = "alpha beta gamma delta epsilon"
  private val T2 = "one two three four five"
  private val T3 = "north south east west center"

  test("K4, K3, K2 components: degrees, triangle credits, coefficients") {
    // {1,2,3,4}=T1 → K4: d=3, t=3 (of the component's 4 triangles, each
    // node is in exactly 3), c = 2·3/(3·2) = 1.0
    // {5,6,7}=T2 → K3: d=2, t=1, c = 2·1/(2·1) = 1.0
    // {8,9}=T3 → K2: d=1, t=0, c = 0.0 via the d<2 branch
    val dir = plant(Seq(
      (1L, T1), (2L, T1), (3L, T1), (4L, T1),
      (5L, T2), (6L, T2), (7L, T2),
      (8L, T3), (9L, T3)))
    try {
      val got = q207(dir)
      assert(got === Seq(
        (1L, 3L, 3L, 1.0), (2L, 3L, 3L, 1.0),
        (3L, 3L, 3L, 1.0), (4L, 3L, 3L, 1.0),
        (5L, 2L, 1L, 1.0), (6L, 2L, 1L, 1.0), (7L, 2L, 1L, 1.0),
        (8L, 1L, 0L, 0.0), (9L, 1L, 0L, 0.0)))
    } finally {
      OperatorCaches.release()
      FramePool.release()
    }
  }
}
