package graft

import java.nio.file.Files

import graft.operators.{FramePool, OperatorCaches}

/** Planted-semantics checks for q211's bounded 2-core peel: cliques of
  * size ≥ 3 survive intact with core degree |clique|−1, degree-1
  * structures (isolated pairs) peel away entirely, and a graph that is
  * ONLY pairs peels to the empty core. Exact-duplicate texts pin the
  * pair set as in SourceModularitySpec. */
class KcoreSpec extends SparkSpec {

  private def q211(dir: String): Seq[(Long, Long)] =
    SparkEntry.queries("q211_kcore_peel")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  private def plant(rows: Seq[(Long, String)]): String = {
    val tmp = Files.createTempDirectory("kcorespec").toString
    import spark.implicits._
    rows.map { case (id, text) => (id, text, "s") }
      .toDF("doc_id", "text", "source")
      .write.parquet(s"$tmp/documents.parquet")
    tmp
  }

  private val T1 = "alpha beta gamma delta epsilon"
  private val T2 = "one two three four five"
  private val T3 = "north south east west center"

  test("cliques >= 3 survive the peel; pairs are shed") {
    // K4 {1,2,3,4}: core degree 3; K3 {5,6,7}: core degree 2;
    // K2 {8,9}: both endpoints have degree 1 → peeled in round 1
    val dir = plant(Seq(
      (1L, T1), (2L, T1), (3L, T1), (4L, T1),
      (5L, T2), (6L, T2), (7L, T2),
      (8L, T3), (9L, T3)))
    try {
      assert(q211(dir) === Seq(
        (1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L),
        (5L, 2L), (6L, 2L), (7L, 2L)))
    } finally { OperatorCaches.release(); FramePool.release() }
  }

  test("a pairs-only graph peels to the empty core") {
    val dir = plant(Seq((1L, T1), (2L, T1), (3L, T2), (4L, T2)))
    try assert(q211(dir).isEmpty)
    finally { OperatorCaches.release(); FramePool.release() }
  }
}
