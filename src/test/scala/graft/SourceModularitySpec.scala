package graft

import java.nio.file.Files

import graft.operators.{FramePool, OperatorCaches}

/** Planted-semantics checks for q206's source-modularity table over the
  * LSH near-dup graph: for each source s with edge incidences,
  * within_frac = e_ss/m, expected_frac = (deg_s / 2m)², and the reported
  * modularity_delta is their difference — the per-community term of
  * Newman modularity Q = Σ_s (e_ss/m − (deg_s/2m)²). Exact-duplicate
  * texts pin the LSH pair set (jac = 1.0 collides in every band), and
  * disjoint vocabularies pin the non-edges (no shared 3-shingle → no
  * candidate, and exact Jaccard 0 < 0.1 even on a chance bucket
  * collision), so the whole table is hand-computable. */
class SourceModularitySpec extends SparkSpec {

  private def q206(dir: String): Array[(String, Long, Long, Long, Double, Double, Double)] =
    SparkEntry.queries("q206_dupgraph_source_modularity")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))

  private def plant(rows: Seq[(Long, String, String)]): String = {
    val tmp = Files.createTempDirectory("modularityspec").toString
    import spark.implicits._
    rows.toDF("doc_id", "text", "source")
      .write.parquet(s"$tmp/documents.parquet")
    tmp
  }

  // ≥3 whitespace tokens each (shingleSets drops shorter docs), pairwise
  // disjoint vocabularies
  private val T1 = "alpha beta gamma delta epsilon"
  private val T2 = "one two three four five"
  private val T3 = "north south east west center"

  test("within/cross counts and modularity deltas match the hand-computed table") {
    // x: {1,2}=T1 and {3,4}=T2 → 2 within-x edges; y: {5}=T1 → cross
    // edges (1,5),(2,5); z: {6}=T3 unique → no incidences at all.
    // m=4; x: e_xx=2, cross=2, deg=6 → 0.5 − (6/8)² = −0.0625;
    //      y: e_yy=0, cross=2, deg=2 → 0.0 − (2/8)² = −0.0625.
    // All four fractions are exact in binary, so === is safe.
    val dir = plant(Seq(
      (1L, T1, "x"), (2L, T1, "x"), (3L, T2, "x"), (4L, T2, "x"),
      (5L, T1, "y"), (6L, T3, "z")))
    try {
      val got = q206(dir)
      assert(got.toSeq === Seq(
        ("x", 2L, 2L, 6L, 0.5, 0.5625, -0.0625),
        ("y", 0L, 2L, 2L, 0.0, 0.0625, -0.0625)))
      // z has no edges: absent, not zero-filled — the report covers
      // sources PARTICIPATING in the dup graph (got has exactly x, y)
    } finally {
      OperatorCaches.release()
      FramePool.release()
    }
  }

  test("a single-source graph is all within: delta = 1 − 1 = 0 exactly") {
    // one community holding every edge: e_ss/m = 1 and deg_s = 2m, so
    // the delta term is identically zero — a boundary the full-outer
    // join + coalesce path must survive (cross_edges column is all-null)
    val dir = plant(Seq(
      (1L, T1, "solo"), (2L, T1, "solo"), (3L, T1, "solo")))
    try {
      val got = q206(dir)
      assert(got.toSeq === Seq(("solo", 3L, 0L, 6L, 1.0, 1.0, 0.0)))
    } finally {
      OperatorCaches.release()
      FramePool.release()
    }
  }
}
