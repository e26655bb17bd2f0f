package graft

import graft.operators.Mixture

/** Planted-semantics checks for the mixture-design operators (q241/q242/
  * q244 carry the oracle gates; these pin the algebra on hand-built
  * inputs): greedy cover picks by marginal — not absolute — novelty and
  * bounds its rounds by the source count; water-filling finds the exact
  * integer level and caps only the sources above it. */
class MixtureSpec extends SparkSpec {

  import spark.implicits._

  test("greedy cover picks by marginal novelty and bounds rounds at the source count") {
    // srcA's doc carries 3 distinct 3-gram shingles; srcB's is a strict
    // subset of srcA's (1 shingle, worthless after A); srcC's 2 are
    // disjoint. Greedy must pick A (gain 3), then C (gain 2 — B's
    // absolute count is nonzero but its MARGGINAL gain is 0), then B
    // (gain 0); rounds=5 must stop at 3 rows (3 sources).
    val docs = Seq(
      (1L, "srcA", "a b c d e"),
      (2L, "srcB", "a b c"),
      (3L, "srcC", "x y z w")).toDF("doc_id", "source", "text")
    val got = Mixture.greedySourceCover(docs, "doc_id", "text", "source",
        rounds = 5)
      .as[(Long, String, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got === Seq(
      (1L, "srcA", 3L, 3L),
      (2L, "srcC", 2L, 5L),
      (3L, "srcB", 0L, 5L)))
    graft.operators.OperatorCaches.release()
    graft.operators.FramePool.release()
  }

  test("water-filling finds the exact integer level and caps only above it") {
    // volumes 10/20/70, budget 90% of 100 = 90: the level is 60 — the
    // two small sources are kept whole, the big one is capped, and the
    // allocation exhausts the budget exactly
    val tok = Seq(("a", 10L), ("b", 20L), ("c", 70L))
      .toDF("source", "tokens")
    val got = Mixture.waterfill(tok)
      .as[(String, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got === Seq(
      ("a", 10L, 10L, 10000L),
      ("b", 20L, 20L, 10000L),
      ("c", 70L, 60L, 8571L)))
    assert(got.map(_._3).sum === 90L)
  }
}
