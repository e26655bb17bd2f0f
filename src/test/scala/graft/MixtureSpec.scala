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

  test("k-center picks the planted farthest-first trajectory with exact ties") {
    // quantized geometry: seed = min id (1); ids 3 and 4 are both at
    // squared distance 1e12 from it — the tie breaks to id ASC (3); the
    // near-twin 2 (d²=1e10) is never picked
    val vs = Seq(
      (1L, Seq(0.0, 0.0)), (2L, Seq(0.1, 0.0)),
      (3L, Seq(1.0, 0.0)), (4L, Seq(0.0, 1.0)))
      .toDF("vec_id", "v")
    val got = Mixture.kCenters(vs, "vec_id", "v", k = 3)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got === Seq(
      (1L, 1L, 0L),
      (2L, 3L, 1000000000000L),
      (3L, 4L, 1000000000000L)))
    // k beyond the corpus size stops at the corpus size (the oracle's
    // empty CTEs return the same fewer rows) instead of throwing
    assert(Mixture.kCenters(vs, "vec_id", "v", k = 9).count() === 4L)
    graft.operators.OperatorCaches.release()
  }

  test("nearest-center assignment breaks exact ties to the smaller center id") {
    val vs = Seq(
      (1L, Seq(0.0, 0.0)), (2L, Seq(1.0, 0.0)),
      (3L, Seq(0.4, 0.0)),                       // strictly nearer 1
      (4L, Seq(0.5, 0.0)))                       // exactly equidistant
      .toDF("vec_id", "v")
    val centers = Seq(1L, 2L).toDF("c_id")
    val got = Mixture.assignToCenters(vs, "vec_id", "v", centers)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got === Seq(
      (1L, 1L, 0L),
      (2L, 2L, 0L),
      (3L, 1L, 160000000000L),
      (4L, 1L, 250000000000L)))
  }

  test("stratified sample allocates by largest remainder and fills by hash rank") {
    // weights 55/28/17 at n=10: floors 5/2/1 leave 2 seats; remainders
    // 50/80/70 give them to b then c — quotas 5/3/2
    val docs = (1 to 60).map { i =>
      val src = if (i <= 30) "a" else if (i <= 50) "b" else "c"
      (i.toLong, src)
    }.toDF("doc_id", "source")
    val w = Seq(("a", 55L), ("b", 28L), ("c", 17L)).toDF("source", "w")
    val got = Mixture.stratifiedSample(docs, "doc_id", "source", w, n = 10L)
    val counts = got.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(counts === Map("a" -> 5L, "b" -> 3L, "c" -> 2L))
    // quota column rides every selected row; selection is deterministic
    assert(got.select("quota_s").distinct().as[Long].collect().toSet
      === Set(5L, 3L, 2L))
    val again = Mixture.stratifiedSample(docs, "doc_id", "source", w, n = 10L)
      .select("doc_id").as[Long].collect().toSet
    assert(again === got.select("doc_id").as[Long].collect().toSet)
  }

  test("id-type contract is loud: string ids fail at entry, int ids work") {
    // a string id would previously surface as an opaque
    // ClassCastException mid-round; the longId guard names the column
    val sv = Seq(("a", Seq(0.0, 0.0)), ("b", Seq(1.0, 0.0)))
      .toDF("vec_id", "v")
    val e1 = intercept[IllegalArgumentException] {
      Mixture.kCenters(sv, "vec_id", "v", k = 2)
    }
    assert(e1.getMessage.contains("integral"))
    val iv = Seq((1, Seq(0.0, 0.0)), (2, Seq(1.0, 0.0)))
      .toDF("vec_id", "v") // IntegerType ids read generically now
    assert(Mixture.kCenters(iv, "vec_id", "v", k = 2).count() === 2L)
    val e2 = intercept[IllegalArgumentException] {
      Mixture.assignToCenters(iv, "vec_id", "v",
        Seq("x").toDF("c_id"))
    }
    assert(e2.getMessage.contains("integral"))
    assert(Mixture.assignToCenters(iv, "vec_id", "v", Seq(1).toDF("c_id"))
      .count() === 2L)
    graft.operators.OperatorCaches.release()
  }

  test("unit-scale quantization bound is loud, not prose") {
    // |component| 3.0 quantizes to 3e6 > the 2e6 bound — squared sums
    // could overflow long, so kCenters must refuse
    val big = Seq((1L, Seq(3.0, 0.0)), (2L, Seq(0.0, 0.5)))
      .toDF("vec_id", "v")
    val e = intercept[IllegalArgumentException] {
      Mixture.kCenters(big, "vec_id", "v", k = 2)
    }
    assert(e.getMessage.contains("unit-scale"))
    graft.operators.OperatorCaches.release()
  }

  test("stratified sample refuses non-positive weights loudly") {
    val docs = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "source")
    val w = Seq(("a", 5L), ("b", 0L)).toDF("source", "w")
    val e = intercept[IllegalArgumentException] {
      Mixture.stratifiedSample(docs, "doc_id", "source", w, n = 1L)
    }
    assert(e.getMessage.contains("non-positive"))
  }

  test("water-filling: zero-token sources get a TOTAL kept_bp, negatives refuse") {
    // a zero-volume source previously rode through with NULL kept_bp
    val tok = Seq(("a", 0L), ("b", 20L), ("c", 70L)).toDF("source", "tokens")
    val got = Mixture.waterfill(tok)
      .as[(String, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    // budget = 90·9 DIV 10 = 81; level 61: b kept whole, c capped at 61
    assert(got.head === (("a", 0L, 0L, 10000L))) // vacuously kept whole
    assert(got.map(_._3).sum === 81L)
    val e = intercept[IllegalArgumentException] {
      Mixture.waterfill(Seq(("a", -1L)).toDF("source", "tokens")).collect()
    }
    assert(e.getMessage.contains("negative"))
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

  test("sourceCap ranks best-first within each source, ties to id ASC") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "a", 50L), (2L, "a", 90L), (3L, "a", 90L), (4L, "a", 10L),
      (5L, "b", 7L))
      .toDF("doc_id", "source", "q")
    val got = Mixture.sourceCap(docs, "source", "doc_id", col("q"), 2)
      .as[(String, Long, Long, Long)].collect().toSeq
      .sortBy(r => (r._1, r._4))
    // source a: quality 90 (id 2), 90 (id 3 — tie broken by id), 50, 10
    assert(got === Seq(
      ("a", 2L, 90L, 1L), ("a", 3L, 90L, 2L),
      ("a", 1L, 50L, 3L), ("a", 4L, 10L, 4L),
      ("b", 5L, 7L, 1L)))
    // survivors at cap=2: ids 2,3 from a; 5 from b
    assert(got.filter(_._4 <= 2).map(_._2).sorted === Seq(2L, 3L, 5L))
    val e = intercept[IllegalArgumentException] {
      Mixture.sourceCap(docs, "source", "doc_id", col("q"), 0)
    }
    assert(e.getMessage.contains("cap must be >= 1"))
  }
}
