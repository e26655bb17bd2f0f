package graft

import org.apache.spark.sql.functions._

import graft.operators.{InvertedIndex, OperatorCaches}

/** Sparse TF-IDF retrieval: the properties the oracle hash can't state —
  * near-identical documents score ≈ 1, disjoint documents never pair,
  * and the hot-block cap bounds candidates. */
class InvertedIndexSpec extends SparkSpec {

  import spark.implicits._

  test("near-identical twins pair with cosine ≈ 1; disjoint docs never pair") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),      // exact twin of 1
      (3L, "alpha beta gamma epsilon"),    // near twin
      (4L, "zeta eta theta iota")          // disjoint vocabulary
    ).toDF("doc_id", "text")
    val pairs = InvertedIndex.sparseCosinePairs(docs, "doc_id", "text", minCos = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) > 0.999)
    // doc 4 shares no term with anyone — no candidate can even form
    assert(!pairs.keys.exists { case (a, b) => a == 4L || b == 4L })
    OperatorCaches.release()
  }

  test("blockCap bounds pairs from a hot block") {
    // 10 docs all sharing the same single (hence rarest) term
    val docs = (1L to 10L).map(i => (i, "common")).toDF("doc_id", "text")
    val n = InvertedIndex.sparseCosinePairs(docs, "doc_id", "text",
      minCos = 0.0, blockCap = 4).count()
    assert(n === 6) // C(4,2), the first 4 docs by id — never C(10,2)=45
    OperatorCaches.release()
  }
}
