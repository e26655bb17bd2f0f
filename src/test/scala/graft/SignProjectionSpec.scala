package graft

import graft.operators.SignProjection

class SignProjectionSpec extends SparkSpec {
  import spark.implicits._

  test("signMatrix pins the md5-parity derivation (hand-computed cells)") {
    // md5("0_0")=5d..., md5("0_1")=1e..., md5("1_0")=7d..., md5("1_1")=e5...
    // first hex digits 5,1,7,e → parities odd,odd,odd,even → −1,−1,−1,+1
    val got = SignProjection.signMatrix(spark, dim = 2, k = 2)
      .orderBy("pos", "j").as[(Int, Long, Long)].collect().toSeq
    assert(got === Seq(
      (0, 0L, -1L), (0, 1L, -1L), (1, 0L, -1L), (1, 1L, 1L)))
  }

  test("project is exact and linear on the quantized grid") {
    // with the pinned 2×2 signs: y(v)_0 = −q0 − q1, y(v)_1 = −q0 + q1.
    // v1=(0.1, 0.3) → q=(1e5, 3e5) → y=(−4e5, 2e5); v2 = 2·v1 doubles y.
    val vs = Seq((1L, Seq(0.1, 0.3)), (2L, Seq(0.2, 0.6)))
      .toDF("vec_id", "v")
    val got = SignProjection.project(vs, "vec_id", "v", k = 2)
      .orderBy("vec_id", "j").as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 0L, -400000L), (1L, 1L, 200000L),
      (2L, 0L, -800000L), (2L, 1L, 400000L)))
    graft.operators.OperatorCaches.release()
  }

  test("project rejects an empty corpus loudly") {
    val empty = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "v")
    val e = intercept[IllegalArgumentException] {
      SignProjection.project(empty, "vec_id", "v", k = 4)
    }
    assert(e.getMessage.contains("empty vector corpus"))
    graft.operators.OperatorCaches.release()
  }
}
