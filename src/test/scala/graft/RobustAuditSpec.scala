package graft

import java.nio.file.Files

import graft.operators.{FramePool, OperatorCaches}

/** Planted-semantics checks for the round-10 audit queries.
  *
  * q208: the lower-median rank rule (rank ⌊(n−1)/2⌋+1) on both the
  * per-group median and its MAD, and the 3·1.4826·MAD robust fence.
  *
  * q209: the first-significant-digit LADDER — specifically the exact
  * power-of-ten boundaries where a floor(log10(x)) formulation is one
  * ulp from flipping the bracket (1000.0 must read digit 1, 999.99
  * digit 9). */
class RobustAuditSpec extends SparkSpec {

  private def plantLineitem(rows: Seq[(Long, Double)]): String = {
    val tmp = Files.createTempDirectory("robustauditspec").toString
    import spark.implicits._
    rows.toDF("l_suppkey", "l_extendedprice")
      .write.parquet(s"$tmp/lineitem.parquet")
    tmp
  }

  test("q208: lower medians, MAD, and the robust fence, per group") {
    // supplier 1: x = [1,2,3,4,100], n=5 → median rank 3 → med=3;
    //   devs sorted [0,1,1,2,97] → mad rank 3 → 1; fence 3·1.4826·1 =
    //   4.4478 → only dev=97 clears it → 1 outlier
    // supplier 2: x = [10,20,30,40], n=4 → rank ⌊3/2⌋+1 = 2 → med=20
    //   (the LOWER middle, not interpolated 25); devs sorted
    //   [0,10,10,20] → mad=10; fence 44.478 → 0 outliers
    val dir = plantLineitem(Seq(
      (1L, 1.0), (1L, 2.0), (1L, 3.0), (1L, 4.0), (1L, 100.0),
      (2L, 10.0), (2L, 20.0), (2L, 30.0), (2L, 40.0)))
    try {
      val got = SparkEntry.queries("q208_grouped_mad")(spark, dir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getLong(4)))
      assert(got.toSeq === Seq(
        (1L, 5L, 3.0, 1.0, 1L),
        (2L, 4L, 20.0, 10.0, 0L)))
    } finally {
      OperatorCaches.release()
      FramePool.release()
    }
  }

  test("q209: digit ladder survives exact power-of-ten boundaries") {
    // 1000.0 and 1e7 sit ON ladder rungs → digit 1; 999.99 and
    // 9999999.99 sit just under → digit 9; 0.5 is filtered (< 1.0)
    val dir = plantLineitem(Seq(
      (1L, 1000.0), (1L, 999.99), (1L, 1.0),
      (1L, 9999999.99), (1L, 1.0e7), (1L, 0.5)))
    try {
      val got = SparkEntry.queries("q209_benford_audit")(spark, dir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(got.toSeq === Seq((1L, 3L, 0.6), (9L, 2L, 0.4)))
    } finally {
      OperatorCaches.release()
      FramePool.release()
    }
  }
}
