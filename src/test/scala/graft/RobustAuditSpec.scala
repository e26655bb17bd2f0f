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

  test("q215: trailing-24h base, strict 3x threshold, empty-window null") {
    // type "e": hours 0..23 get 1 event each; hour 24 gets 3 (rate is
    // EXACTLY 3x the trailing mean -> 24*3 > 3*24 is false, no burst);
    // hour 25 gets 4 (base = hours 1..24 = 23 + 3 = 26; 96 > 78, burst)
    val tmp = Files.createTempDirectory("burstspec").toString
    import spark.implicits._
    val evs =
      (0 until 24).map(h => (java.sql.Timestamp.valueOf(
        f"2024-03-01 ${h}%02d:15:00"), "e")) ++
        Seq.fill(3)((java.sql.Timestamp.valueOf("2024-03-02 00:30:00"), "e")) ++
        Seq.fill(4)((java.sql.Timestamp.valueOf("2024-03-02 01:30:00"), "e"))
    evs.toDF("ts", "event_type").write.parquet(s"$tmp/events.parquet")
    val got = SparkEntry.queries("q215_burst_detection")(spark, tmp)
      .collect()
      .map(r => (r.getTimestamp(1).toString, r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) Double.NaN else r.getDouble(4), r.getBoolean(5)))
    assert(got.length === 26)
    val first = got.head
    assert(first._2 === 1L && first._3 === 0L
      && first._4.isNaN && !first._5) // empty trailing window
    val h24 = got(24)
    assert(h24 === (("2024-03-02 00:00:00.0", 3L, 24L, 3.0, false)))
    val h25 = got(25)
    assert(h25 === (("2024-03-02 01:00:00.0", 4L, 26L, 96.0 / 26, true)))
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
