package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Row

/** Planted-semantics checks for q205's RFM scoring rule: quintile
  * thresholds are the values at ranks ⌊n·k/5⌋ (k=1..4, min rank 1) of
  * each axis's sorted per-user metrics, and a user's score is
  * 1 + (# thresholds STRICTLY below the metric) — the strictly-greater
  * rule is what makes tied metrics score deterministically in both
  * engines (an ntile() window would split ties by partition order). */
class RfmSpec extends SparkSpec {

  private def q205(dir: String): Array[Row] =
    SparkEntry.queries("q205_rfm_segments")(spark, dir)
      .collect()

  private def plant(rows: Seq[(Timestamp, Long, Double)]): String = {
    val tmp = Files.createTempDirectory("rfmspec").toString
    import spark.implicits._
    rows.toDF("ts", "user_id", "value")
      .write.parquet(s"$tmp/events.parquet")
    tmp
  }

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("monotone metrics land each user pair in its exact quintile cell") {
    // user i (1..10) has i events of value 1.00, last at minute i →
    // f_cnt = i, m_cents = 100·i, r_us strictly increasing with i: all
    // three axes sort users identically. Thresholds = values at ranks
    // {2,4,6,8}; strictly-greater scoring puts users {1,2}→1, {3,4}→2,
    // {5,6}→3, {7,8}→4, {9,10}→5 on every axis.
    val rows = for {
      i <- 1 to 10; j <- 1 to i
    } yield (ts(if (j == i) i else 0), i.toLong, 1.0d)
    val got = q205(plant(rows))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val want = (1 to 5).map { k =>
      val users = Seq(2L * k - 1, 2L * k) // the two users in quintile k
      (k.toLong, k.toLong, k.toLong, 2L, users.map(_ * 100L).sum)
    }
    assert(got.toSeq === want)
  }

  test("fully tied metrics collapse to one deterministic (1,1,1) segment") {
    // every user identical → all four thresholds equal the common value;
    // metric > threshold is false under ties, so every score is 1
    val rows = (1 to 10).map(i => (ts(5), i.toLong, 2.5d))
    val got = q205(plant(rows))
    assert(got.length === 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((1L, 1L, 1L)))
    assert(r.getLong(3) === 10L)
    assert(r.getLong(4) === 10L * 250L)
  }
}
