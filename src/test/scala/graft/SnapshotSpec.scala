package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Snapshots

/** Snapshot operators on hand-checked inputs: upsert precedence, SCD2
  * interval construction, and diff status assignment incl. null-safe
  * comparison. */
class SnapshotSpec extends SparkSpec {

  import spark.implicits._

  test("upsert: updates win on collision, unmatched rows survive/insert") {
    val base = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
    val updates = Seq((2, "B"), (4, "D")).toDF("k", "v")
    val out = Snapshots.upsert(base, updates, Seq("k"))
      .orderBy("k").as[(Int, String)].collect()
    assert(out.toSeq === Seq((1, "a"), (2, "B"), (3, "c"), (4, "D")))
  }

  test("scd2 builds change intervals closed by the next change") {
    def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)
    val events = Seq(
      (10L, "view", ts(0), 1L),
      (10L, "view", ts(5), 2L),   // no change — absorbed
      (10L, "click", ts(9), 3L),  // change
      (10L, "view", ts(20), 4L),  // change back
      (20L, "error", ts(1), 5L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val out = Snapshots.scd2(events, "user_id", "event_type", "ts", "event_id")
      .orderBy("user_id", "valid_from")
      .as[(Long, String, Timestamp, Option[Timestamp])].collect()
    assert(out.toSeq === Seq(
      (10L, "view", ts(0), Some(ts(9))),
      (10L, "click", ts(9), Some(ts(20))),
      (10L, "view", ts(20), None),
      (20L, "error", ts(1), None)))
  }

  test("scd2 opens intervals for transitions into null and not for null runs") {
    def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)
    val events = Seq(
      (1L, Some("a"), ts(0), 1L),
      (1L, None, ts(10), 2L),      // change INTO null
      (1L, None, ts(15), 3L),      // null run — no change
      (1L, Some("a"), ts(20), 4L), // change back
      (2L, Option.empty[String], ts(0), 5L)) // first row with null attr
      .toDF("user_id", "event_type", "ts", "event_id")
    val out = Snapshots.scd2(events, "user_id", "event_type", "ts", "event_id")
      .orderBy("user_id", "valid_from")
      .as[(Long, Option[String], Timestamp, Option[Timestamp])].collect()
    assert(out.toSeq === Seq(
      (1L, Some("a"), ts(0), Some(ts(10))),
      (1L, None, ts(10), Some(ts(20))),
      (1L, Some("a"), ts(20), None),
      (2L, None, ts(0), None)))
  }

  test("diff treats null-keyed rows as present on their side") {
    val prev = Seq((Option(1), "x"), (Option.empty[Int], "y")).toDF("k", "v")
    val next = Seq((Option(1), "x")).toDF("k", "v")
    val out = Snapshots.diff(prev, next, Seq("k"), Seq("v"))
      .orderBy(asc_nulls_first("k"))
      .as[(Option[Int], String)].collect()
    // the null-keyed row exists only in prev → removed (not 'added')
    assert(out.toSeq === Seq((None, "removed"), (Some(1), "unchanged")))
  }

  test("diff assigns added/removed/changed/unchanged with null-safe compare") {
    val prev = Seq((1, Some(1.0)), (2, Some(2.0)), (3, None), (4, Some(4.0)))
      .toDF("k", "price")
    val next = Seq((1, Some(1.0)), (2, Some(9.0)), (3, None), (5, Some(5.0)))
      .toDF("k", "price")
    val out = Snapshots.diff(prev, next, Seq("k"), Seq("price"))
      .orderBy("k").as[(Int, String)].collect()
    assert(out.toSeq === Seq(
      (1, "unchanged"), (2, "changed"), (3, "unchanged"), // null <=> null
      (4, "removed"), (5, "added")))
  }
}
