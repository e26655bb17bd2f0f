package graft

import java.nio.file.Files
import java.time.LocalDateTime

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.queries.Q

/** Fixture-drift guard: the driver has regenerated the events fixture with a
  * different parquet `ts` physical type more than once (TIMESTAMP(NANOS) →
  * TIMESTAMP(MICROS, NTZ)). `Q.events` must resolve every variant to a
  * microsecond session-zoned TimestampType with identical wall-clock values,
  * or 15 queries silently fall over at analysis time. Each test writes a tiny
  * events.parquet in the target dtype and asserts the adaptive read. */
class EventsFixtureSpec extends SparkSpec {

  // 2024-01-02T03:04:05.123456 UTC
  private val wallClock = LocalDateTime.of(2024, 1, 2, 3, 4, 5, 123456000)
  private val epochMicros = 1704164645123456L

  private def assertNormalized(dir: String): Unit = {
    val df = Q.events(spark, dir)
    assert(df.schema("ts").dataType === TimestampType)
    val v = df.select(unix_micros(col("ts"))).head().getLong(0)
    assert(v === epochMicros)
  }

  test("long ts (nanos-as-long path) floor-truncates to microsecond timestamp") {
    val tmp = Files.createTempDirectory("eventsfix").toString
    // A TIMESTAMP(NANOS) parquet read under nanosAsLong=true resolves to
    // LongType; writing LongType directly exercises the same branch.
    import spark.implicits._
    Seq((epochMicros * 1000L + 789L, "click"))
      .toDF("ts", "event_type")
      .write.parquet(s"$tmp/events.parquet")
    assertNormalized(tmp)
  }

  test("TIMESTAMP(MICROS, NTZ) ts casts to session-zoned timestamp unchanged") {
    val tmp = Files.createTempDirectory("eventsfix").toString
    import spark.implicits._
    Seq((wallClock, "click")).toDF("ts", "event_type")
      .write.parquet(s"$tmp/events.parquet")
    val written = spark.read.parquet(s"$tmp/events.parquet")
    assert(written.schema("ts").dataType === TimestampNTZType) // fixture shape
    assertNormalized(tmp)
  }

  test("plain TimestampType ts passes through untouched") {
    val tmp = Files.createTempDirectory("eventsfix").toString
    import spark.implicits._
    Seq((java.sql.Timestamp.from(
        wallClock.atZone(java.time.ZoneOffset.UTC).toInstant), "click"))
      .toDF("ts", "event_type")
      .write.parquet(s"$tmp/events.parquet")
    assertNormalized(tmp)
  }
}
