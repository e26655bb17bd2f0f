package graft

import java.time.{Instant, ZoneId}

import org.apache.spark.sql.functions._

import graft.plans.FastTimestampFormat

/** Exactness proof for the CSV timestamp fast path: the integer-math
  * formatter must be byte-identical to the DateTimeFormatter reference
  * (the same pattern Spark's univocity writer runs) for every instant the
  * sink can see — leap rules, century non-leaps, DST transitions,
  * pre-epoch values — and the whole sink must produce the same CSV bytes
  * it produced before the rewrite. */
class CsvTimestampSpec extends SparkSpec {

  import spark.implicits._

  private val zones = Seq("UTC", "America/New_York", "Asia/Kolkata",
    "Australia/Lord_Howe", "Pacific/Kiritimati").map(ZoneId.of)

  private val edges: Seq[Long] = Seq(
    0L, -1L, 1L,                                   // epoch sign change
    951827696000000L,                              // 2000-02-29 (400y leap)
    -2208988800000000L,                            // 1900-01-01 (century non-leap)
    4107542399999999L,                             // 2100-02-28 23:59:59.999999
    1678069800000000L, 1678066200000000L,          // US DST spring-forward edge
    1699167600000000L,                             // US DST fall-back hour
    -6857222400000000L,                            // 1752-09-14 (proleptic)
    253402300799999999L,                           // 9999-12-31 23:59:59.999999
    253402300800000000L,                           // year 10000 → fallback
    -62135596800000000L,                           // 0001-01-01 (fast-path floor)
    -62135596800000001L)                           // year 0 → fallback

  test("fast formatter is byte-identical to the DateTimeFormatter reference") {
    val rng = new scala.util.Random(7)
    // ±~3000 years of random micros around the epoch, plus the edges
    val micros = edges ++ Seq.fill(20000)(
      (rng.nextLong() % 94670856000000000L))
    for (z <- zones) {
      val ref = FastTimestampFormat.reference(z)
      micros.foreach { us =>
        val secs = Math.floorDiv(us, 1000000L)
        val nanos = Math.floorMod(us, 1000000L) * 1000L
        val expected = ref.format(Instant.ofEpochSecond(secs, nanos))
        val got = FastTimestampFormat.format(us, z).toString
        assert(got === expected, s"micros=$us zone=$z")
      }
    }
  }

  test("NTZ formatter matches the reference wall-clock rendering") {
    val rng = new scala.util.Random(11)
    val micros = edges ++ Seq.fill(5000)(rng.nextLong() % 94670856000000000L)
    val ref = FastTimestampFormat.reference(ZoneId.of("UTC"))
    micros.foreach { us =>
      val secs = Math.floorDiv(us, 1000000L)
      val nanos = Math.floorMod(us, 1000000L) * 1000L
      assert(FastTimestampFormat.formatNtz(us).toString
        === ref.format(Instant.ofEpochSecond(secs, nanos)), s"micros=$us")
    }
  }

  test("NTZ timestamps round-trip the CSV sink at microsecond precision") {
    val tmp = java.nio.file.Files.createTempDirectory("csvts").toString
    val df = Seq((1L, "1995-03-09 12:34:56.123456"),
      (2L, "1992-01-01 00:00:00.000001"))
      .toDF("id", "ts")
      .withColumn("ts", expr("CAST(ts AS TIMESTAMP_NTZ)"))
    graft.operators.Convert.toCsvDir(df, s"$tmp/csv")
    // the sink's pinned format applies to NTZ too (the writer default —
    // ISO-'T', millis — would truncate micros)
    val back = spark.read.option("header", "true")
      .schema("id LONG, ts TIMESTAMP_NTZ")
      .option("timestampNTZFormat", graft.operators.Convert.TimestampFormat)
      .csv(s"$tmp/csv")
    assert(back.orderBy("id").select(col("ts").cast("string"))
      .as[String].collect().toSeq
      === Seq("1995-03-09 12:34:56.123456", "1992-01-01 00:00:00.000001"))
  }

  test("the rewritten CSV sink writes the same bytes as the formatter option path") {
    val tmp = java.nio.file.Files.createTempDirectory("csvts").toString
    val df = Seq(
      (1L, Some("1994-07-15 03:04:05.000006"), "a"),
      (2L, Some("1998-12-31 23:59:59.999999"), "b,with comma"),
      (3L, None, "c"))
      .toDF("id", "ts", "s")
      .withColumn("ts", col("ts").cast("timestamp"))
    // option path: Spark's own formatter, no rewrite (both sides one
    // part file so the header count matches)
    df.coalesce(1).write.option("header", "true")
      .option("timestampFormat", graft.operators.Convert.TimestampFormat)
      .option("nullValue", graft.operators.Convert.NullValue)
      .option("emptyValue", graft.operators.Convert.EmptyValue)
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .mode("overwrite").csv(s"$tmp/ref")
    graft.operators.Convert.toCsvDir(df.coalesce(1), s"$tmp/fast")
    def lines(dir: String): Seq[String] = {
      val d = new java.io.File(dir)
      d.listFiles.filter(_.getName.startsWith("part-")).toSeq
        .flatMap(f => scala.io.Source.fromFile(f).getLines().toList)
        .sorted
    }
    assert(lines(s"$tmp/fast") === lines(s"$tmp/ref"))
  }

  test("round-trip through the rewritten sink preserves microsecond timestamps") {
    val tmp = java.nio.file.Files.createTempDirectory("csvts").toString
    val df = Seq((1L, "1995-03-09 12:34:56.123456"), (2L, "1992-01-01 00:00:00.000001"))
      .toDF("id", "ts").withColumn("ts", col("ts").cast("timestamp"))
    graft.operators.Convert.toCsvDir(df, s"$tmp/csv")
    val back = spark.read.option("header", "true")
      .schema("id LONG, ts TIMESTAMP")
      .option("timestampFormat", graft.operators.Convert.TimestampFormat)
      .csv(s"$tmp/csv")
    assert(back.orderBy("id").as[(Long, java.sql.Timestamp)].collect().toSeq
      === df.orderBy("id").as[(Long, java.sql.Timestamp)].collect().toSeq)
  }
}
