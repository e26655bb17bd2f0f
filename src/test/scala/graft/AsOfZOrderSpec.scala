package graft

import org.apache.spark.sql.functions._

import graft.functions.ZOrder
import graft.operators.AsOf
import graft.plans.GraftFunctions

/** merge_asof semantics (direction × tolerance × misses), the native
  * Unicode normalizer, and the z-order clustering property the q128 key
  * exists for. */
class AsOfZOrderSpec extends SparkSpec {

  import spark.implicits._

  private def l = Seq(
    (1L, 100L, "p1"), (1L, 205L, "p2"), (2L, 50L, "p3"), (3L, 10L, "p4")
  ).toDF("k", "t", "pid")
  private def r = Seq(
    (1L, 90L, "c1"), (1L, 100L, "c2"), (1L, 210L, "c3"), (2L, 400L, "c4")
  ).toDF("k", "t", "rid")

  test("asofJoin backward: latest right at-or-before, tolerance nulls stale matches") {
    val out = AsOf.asofJoin(l, r, "k", "t", "backward", tolerance = Some(50L))
      .select("pid", "asof_rid", "asof_t").as[(String, Option[String], Option[Long])]
      .collect().map { case (p, rid, t) => p -> ((rid, t)) }.toMap
    assert(out("p1") === ((Some("c2"), Some(100L)))) // equal ts matches
    assert(out("p2") === ((None, None)))             // c2 at 100 is 105 > 50 stale
    assert(out("p3") === ((None, None)))             // only future right rows
    assert(out("p4") === ((None, None)))             // key absent on right
  }

  test("asofJoin forward: earliest right at-or-after, within tolerance") {
    val out = AsOf.asofJoin(l, r, "k", "t", "forward", tolerance = Some(10L))
      .select("pid", "asof_rid").as[(String, Option[String])].collect().toMap
    assert(out("p1") === Some("c2"))  // itself-at-100 (equal allowed)
    assert(out("p2") === Some("c3"))  // 210 − 205 = 5 ≤ 10
    assert(out("p3") === None)        // 400 − 50 well past tolerance
    assert(out("p4") === None)
  }

  test("asofJoin without tolerance keeps every left row (left-outer contract)") {
    val out = AsOf.asofJoin(l, r, "k", "t", "backward")
    assert(out.count() === l.count())
    assert(out.filter(col("pid") === "p3" && col("asof_rid").isNull).count() === 1)
  }

  test("unicode normalize: NFC composes, NFD decomposes, ASCII passes through") {
    GraftFunctions.ensureRegistered(spark)
    val df = Seq(
      ("decomposed", "Cafe\u0301"),   // e + COMBINING ACUTE
      ("composed", "Caf\u00e9"),     // precomposed
      ("ascii", "Cafe")
    ).toDF("kind", "s")
      .select(col("kind"),
        GraftFunctions.unicodeNormalizeNative(col("s"), "NFC").as("nfc"),
        GraftFunctions.unicodeNormalizeNative(col("s"), "NFD").as("nfd"),
        length(col("s")).as("raw_len"))
    val m = df.collect().map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(m("decomposed")._1 === "Caf\u00e9") // NFC fuses e + U+0301
    assert(m("composed")._2 === "Cafe\u0301")  // NFD splits it back
    assert(m("ascii") === (("Cafe", "Cafe")))
    // null flows through the unary null contract
    val n = Seq(Option.empty[String]).toDF("s")
      .select(GraftFunctions.unicodeNormalizeNative(col("s"), "NFC")).head()
    assert(n.isNullAt(0))
  }

  test("unicode normalize rejects a non-literal or unknown form at analysis") {
    GraftFunctions.ensureRegistered(spark)
    val df = Seq("x").toDF("s")
    val e = intercept[Exception] {
      df.select(call_function("graft_unicode_normalize", col("s"), lit("NFX")))
        .collect()
    }
    assert(e.getMessage.contains("unknown form") || e.getCause != null)
  }

  test("z-order sorted files are compact blocks in BOTH dimensions") {
    val tmp = java.nio.file.Files.createTempDirectory("zorderspec").toString
    // 64×64 grid; z-sort into 16 files → each file ≈ a 16×16 block
    val grid = spark.range(64L * 64)
      .select((col("id") % 64).as("x"), expr("id DIV 64").as("y"))
      .withColumn("z", ZOrder.zorder16(col("x"), col("y")))
    graft.operators.Layout.sortedWrite(grid, s"$tmp/z", "z", numFiles = 16)
    val files = new java.io.File(s"$tmp/z").listFiles()
      .filter(_.getName.startsWith("part-")).map(_.getPath)
    assert(files.length >= 8)
    val spans = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("x"), max("x"), min("y"), max("y")).head()
      (r.getLong(1) - r.getLong(0), r.getLong(3) - r.getLong(2))
    }
    // every file's span in EACH dimension is far below the global 63 —
    // the property single-column sorting cannot give (y would span ~63)
    assert(spans.forall { case (sx, sy) => sx <= 31 && sy <= 31 },
      s"z-order blocks too wide: ${spans.mkString(", ")}")
    // sanity: nothing lost
    assert(spark.read.parquet(s"$tmp/z").count() === 64L * 64)
  }
}
