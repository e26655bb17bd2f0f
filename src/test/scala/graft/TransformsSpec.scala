package graft

import org.apache.spark.sql.functions._

import graft.operators.Transforms

/** P2/P3, O1/O2, A1 transforms (SURVEY.md §2.3–2.5). */
class TransformsSpec extends SparkSpec {

  import spark.implicits._

  test("filterSuffix keeps only matching rows (P2)") {
    val df = Seq("a.parquet", "b.csv", "c.parquet").toDF("f")
    assert(Transforms.filterSuffix(df, "f", ".parquet").as[String].collect().sorted
      === Array("a.parquet", "c.parquet"))
  }

  test("stem splits at the FIRST dot, like the reference (P3)") {
    val df = Seq("name.v2.parquet").toDF("f")
      .select(Transforms.stem(col("f")).as("s"))
    assert(df.as[String].head() === "name")
  }

  test("sampleExactN returns exactly n rows, deterministic per seed (O2)") {
    val src = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def draw(seed: Long) = Transforms.sampleExactN(src, 100, seed)
      .collect().map(_.toSeq).sortBy(_.toString)
    val s1 = draw(7L); val s2 = draw(7L); val s3 = draw(8L)
    assert(s1.length === 100)
    assert(s1 === s2)
    assert(s1 !== s3) // overwhelmingly likely for distinct seeds
  }

  test("sampleExactN is stable under partition-count changes (the rand() " +
    "per-partition-seed trap the md5 rank exists to avoid)") {
    val src = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def draw(df: org.apache.spark.sql.DataFrame) =
      Transforms.sampleExactN(df, 100, 721L)
        .collect().map(_.toSeq).sortBy(_.toString)
    val base = draw(src)
    // same seed, same data, DIFFERENT physical layout → identical sample
    assert(draw(src.repartition(3)) === base)
    assert(draw(src.repartition(17)) === base)
    assert(draw(src.coalesce(1)) === base)
  }

  test("sampleExactN with n > count returns all rows") {
    val df = Seq(1, 2, 3).toDF("x")
    assert(Transforms.sampleExactN(df, 10, 1L).count() === 3)
  }

  test("hashSample is deterministic, nested across pct, and order-stable") {
    val src = spark.read.parquet(s"$sfDir/documents.parquet")
    def ids(pct: Int) = Transforms.hashSample(src, col("doc_id"), lit(pct))
      .select("doc_id").as[Long].collect().toSet
    val p10a = ids(10); val p10b = ids(10); val p30 = ids(30)
    assert(p10a === p10b)                       // reproducible
    assert(p10a.subsetOf(p30))                  // nested: more pct only adds
    assert(p30.size > p10a.size)
    // order-stable: shuffling input rows yields the same membership
    val shuffled = Transforms.hashSample(
      src.orderBy(rand(3L)), col("doc_id"), lit(10))
      .select("doc_id").as[Long].collect().toSet
    assert(shuffled === p10a)
  }

  test("hashTopK draws a fixed-SIZE deterministic sample, order-stable") {
    val src = spark.read.parquet(s"$sfDir/documents.parquet")
    def ids(df: org.apache.spark.sql.DataFrame, k: Int) =
      Transforms.hashTopK(df, col("doc_id"), k)
        .select("doc_id").as[Long].collect().toSet
    val a = ids(src, 100)
    assert(a.size === 100)                       // exactly k
    assert(ids(src, 100) === a)                  // reproducible
    assert(ids(src.orderBy(rand(7L)), 100) === a) // reorder-stable
    // the k rows ARE the k smallest md5 ranks (the DuckDB-twin contract)
    val want = src.select(col("doc_id"),
        graft.functions.TextFunctions.md5Long(col("doc_id").cast("string"))
          .as("h"))
      .as[(Long, Long)].collect().sortBy { case (id, h) => (h, id) }
      .take(100).map(_._1).toSet
    assert(a === want)
    // k > corpus: the whole corpus, no failure
    assert(ids(src.limit(40), 100).size === 40)
  }

  test("pivotWide produces one row per index, one column per key (A1)") {
    val long = Seq(
      ("duckdb", 100L, 1.7), ("polars", 100L, 1.2),
      ("duckdb", 1000L, 2.0), ("polars", 1000L, 1.5))
      .toDF("method", "size", "time")
    val wide = Transforms.pivotWide(long, "size", "method", "time",
      values = Seq("duckdb", "polars")).orderBy("size")
    assert(wide.columns.toSeq === Seq("size", "duckdb", "polars"))
    val rows = wide.collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(100L, 1000L))
    assert(rows(0).getDouble(1) === 1.7)
    assert(rows(1).getDouble(2) === 1.5)
  }

  test("mixtureBalanceSample levels categories toward the smallest, deterministically") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val out = graft.operators.Transforms
      .mixtureBalanceSample(docs, "source", "doc_id")
    val orig = docs.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = out.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val minN = orig.values.min
    kept.foreach { case (s0, k) =>
      assert(k <= orig(s0), s"$s0 grew")
      // hash thinning is binomial around minN; small strata wobble, but
      // nothing should exceed ~3x the target or collapse entirely
      assert(k <= 3 * minN, s"$s0 kept $k vs target ~$minN")
    }
    // pure function of the key: a rerun is bit-identical
    val again = graft.operators.Transforms
      .mixtureBalanceSample(docs, "source", "doc_id")
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again === kept)
  }
}
