package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.TextFunctions
import graft.plans.GraftFunctions

/** Native SimHash / MinHash kernels: bit parity with the HOF reference
  * formulations (the expressions the DuckDB oracles mirror), null/empty
  * contracts, and registration-argument validation. */
class NativeSketchSpec extends SparkSpec {

  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int, seed: Long): List[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(seed))

  private val word: Gen[String] = for {
    len <- Gen.choose(1, 10)
    cs <- Gen.listOfN(len, Gen.frequency(
      8 -> Gen.alphaLowerChar, 1 -> Gen.numChar, 1 -> Gen.const('ü')))
  } yield cs.mkString

  private val doc: Gen[List[String]] = for {
    n <- Gen.choose(0, 60)
    ws <- Gen.listOfN(n, word)
  } yield ws

  test("native simhash is bit-identical to the HOF formulation on random docs") {
    GraftFunctions.ensureRegistered(spark)
    val docs = sample(doc, 200, 41L)
    for (bits <- Seq(1, 16, 32, 60)) {
      val out = docs.map(d => Tuple1(d)).toDF("toks")
        .select(col("toks"))
        .withColumn("__th", transform(col("toks"), t =>
          conv(substring(md5(t), 1, 15), 16, 10).cast("long")))
        .select(
          GraftFunctions.simhashNative(col("toks"), bits).as("native"),
          TextFunctions.simhashFromHashes(col("__th"), bits).as("hof"))
        .as[(Long, Long)].collect()
      out.foreach { case (native, hof) =>
        assert(native === hof, s"simhash kernel diverged from HOF at bits=$bits")
      }
    }
  }

  test("native minhash matches the HOF signature columns on random hash sets") {
    GraftFunctions.ensureRegistered(spark)
    val hashes: Gen[List[Long]] = for {
      n <- Gen.choose(1, 80)
      hs <- Gen.listOfN(n, Gen.choose(0L, (1L << 60) - 1))
    } yield hs
    val sets = sample(hashes, 200, 43L)
    for (numSigs <- Seq(1, 8, 16)) {
      val out = sets.map(h => Tuple1(h)).toDF("hset")
        .select(
          GraftFunctions.minhashNative(col("hset"), numSigs).as("native"),
          array((0 until numSigs).map(j =>
            TextFunctions.minhashFromHashes(
              transform(col("hset"), h => h % TextFunctions.MinhashP), j)): _*).as("hof"))
        .as[(Seq[Long], Seq[Long])].collect()
      out.foreach { case (native, hof) =>
        assert(native === hof, s"minhash kernel diverged from HOF at numSigs=$numSigs")
      }
    }
  }

  test("null ELEMENTS match HOF semantics: counted in simhash n, skipped by minhash") {
    GraftFunctions.ensureRegistered(spark)
    // simhash: null token votes for nothing but counts toward n — HOF
    // twin = simhashFromHashes over transform(toks, md5Long) (md5(null)
    // is a null hash; filter() excludes it, size() counts it)
    val toks = Seq(Tuple1(Seq[String]("a", null, "b", null, null)))
      .toDF("toks")
      .withColumn("__th", transform(col("toks"), t =>
        conv(substring(md5(t), 1, 15), 16, 10).cast("long")))
    val (nat, hof) = toks.select(
      GraftFunctions.simhashNative(col("toks"), 16),
      TextFunctions.simhashFromHashes(col("__th"), 16))
      .as[(Long, Long)].head()
    assert(nat === hof)
    // minhash: null hashes skipped (array_min skips nulls); all-null → null
    val hs = Seq(Tuple1(Seq[java.lang.Long](5L, null, 9L)))
      .toDF("hset")
    val (mn, mh) = hs.select(
      GraftFunctions.minhashNative(col("hset"), 4),
      array((0 until 4).map(j => TextFunctions.minhashFromHashes(
        transform(col("hset"), h => h % TextFunctions.MinhashP), j)): _*))
      .as[(Seq[Long], Seq[Long])].head()
    assert(mn === mh)
    val allNull = Seq(Tuple1(Seq[java.lang.Long](null, null))).toDF("hset")
      .select(GraftFunctions.minhashNative(col("hset"), 4)).collect()
    assert(allNull.head.isNullAt(0))
  }

  test("minhash of an empty hash set is null (array_min-over-empty parity)") {
    GraftFunctions.ensureRegistered(spark)
    val r = Seq(Tuple1(Seq.empty[Long])).toDF("hset")
      .select(GraftFunctions.minhashNative(col("hset"), 4).as("m"))
      .collect()
    assert(r.head.isNullAt(0))
  }

  test("simhash of an empty token array is 0 (no majority bits)") {
    GraftFunctions.ensureRegistered(spark)
    val r = Seq(Tuple1(Seq.empty[String])).toDF("toks")
      .select(GraftFunctions.simhashNative(col("toks"), 16).as("c"))
      .as[Long].collect()
    assert(r.head === 0L)
  }

  test("non-literal width arguments fail registration with a clear message") {
    GraftFunctions.ensureRegistered(spark)
    // a foldable expression is as good as a literal…
    spark.sql("SELECT graft_simhash(array('a'), length('ab'))").collect()
    spark.sql("SELECT graft_simhash(array('a'), 2)").collect()
    // …but a COLUMN argument must fail analysis with a clear message
    val bad = intercept[Exception] {
      Seq(Tuple1(Seq("a"))).toDF("toks").createOrReplaceTempView("__t")
      spark.sql("SELECT graft_minhash(array(1L), size(toks)) FROM __t").collect()
    }
    assert(bad.getMessage.contains("integer literal"))
  }

  test("native normalize is identical to the regex formulation on nasty strings") {
    GraftFunctions.ensureRegistered(spark)
    val hand = Seq(
      "", " ", "   ", "!!!", "a", "A!B?  c9 ",
      "  Hello,   World!! 42 ",
      "Ünïcödé ß İstanbul ÆØÅ",              // multibyte + special case maps
      "tabs\tand\nnewlines\r\nmixed",
      "0123456789 ABC xyz", "---a---", "a.b,c;d:e",
      "ends with punct!", "!starts with punct",
      "ＦＵＬＬｗｉｄｔｈ１２３")                 // fullwidth forms lower to non-ASCII
    val rand = sample(for {
      n <- Gen.choose(0, 40)
      ws <- Gen.listOfN(n, Gen.frequency(
        6 -> word, 2 -> Gen.const("!?."), 1 -> Gen.const("  "),
        1 -> Gen.oneOf("ß", "İ", "Σ", "ǅ", " ")))
    } yield ws.mkString(" "), 200, 20260812L)
    val df = (hand ++ rand).zipWithIndex.map(_.swap).toDF("i", "t")
    val mismatches = df.select(col("i"),
        TextFunctions.normalizeText(col("t")).as("ref"),
        GraftFunctions.normalizeNative(col("t")).as("nat"))
      .filter(!(col("ref") <=> col("nat")))
      .collect()
    assert(mismatches.isEmpty,
      s"normalize parity broken: ${mismatches.take(5).mkString("; ")}")
    // null passes through as null on both paths
    val nulls = Seq((1, Option.empty[String])).toDF("i", "t")
      .select(TextFunctions.normalizeText(col("t")).as("ref"),
        GraftFunctions.normalizeNative(col("t")).as("nat"))
      .head()
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
  }

  test("end-to-end: Dedup.simhashCodes and minhashSignatures survive the swap") {
    val docs = Seq((1L, "a b c a"), (2L, "x y z"), (3L, "")).toDF("doc_id", "text")
    val codes = graft.operators.Dedup.simhashCodes(docs, "doc_id", "text", 16)
      .orderBy("doc_id").as[(Long, Long)].collect()
    assert(codes.length === 3)
    val sets = graft.operators.Dedup.shingleSets(docs, "doc_id", "text", 2)
    val sigs = graft.operators.Dedup.minhashSignatures(sets, "doc_id", 8)
    assert(sigs.columns.toSeq === "doc_id" +: (0 until 8).map(j => s"m$j"))
    assert(sigs.count() === 2) // the empty doc has no 2-shingles
  }
}
