package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.TextFunctions
import graft.plans.GraftFunctions

/** Native shingle-hash kernel: bit parity with the HOF reference
  * formulation (the expression the DuckDB oracle mirrors), edge cases,
  * SQL registration, and downstream equality through the dedup pipeline. */
class ShingleHashesSpec extends SparkSpec {

  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int, seed: Long): List[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(seed))

  private val word: Gen[String] = for {
    len <- Gen.choose(1, 10)
    cs <- Gen.listOfN(len, Gen.frequency(
      8 -> Gen.alphaLowerChar, 1 -> Gen.numChar, 1 -> Gen.const('é')))
  } yield cs.mkString

  test("native kernel is bit-identical to the HOF formulation on random docs") {
    GraftFunctions.ensureRegistered(spark)
    val doc: Gen[List[String]] = for {
      n <- Gen.choose(0, 50)
      ws <- Gen.listOfN(n, word)
    } yield ws
    val docs = sample(doc, 200, 31L)
    for (k <- Seq(1, 2, 3, 5, 8)) {
      val out = docs.map(d => Tuple1(d)).toDF("toks")
        .select(
          GraftFunctions.shingleHashesNative(col("toks"), k).as("native"),
          when(size(col("toks")) >= k,
            TextFunctions.shingleHashSeqFromTokens(col("toks"), k))
            .otherwise(typedLit(Seq.empty[Long])).as("hof"))
        .as[(Seq[Long], Seq[Long])].collect()
      out.foreach { case (native, hof) =>
        assert(native === hof, s"kernel diverged from HOF reference at k=$k")
      }
    }
  }

  test("short and empty token arrays yield empty hash arrays") {
    GraftFunctions.ensureRegistered(spark)
    val out = Seq(Seq.empty[String], Seq("a"), Seq("a", "b"))
      .map(Tuple1(_)).toDF("toks")
      .select(GraftFunctions.shingleHashesNative(col("toks"), 3).as("h"))
      .as[Seq[Long]].collect()
    out.foreach(h => assert(h.isEmpty))
  }

  test("graft_shingle_hashes is callable from SQL") {
    GraftFunctions.ensureRegistered(spark)
    val r = spark.sql(
      "SELECT graft_shingle_hashes(array('a', 'b', 'c', 'd'), 3) AS h")
      .as[Seq[Long]].head()
    assert(r.length === 2)
    // first shingle is 'a b c'; value must equal the shared md5Long idiom
    val expected = spark.sql(
      "SELECT CAST(conv(substring(md5('a b c'), 1, 15), 16, 10) AS BIGINT)")
      .as[Long].head()
    assert(r.head === expected)
  }

  test("dedup pipeline results are unchanged by the native kernel (q31 shape)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val native = graft.operators.Dedup.minhashSignatures(
      graft.operators.Dedup.shingleSets(docs, "doc_id", "text", 3), "doc_id", 8)
      .orderBy("doc_id").collect()
    // reference path: HOF shingle set
    val hofSets = docs
      .filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"),
        TextFunctions.shingleHashSetFromTokens(col("toks"), 3).as("hset"))
    val hof = graft.operators.Dedup.minhashSignatures(hofSets, "doc_id", 8)
      .orderBy("doc_id").collect()
    assert(native.toSeq === hof.toSeq)
  }
}
