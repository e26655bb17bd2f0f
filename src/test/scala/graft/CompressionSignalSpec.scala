package graft

import org.apache.spark.sql.functions._

import graft.operators.Quality

/** The deflate-length kernel and its compression-ratio quality signal —
  * spec-verified because no SQL engine can twin deflate (deliberately
  * outside the oracle-gated registry). */
class CompressionSignalSpec extends SparkSpec {

  import spark.implicits._

  test("repetitive text compresses below diverse text; noise above prose") {
    val repetitive = Seq.fill(100)("spam spam spam").mkString(" ")
    val prose = (0 until 100).map(i => s"word$i token${i * 7 % 13}").mkString(" ")
    val noise = new scala.util.Random(5).alphanumeric.take(1200).mkString
    val docs = Seq((1L, repetitive), (2L, prose), (3L, noise))
      .toDF("doc_id", "text")
    val out = Quality.compressionSignal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) < out(2L), s"repetition must compress best: $out")
    assert(out(2L) < out(3L), s"noise must compress worst: $out")
    assert(out(1L) < 0.1 && out(3L) > 0.5, s"tails must separate: $out")
  }

  test("deflate length is deterministic across runs and rows") {
    val docs = (0 until 50).map(i => (i.toLong, s"doc $i " * (i + 1)))
      .toDF("doc_id", "text")
    def run() = Quality.compressionSignal(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.getInt(2)).toSeq
    assert(run() === run())
  }

  test("graft_deflate_len registers as a SQL function and handles null/empty") {
    graft.plans.GraftFunctions.ensureRegistered(spark)
    val r = spark.sql(
      """SELECT graft_deflate_len('aaaaaaaaaaaaaaaaaaaaaaaa') AS a,
        |       graft_deflate_len('') AS e,
        |       graft_deflate_len(CAST(NULL AS STRING)) AS n""".stripMargin)
      .collect().head
    assert(r.getInt(0) > 0 && r.getInt(0) < 24) // 24 a's compress
    assert(r.getInt(1) >= 0)                    // empty input, tiny block
    assert(r.isNullAt(2))                       // null-safe
  }

  test("the signal stays inside whole-stage codegen") {
    // a LocalRelation constant-folds through ConvertToLocalRelation (the
    // expression evaluates eagerly — itself proof eval works); a file scan
    // exercises the codegen path the corpus will actually take
    val tmp = java.nio.file.Files.createTempDirectory("deflate").toString
    (0 until 10).map(i => (i.toLong, s"text $i")).toDF("doc_id", "text")
      .write.parquet(s"$tmp/docs")
    val docs = spark.read.parquet(s"$tmp/docs")
    val out = Quality.compressionSignal(docs, "doc_id", "text")
    // EXECUTE the codegen'd kernel (a count would prune the Project and
    // never compile the generated call) and check it against the eval
    // path — a broken doGenCode would silently fall back to interpreted
    val fromCodegen = out.select("doc_id", "deflate_len").orderBy("doc_id")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val expected = (0 until 10).map(i => i.toLong ->
      graft.plans.DeflateLength.compressedLength(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"text $i"))).toMap
    assert(fromCodegen === expected)
    // the "*(1)" prefix is the WholeStageCodegen span marker in this
    // plan-string format; the kernel's Project must sit inside one
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("graft_deflate_len"),
      plan)
  }
}
