package graft

import org.apache.spark.sql.functions._

import graft.operators.{OperatorCaches, PrefixSum, Quality}

/** The distributed prefix-sum shape (range partition + per-partition window
  * + broadcast offsets) that replaced the last two global-window cumsums.
  * The decisive assertions are on the PLAN — no `Exchange SinglePartition`
  * anywhere — because that is what survives a billion-row vocabulary, plus
  * bit-equality against the single-window reference forms. */
class PrefixSumSpec extends SparkSpec {

  private def assertNoSinglePartition(df: org.apache.spark.sql.DataFrame,
                                      what: String): Unit = {
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"$what must not plan a SinglePartition exchange:\n$plan")
  }

  test("rankedRunningSum equals the global-window form and plans no SinglePartition") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sized = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n"))
    val (dist, total) = PrefixSum.rankedRunningSum(
      sized, Seq(col("doc_id")), col("n"), "rn", "cum", numPartitions = 7)
    assertNoSinglePartition(dist, "rankedRunningSum")

    val w = org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))
    val ref = sized
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("n")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    val a = dist.orderBy("doc_id").collect().toSeq
    val b = ref.select(dist.columns.map(col): _*).orderBy("doc_id").collect().toSeq
    assert(a === b)
    assert(total === sized.agg(sum("n")).head().getLong(0))
    OperatorCaches.release()
  }

  test("rankedRunningMax equals the strict-predecessor window, no SinglePartition") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sized = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n"))
    val dist = PrefixSum.rankedRunningMax(
      sized, Seq(col("doc_id")), col("n"), "rn", "pm", numPartitions = 7)
    assertNoSinglePartition(dist, "rankedRunningMax")
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))
    val ref = sized
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("pm", max(col("n")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)))
    val a = dist.orderBy("doc_id").collect().toSeq
    val b = ref.select(dist.columns.map(col): _*).orderBy("doc_id").collect().toSeq
    assert(a === b)
    // the first row's strict-predecessor max is genuinely null
    assert(dist.orderBy("rn").head().isNullAt(dist.columns.indexOf("pm")))
    OperatorCaches.release()
  }

  test("rankedRunningSum handles a descending total order with tiebreak") {
    val tf = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term").agg(count(lit(1)).as("n"))
    val (dist, _) = PrefixSum.rankedRunningSum(
      tf, Seq(desc("n"), col("term")), col("n"), "rn", "cum", numPartitions = 5)
    val w = org.apache.spark.sql.expressions.Window.orderBy(desc("n"), col("term"))
    val ref = tf
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("n")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    assert(dist.orderBy("rn").collect().toSeq ===
      ref.select(dist.columns.map(col): _*).orderBy("rn").collect().toSeq)
    OperatorCaches.release()
  }

  test("rankedRunningSum on an empty frame yields an empty frame and zero total") {
    val empty = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), lit(1L).as("n")).filter(col("doc_id") < 0)
    val (dist, total) = PrefixSum.rankedRunningSum(
      empty, Seq(col("doc_id")), col("n"), "rn", "cum")
    assert(dist.count() === 0L)
    assert(total === 0L)
    OperatorCaches.release()
  }

  test("packContiguous (distributed) is bit-identical to the single-pass twin, no SinglePartition") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val dist = Quality.packContiguous(docs, "doc_id", "text", budget = 512)
    assertNoSinglePartition(dist, "packContiguous")
    val ref = Quality.packContiguousSinglePass(docs, "doc_id", "text", budget = 512)
    assert(dist.orderBy("doc_id").collect().toSeq ===
      ref.orderBy("doc_id").collect().toSeq)
    OperatorCaches.release()
  }

  test("q101 vocab-coverage query plans no SinglePartition exchange") {
    val q101 = SparkEntry.queries("q101_vocab_coverage")(spark, sfDir)
    assertNoSinglePartition(q101, "q101_vocab_coverage")
    assert(q101.count() === 3L)
    OperatorCaches.release()
  }
}
