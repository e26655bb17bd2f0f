package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.{TopKPerKeyExec, TopKPerKeyPlans}

/** Custom per-key top-k physical operator: row-for-row equality with the
  * window formulation under a total order, two-phase plan shape (partial →
  * exchange → final), shuffle-volume reduction, and edge cases. */
class TopKPerKeySpec extends SparkSpec {

  import spark.implicits._

  private def windowTopK(df: org.apache.spark.sql.DataFrame, key: String,
                         k: Int): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(desc("value"), col("id"))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k).drop("__rn")
  }

  private def sample = spark.range(0, 10000).toDF("id")
    .withColumn("key", pmod(col("id"), lit(37)).cast("int"))
    .withColumn("value", pmod(col("id") * 2654435761L, lit(1000003L)).cast("double"))
    .repartition(8)

  test("matches the window row_number formulation under a total order") {
    val df = sample
    for (k <- Seq(1, 5, 50)) {
      val native = TopKPerKeyPlans.topKPerKey(
        df, Seq("key"), Seq(desc("value"), col("id")), k)
        .orderBy("key", "id").collect()
      val win = windowTopK(df, "key", k).orderBy("key", "id").collect()
      assert(native.toSeq === win.toSeq, s"diverged at k=$k")
    }
  }

  test("plans two phases with one exchange between them") {
    val df = TopKPerKeyPlans.topKPerKey(sample, Seq("key"), Seq(desc("value"), col("id")), 3)
    df.collect() // materialize so AQE finalizes the physical plan
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    // AQE hides subplans behind QueryStageExec boundaries, so assert on
    // the rendered tree: final phase (…, true) above the by-key hash
    // exchange, partial (…, false) below it.
    val rendered = plan.toString
    val finalIdx = rendered.indexOf(", true\n")
    val exchangeIdx = rendered.indexOf("Exchange hashpartitioning(key")
    val partialIdx = rendered.indexOf(", false\n")
    assert(finalIdx >= 0 && exchangeIdx >= 0 && partialIdx >= 0,
      s"expected final TopKPerKey, key exchange, and partial TopKPerKey in:\n$rendered")
    assert(finalIdx < exchangeIdx && exchangeIdx < partialIdx,
      s"phases out of order (final above exchange above partial):\n$rendered")
  }

  test("partial phase bounds what the shuffle carries") {
    // 8 input partitions × 37 keys × k=2 caps survivors at 592 of 10000
    val df = TopKPerKeyPlans.topKPerKey(sample, Seq("key"), Seq(desc("value"), col("id")), 2)
    df.collect() // execute
    val partialOut = df.queryExecution.executedPlan.collect {
      case e: TopKPerKeyExec if !e.isFinal => e.metrics // no custom metrics; assert via recompute
    }
    // recompute the partial bound directly: per-partition per-key counts <= k
    val perPartition = sample.select(spark_partition_id().as("p"), col("key"))
      .groupBy("p", "key").count().agg(max("count")).head().getLong(0)
    assert(perPartition > 2, "fixture must actually exceed k per partition for the bound to bite")
    assert(df.count() === 74) // 37 keys × k=2 exact rows survive the final
  }

  test("k larger than any group degrades to identity; ties broken by the total order") {
    val tiny = Seq((1, "a", 5.0), (2, "a", 5.0), (3, "b", 1.0))
      .toDF("id", "key", "value")
    val all = TopKPerKeyPlans.topKPerKey(tiny, Seq("key"), Seq(desc("value"), col("id")), 10)
    assert(all.count() === 3)
    val top1 = TopKPerKeyPlans.topKPerKey(tiny, Seq("key"), Seq(desc("value"), col("id")), 1)
      .orderBy("key").select("id").as[Int].collect()
    assert(top1.toSeq === Seq(1, 3)) // tie on value broken by ascending id
  }

  test("WindowTopKRewrite turns the row_number idiom into the native operator") {
    try {
      TopKPerKeyPlans.ensureRewrite(spark)
      val df = sample
      val idiom = windowTopK(df, "key", 3) // rank filtered then dropped
      val optimized = idiom.queryExecution.optimizedPlan
      assert(optimized.collectFirst { case t: graft.plans.TopKPerKey => t }.nonEmpty,
        s"rewrite did not fire:\n$optimized")
      // results equal the un-rewritten formulation
      TopKPerKeyPlans.removeRewrite(spark)
      val plain = windowTopK(df, "key", 3).orderBy("key", "id").collect()
      TopKPerKeyPlans.ensureRewrite(spark)
      val rewritten = windowTopK(df, "key", 3).orderBy("key", "id").collect()
      assert(rewritten.toSeq === plain.toSeq)

      // guard: a GLOBAL (un-partitioned) top-k must NOT rewrite — it
      // belongs to TakeOrderedAndProject, and an empty clustering is not
      // even constructible for the final phase
      val wg = Window.orderBy(desc("value"), col("id"))
      val globalTopK = df.withColumn("__rn", row_number().over(wg))
        .filter(col("__rn") <= 3).drop("__rn")
      assert(globalTopK.queryExecution.optimizedPlan
        .collectFirst { case t: graft.plans.TopKPerKey => t }.isEmpty,
        "must not rewrite a global top-k")
      assert(globalTopK.count() === 3)

      // guard: when the rank column IS used downstream, no rewrite
      val w = Window.partitionBy(col("key")).orderBy(desc("value"), col("id"))
      val keepsRank = df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= 3)
        .select(col("key"), col("__rn"))
      assert(keepsRank.queryExecution.optimizedPlan
        .collectFirst { case t: graft.plans.TopKPerKey => t }.isEmpty,
        "must not rewrite when rank values are referenced")
    } finally TopKPerKeyPlans.removeRewrite(spark)
  }

  test("unknown key or order column fails fast with a clear message") {
    val tiny = Seq((1, "a", 5.0)).toDF("id", "key", "value")
    val e1 = intercept[IllegalArgumentException] {
      TopKPerKeyPlans.topKPerKey(tiny, Seq("nope"), Seq(col("id")), 1)
    }
    assert(e1.getMessage.contains("key column 'nope'"))
    val e2 = intercept[IllegalArgumentException] {
      TopKPerKeyPlans.topKPerKey(tiny, Seq("key"), Seq(desc("missing")), 1)
    }
    assert(e2.getMessage.contains("order column 'missing'"))
  }
}
