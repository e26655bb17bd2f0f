package graft

import org.apache.spark.sql.functions._

/** Join-strategy coverage: the MERGE-hinted big-big join actually plans
  * a SortMergeJoin, and strategy choice never changes results. */
class JoinSpec extends SparkSpec {

  test("q88 plans a sort-merge join and matches the unhinted result") {
    val spec = graft.SparkEntry.allSpecs.find(_.name == "q88_smj_join").get
    val df = spec.fn(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SortMergeJoin in:\n$plan")

    val l = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val unhinted = l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        graft.queries.Q.dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy("o_orderpriority")
    assert(df.collect().toSeq === unhinted.collect().toSeq)
  }

  test("q97 plans a shuffled hash join and matches the unhinted result") {
    val spec = graft.SparkEntry.allSpecs.find(_.name == "q97_shj_join").get
    val df = spec.fn(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), s"expected ShuffledHashJoin in:\n$plan")

    val l = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val p = spark.read.parquet(s"$sfDir/part.parquet")
    val unhinted = l.join(p, l("l_partkey") === p("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"),
        graft.queries.Q.dsum(col("l_quantity")).as("sum_qty"))
      .orderBy("p_brand")
    assert(df.collect().toSeq === unhinted.collect().toSeq)
  }
}
