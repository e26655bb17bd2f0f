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
}
