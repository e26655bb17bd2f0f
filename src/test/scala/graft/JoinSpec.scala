package graft

import org.apache.spark.sql.functions._

/** Join-strategy coverage: the MERGE-hinted big-big join actually plans
  * a SortMergeJoin, and strategy choice never changes results. */
class JoinSpec extends SparkSpec {

  import spark.implicits._

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

  test("binned range join avoids nested-loop plans and matches the naive join") {
    import graft.operators.RangeJoin
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    val iv = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter(col("o_orderkey") % 50 === 0)
      .select(col("o_orderkey").as("iv_id"),
        (col("o_totalprice") * 0.45).as("lo"),
        (col("o_totalprice") * 0.55).as("hi"))
    val binned = RangeJoin.pointInInterval(li, "l_extendedprice", iv, "lo", "hi", 5000.0)
    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"range join fell back to an all-pairs plan:\n$plan")
    val got = binned.select("l_orderkey", "l_linenumber", "iv_id")
      .as[(Long, Int, Long)].collect().toSet
    val naive = li.join(iv,
        col("l_extendedprice") >= col("lo") && col("l_extendedprice") <= col("hi"))
      .select("l_orderkey", "l_linenumber", "iv_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(got === naive)
    assert(naive.nonEmpty)
    // multiplicity too, not just set equality — a duplicate-emitting bin
    // scheme must fail here, not be masked by toSet (the fixture itself
    // has repeated (orderkey, linenumber) rows, so compare row COUNTS)
    val naiveCount = li.join(iv,
        col("l_extendedprice") >= col("lo") && col("l_extendedprice") <= col("hi"))
      .count()
    assert(binned.count() === naiveCount)
    // inverted intervals contribute nothing (documented empty-interval
    // semantics; an unguarded sequence() would count down through them)
    val inverted = iv.select(col("iv_id"), col("hi").as("lo"), col("lo").as("hi"))
    assert(RangeJoin.pointInInterval(li, "l_extendedprice", inverted,
      "lo", "hi", 5000.0).count() === 0L)
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
