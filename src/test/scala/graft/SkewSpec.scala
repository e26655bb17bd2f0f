package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.Skew

/** Salted two-phase aggregation: result parity with the one-phase
  * groupBy, and genuine fan-out even when the hot key's VALUES are
  * low-cardinality (the case a value-derived salt would collapse). */
class SkewSpec extends SparkSpec {

  import spark.implicits._

  test("saltedDsum equals the one-phase groupBy bit-for-bit") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val salted = Skew.saltedDsum(li, Seq("l_returnflag"), col("l_quantity"))
      .orderBy("l_returnflag").collect()
    val plain = li.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("sum_value"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag").collect()
    assert(salted.toSeq === plain.toSeq)
  }

  test("AQE splits the skewed side of a sort-merge join at runtime") {
    // power-law fact: 90% of the rows carry key 0 (one post-shuffle
    // partition ~17× the median); the other side is uniform and too big
    // to broadcast (broadcast disabled — the 100 TB fact-fact stance).
    // Thresholds are scaled down so the fixture-sized hot partition
    // crosses them; at production scale the defaults (256 MB) play the
    // same role. The assertion is on the ADAPTIVE plan: after execution
    // the SortMergeJoin must be marked skew=true (AQE replaced the hot
    // partition with multiple splits joined against replicated right
    // sides) — the runtime answer to join-side skew that salting answers
    // for aggregation.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      .map(k => k -> conf.get(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      val fact = spark.range(200000).select(
        when(col("id") % 10 =!= 0, lit(0L)).otherwise(pmod(col("id"), lit(97L))).as("k"),
        concat(lit("payload-"), col("id")).as("payload"))
      val dim = spark.range(97).select(col("id").as("k"),
        concat(lit("dim-"), col("id")).as("attr"))
      val joined = fact.join(dim, "k")
      // collect() runs THIS dataset's QueryExecution (count() would build
      // a separate one and leave this adaptive plan un-finalized)
      val n = joined.collect().length
      assert(n === 200000) // every fact key exists in dim — parity first
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected AQE to mark the SortMergeJoin skew=true, final plan:\n$finalPlan")
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }

  test("a hot key with constant values still fans out across salt buckets") {
    // one key, one distinct value: a value-derived salt would put every
    // row in a single bucket and recreate the hot reducer
    val hot = Seq.fill(5000)(("hot", 1.0)).toDF("k", "v")
    val buckets = hot
      .withColumn("__salt", floor(rand(7L) * 16).cast("int"))
      .select("__salt").distinct().count()
    assert(buckets >= 8, s"expected fan-out over most of 16 salt buckets, got $buckets")
    // and the aggregate over the salted path is still exact
    val out = Skew.saltedDsum(hot, Seq("k"), col("v")).collect()
    assert(out.length === 1)
    assert(out.head.getDouble(1) === 5000.0)
    assert(out.head.getLong(2) === 5000L)
  }
}
