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
