package graft

import org.apache.spark.sql.functions._

import graft.operators.{OperatorCaches, PrioritySample}

/** Planted-semantics checks for priority sampling: the selection and
  * threshold match an independent Scala reference over the same md5
  * uniforms, the merge-closure the streaming sink rides, the
  * heavy-item inclusion guarantee, and the HT estimator's accuracy on
  * real fixture weights. */
class PrioritySampleSpec extends SparkSpec {

  import spark.implicits._

  private def refPrio(key: String, wc: Long): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(key.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    wc.toDouble / ((h + 1).toDouble / PrioritySample.HMax)
  }

  test("sample and threshold match an independent reference selection") {
    val items = (1 to 400).map(i => (s"it$i", (i * 37 % 997 + 1).toLong))
    val pri = PrioritySample.withPriority(
      items.toDF("k", "w"), col("k"), col("w"))
    val (samp, tau) = PrioritySample.sampleWithTau(pri, 50)
    val got = samp.select("__key").as[String].collect().toSet
    val gotTau = tau.head().getDouble(0)

    val ranked = items.map { case (k, w) => (k, refPrio(k, w)) }
      .sortBy { case (k, p) => (-p, k) }
    assert(got === ranked.take(50).map(_._1).toSet)
    assert(gotTau === ranked(50)._2) // the (k+1)-th priority, exactly
    OperatorCaches.release()
  }

  test("top-(k+1) is merge-closed: partition-wise selection equals global") {
    val items = (1 to 600).map(i => (s"m$i", (i * 13 % 500 + 1).toLong))
    val k = 40
    def top(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(desc("__prio"), asc("__key")).limit(k + 1)
    val pri = PrioritySample.withPriority(
      items.toDF("k", "w"), col("k"), col("w"))
    val global = top(pri).select("__key").as[String].collect().toSet
    // split three ways, keep each partial's top-(k+1), merge, re-select
    val parts = (0 until 3).map(r =>
      top(PrioritySample.withPriority(
        items.filter(_._1.drop(1).toInt % 3 == r).toDF("k", "w"),
        col("k"), col("w"))))
    val merged = top(parts.reduce(_ unionByName _))
      .select("__key").as[String].collect().toSet
    assert(merged === global)
    OperatorCaches.release()
  }

  test("an item heavier than tau is always in the sample") {
    // one dominant item: priority = w/u >= w > every other priority's
    // possible value times the planted margin
    val items = ("whale", 1000000000L) +:
      (1 to 300).map(i => (s"fish$i", (i % 50 + 1).toLong))
    val pri = PrioritySample.withPriority(
      items.toDF("k", "w"), col("k"), col("w"))
    val (samp, _) = PrioritySample.sampleWithTau(pri, 20)
    assert(samp.filter(col("__key") === "whale").count() === 1L)
    OperatorCaches.release()
  }

  test("n <= k degenerates to the exact sum: tau is 0, every item sampled") {
    val items = (1 to 30).map(i => (s"t$i", (i * 11).toLong))
    val pri = PrioritySample.withPriority(
      items.toDF("k", "w"), col("k"), col("w"))
    val (samp, tau) = PrioritySample.sampleWithTau(pri, 50)
    assert(tau.head().getDouble(0) === 0.0d)
    assert(samp.count() === 30L)
    val est = PrioritySample.htGroupTotals(
      samp.withColumn("g", lit("all")), tau, "g")
      .head().getDecimal(2).longValueExact()
    assert(est === items.map(_._2).sum) // exact, not inflated
    OperatorCaches.release()
  }

  test("HT estimate lands near the exact total on fixture weights") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(concat(col("l_orderkey").cast("string"), lit("_"),
          col("l_linenumber").cast("string")).as("k"),
        floor(col("l_extendedprice") * lit(100.0d) + lit(0.5d))
          .cast("long").as("w"), lit("all").as("g"))
    val pri = PrioritySample.withPriority(li, col("k"), col("w"))
    val (samp, tau) = PrioritySample.sampleWithTau(pri, 500)
    val est = PrioritySample.htGroupTotals(samp, tau, "g")
      .head().getDecimal(2).longValueExact()
    val exact = li.agg(sum("w")).head().getLong(0)
    // k=500 -> expected relative error ~ 1/sqrt(500) ~ 4.5%; 20% is a
    // deterministic-fixture bound, not a tail gamble (the md5 draw is
    // fixed)
    assert(math.abs(est - exact).toDouble / exact < 0.20,
      s"HT estimate $est too far from exact $exact")
    OperatorCaches.release()
  }
}
