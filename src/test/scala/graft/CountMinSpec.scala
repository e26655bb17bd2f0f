package graft

import graft.operators.CountMin

/** Planted-semantics checks for the Count-Min sketch: the counter
  * frame, point estimates, and report are compared against an
  * independent pure-Scala reimplementation of the same md5 + affine
  * hash pipeline (the oracle gates prove DuckDB parity; this pins the
  * FORMULA against a second implementation that shares no Spark code),
  * and the one-sided error guarantee (estimate ≥ exact, always) is
  * asserted over every planted term. */
class CountMinSpec extends SparkSpec {

  import spark.implicits._

  // independent reference: md5 hex → first 15 hex digits → affine rows
  private def refHp(term: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(term.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % CountMin.P
  }
  private def refBuckets(term: String): Seq[(Int, Long)] = {
    val h = refHp(term)
    CountMin.RowParams.zipWithIndex.map { case ((a, b), r) =>
      r -> ((a * h + b) % CountMin.P % CountMin.W)
    }
  }

  test("sketch, estimates, and report match an independent reimplementation") {
    val corpus: Seq[String] =
      Seq.fill(5)("spark") ++ Seq.fill(3)("join") ++ Seq.fill(2)("scan") ++
        (1 to 40).map(i => s"filler$i")
    val toks = corpus.toDF("term")
    val counters = CountMin.sketch(toks, "term")

    // reference counters
    val refC = scala.collection.mutable.Map.empty[(Int, Long), Long]
    corpus.foreach(t => refBuckets(t).foreach(k =>
      refC(k) = refC.getOrElse(k, 0L) + 1L))
    val gotC = counters.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(gotC === refC.toMap)

    // estimates + report over every distinct term: min over the 4
    // reference counters, and estimate >= exact for each (one-sided)
    val terms = corpus.distinct
    val exact = corpus.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val refEst = terms.map(t =>
      t -> refBuckets(t).map(refC(_)).min).toMap
    val exacts = toks.groupBy("term")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("exact_cnt"))
    val rep = CountMin.report(counters, exacts, terms.toDF("term"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rep.length === terms.length)
    rep.foreach { case (t, ex, est, over) =>
      assert(ex === exact(t))
      assert(est === refEst(t))
      assert(est >= ex, s"one-sided error violated for $t")
      assert(over === est - ex)
    }
  }

  test("join-size inner products match the reference and bound the true size") {
    val a = Seq.fill(4)("x") ++ Seq.fill(2)("y") ++ (1 to 30).map(i => s"a$i")
    val b = Seq.fill(3)("x") ++ Seq.fill(5)("z") ++ (1 to 30).map(i => s"b$i")
    val trueSize = 4L * 3L // only "x" is shared
    val est = CountMin.joinSizeEstimates(
        CountMin.sketch(a.toDF("term"), "term"),
        CountMin.sketch(b.toDF("term"), "term"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // reference inner products from the pure-Scala counters
    def refCounters(ts: Seq[String]) = {
      val m = scala.collection.mutable.Map.empty[(Int, Long), Long]
      ts.foreach(t => refBuckets(t).foreach(k =>
        m(k) = m.getOrElse(k, 0L) + 1L))
      m.toMap
    }
    val (ca, cb) = (refCounters(a), refCounters(b))
    val refEst = (0 until 4).map { r =>
      r -> ca.collect { case ((`r`, bkt), c) =>
        c * cb.getOrElse((r, bkt), 0L) }.sum
    }.toMap
    assert(est === refEst)
    // one-sided: every row's inner product bounds the true join size
    (0 until 4).foreach(r => assert(est(r) >= trueSize))
  }

  test("a probe term absent from the corpus reports exact 0, overcount = estimate") {
    val toks = Seq("a b c", "a b").flatMap(_.split(" ")).toDF("term")
    val counters = CountMin.sketch(toks, "term")
    val exacts = toks.groupBy("term")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("exact_cnt"))
    val rep = CountMin.report(counters, exacts,
        Seq("a", "zzz_absent").toDF("term"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(rep("a")._1 === 2L)
    val (ex0, est0, over0) = rep("zzz_absent")
    assert(ex0 === 0L && est0 >= 0L && over0 === est0)
  }

  test("delete by sketch linearity equals a fresh build over the remainder, frame-exactly") {
    // tokens chosen so deleted terms SHARE buckets with survivors
    // (same md5-affine pipeline → collisions by pigeonhole at 300
    // distinct terms) and some buckets drain to zero — those must be
    // DROPPED, because a fresh build never materializes them
    val all = (1 to 300).flatMap(i => Seq.fill(i % 3 + 1)(s"tok$i"))
    val deleted = all.filter(t => t.drop(3).toInt % 5 == 0)
    val remainder = {
      // multiset subtraction (deleted is a sub-multiset of all)
      val budget = scala.collection.mutable.Map(
        deleted.groupBy(identity).view.mapValues(_.size).toSeq: _*)
      all.filter { t =>
        val left = budget.getOrElse(t, 0)
        if (left > 0) { budget(t) = left - 1; false } else true
      }
    }
    val pruned = CountMin.delete(
      CountMin.sketch(all.toDF("term"), "term"),
      CountMin.sketch(deleted.toDF("term"), "term"))
    val rebuilt = CountMin.sketch(remainder.toDF("term"), "term")
    def frame(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(frame(pruned) === frame(rebuilt))
    // and zero buckets really existed to drop (the interesting case)
    assert(pruned.count() < CountMin.sketch(all.toDF("term"), "term").count())
  }
}
