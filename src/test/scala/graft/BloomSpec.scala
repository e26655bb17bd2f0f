package graft

import org.apache.spark.sql.functions.{col, count, lit}

import graft.operators.BloomSet

/** Planted-semantics checks for the Bloom membership sketch: the
  * set-bit frame and membership verdicts are compared against an
  * independent pure-Scala reimplementation of the same md5 + affine
  * hash pipeline (the oracle gate proves DuckDB parity; this pins the
  * FORMULA against a second implementation sharing no Spark code), the
  * no-false-negatives guarantee is asserted over every planted member,
  * and union-mergeability (distinct of partial sketches ≡ one-pass
  * sketch) — the property the streaming monitor rides — is proven on a
  * random split. */
class BloomSpec extends SparkSpec {

  import spark.implicits._

  private def refHp(term: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(term.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % BloomSet.P
  }
  private def refBits(term: String): Set[Long] =
    BloomSet.RowParams.map { case (a, b) =>
      (a * refHp(term) + b) % BloomSet.P % BloomSet.M
    }.toSet

  test("set-bit frame and membership verdicts match an independent reimplementation") {
    val members = (1 to 200).map(i => s"tok$i")
    val bits = BloomSet.sketch(members.toDF("term"), "term")
    val refSet = members.flatMap(refBits).toSet
    assert(bits.collect().map(_.getLong(0)).toSet === refSet)

    val probes = members.take(50) ++ (1 to 100).map(i => s"absent$i")
    val got = BloomSet.membership(bits, probes.toDF("term"), "term")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    probes.foreach { p =>
      assert(got(p) === refBits(p).subsetOf(refSet), s"verdict mismatch: $p")
    }
    // no false negatives, ever: every member tests positive
    members.take(50).foreach(p => assert(got(p), s"false negative: $p"))
  }

  test("report flags exactly the in_bloom-but-absent probes as false positives") {
    val members = (1 to 300).map(i => s"m$i")
    val probes = members.take(20) ++ (1 to 500).map(i => s"p$i")
    val bits = BloomSet.sketch(members.toDF("term"), "term")
    val rep = BloomSet.report(bits, members.toDF("term"), probes.toDF("term"))
      .collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))
    assert(rep.length === probes.distinct.length)
    rep.foreach { case (term, inBloom, present, fp) =>
      assert(present === members.contains(term))
      if (present) assert(inBloom, s"false negative in report: $term")
      assert(fp === (inBloom && !present))
    }
  }

  test("duplicated probe terms cannot produce false negatives") {
    val members = (1 to 100).map(i => s"dup$i")
    val bits = BloomSet.sketch(members.toDF("term"), "term")
    // each member probed 3 times: without the internal distinct the
    // per-term match count reads 3k ≠ k and every member would flag
    // in_bloom=false — breaking the no-false-negatives guarantee
    val probes = (members ++ members ++ members).toDF("term")
    val got = BloomSet.membership(bits, probes, "term").collect()
    assert(got.length === members.length) // one verdict per distinct term
    got.foreach(r => assert(r.getBoolean(1), s"false negative: ${r.getString(0)}"))
  }

  test("partial sketches merge by union-distinct to the one-pass sketch") {
    val all = (1 to 400).map(i => s"w$i")
    val (a, b) = all.partition(t => refHp(t) % 2 == 0) // arbitrary split
    val merged = BloomSet.sketch(a.toDF("term"), "term")
      .union(BloomSet.sketch(b.toDF("term"), "term")).distinct()
    val onePass = BloomSet.sketch(all.toDF("term"), "term")
    assert(merged.collect().map(_.getLong(0)).toSet ===
      onePass.collect().map(_.getLong(0)).toSet)
    // bounded state: the whole filter is at most M rows
    assert(onePass.agg(count(lit(1))).head.getLong(0) <= BloomSet.M)
    assert(onePass.filter(col("bit") < 0L || col("bit") >= BloomSet.M).count() === 0L)
  }
}
