package graft

import org.apache.spark.sql.functions._

import graft.operators.{OperatorCaches, Percentiles}

/** Distributed rank-selection percentiles vs Spark's own exact aggregate
  * — bit-equality, plus the degenerate shapes (constant column, p=0/1,
  * empty input) where interpolation logic usually breaks. */
class PercentilesSpec extends SparkSpec {

  import spark.implicits._

  test("matches Spark's exact percentile aggregate bit for bit") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val ps = Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)
    val dist = Percentiles.exactInterpolated(li, "l_extendedprice", ps)
    val ref = li.agg(expr(
        s"percentile(l_extendedprice, array(${ps.mkString(",")}))"))
      .head().getSeq[Double](0)
    assert(dist === ref)
    OperatorCaches.release()
  }

  test("degenerate inputs: constant column, single row, empty") {
    val const = Seq.fill(100)(7.5).toDF("v")
    assert(Percentiles.exactInterpolated(const, "v", Seq(0.0, 0.5, 1.0))
      === Seq(7.5, 7.5, 7.5))
    val one = Seq(3.25).toDF("v")
    assert(Percentiles.exactInterpolated(one, "v", Seq(0.0, 0.37, 1.0))
      === Seq(3.25, 3.25, 3.25))
    val empty = spark.emptyDataFrame.withColumn("v", lit(1.0)).filter(lit(false))
    assert(Percentiles.exactInterpolated(empty, "v", Seq(0.5)) === Seq.empty)
    OperatorCaches.release()
  }

  test("grouped percentiles match the grouped aggregate, groups spanning partitions") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    // 4 shuffle partitions over 3 groups of ~2000 rows each: every group's
    // value range necessarily spans range-partition boundaries — the shape
    // the per-(partition, group) offsets exist for
    val ps = Seq(0.25, 0.5, 0.75)
    val got = Percentiles.groupedExactInterpolated(
        li, "l_returnflag", "l_quantity", ps)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val ref = li.groupBy(col("l_returnflag"))
      .agg(expr(s"percentile(l_quantity, array(${ps.mkString(",")}))").as("q"))
      .collect().flatMap { r =>
        val g = r.getString(0)
        r.getSeq[Double](1).zip(ps).map { case (v, p) => (g, p) -> v }
      }.toMap
    assert(got === ref)
    // the plan shape: no single-partition exchange in the ranked pass
    val plan = Percentiles.groupedExactInterpolated(
      li, "l_returnflag", "l_quantity", Seq(0.5))
    assert(plan.columns.toSeq === Seq("l_returnflag", "p", "value"))
    OperatorCaches.release()
  }

  test("nulls are excluded, matching the aggregate's contract") {
    val df = (Seq.tabulate(99)(i => Some(i.toDouble)) :+ Option.empty[Double])
      .toDF("v")
    val got = Percentiles.exactInterpolated(df, "v", Seq(0.5))
    val ref = df.agg(expr("percentile(v, 0.5)")).head().getDouble(0)
    assert(got === Seq(ref))
    OperatorCaches.release()
  }

  test("groupedAtRanks returns exact order statistics, groups spanning partitions") {
    // deliberately skewed groups with duplicate values (tie runs), spread
    // over many input partitions so every group straddles range partitions
    val rows = (1 to 500).map(i => ("big", (i % 37).toDouble)) ++
      (1 to 23).map(i => ("small", (i % 5).toDouble))
    val df = rows.toDF("g", "v").repartition(13)
    val got = Percentiles.groupedAtRanks(df, "g", "v",
      n => array(lit(1L), Percentiles.floorPctRank(n, 10),
        Percentiles.floorPctRank(n, 90), n))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val sorted = rs.map(_._2).sorted
      val n = sorted.length.toLong
      Seq(1L, (n - 1) * 10 / 100 + 1, (n - 1) * 90 / 100 + 1, n).foreach { rn =>
        assert(got((g, rn)) === sorted((rn - 1).toInt),
          s"group $g rank $rn")
      }
    }
    OperatorCaches.release()
  }

  test("10k-cardinality group key: plan stays group-size-free") {
    // the shape the typedLit offset map would have choked on — 10,000
    // groups would have serialized a ≈10k·partitions-entry literal into
    // the plan and every task binary; the joined-offsets form must keep
    // the optimized plan FREE of group-scaled literals and still be exact
    val rows = (0 until 40000).map { i =>
      (s"g${i % 10000}", ((i * 2654435761L) % 997).toDouble)
    }
    val df = rows.toDF("g", "v").repartition(16)
    val ps = Seq(0.0, 0.5, 1.0)
    val got = Percentiles.groupedExactInterpolated(df, "g", "v", ps)
    // no literal in the optimized plan may scale with group count
    val planStr = got.queryExecution.optimizedPlan.toString
    assert(planStr.length < 200000,
      s"plan unexpectedly large (${planStr.length} chars) — group-scaled literal?")
    val gotMap = got.collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(gotMap.size === 10000 * ps.size)
    // exactness, checked per group against driver-side sorted truth
    val truth = rows.groupBy(_._1)
    (0 until 10000 by 997).map(i => s"g$i").foreach { g =>
      val sorted = truth(g).map(_._2).sorted
      ps.foreach { p =>
        val pos = p * (sorted.length - 1)
        val (lo, hi) = (pos.floor.toInt, pos.ceil.toInt)
        val expect =
          if (lo == hi) sorted(lo)
          else (hi - pos) * sorted(lo) + (pos - lo) * sorted(hi)
        assert(gotMap((g, p)) === expect, s"group $g p $p")
      }
    }
    OperatorCaches.release()
  }
}
