package graft

import org.apache.spark.sql.types._

/** Fixture-drift tripwire for EVERY table, not just events (whose `ts`
  * type drift silently broke 15 queries in one round): each test pins
  * the column names and the Spark-resolved types the 147-query registry
  * was built against. If a driver regeneration changes a fixture, this
  * spec fails with the exact column — a loud, attributable failure
  * instead of a scattered analysis-time one. Timestamp columns accept
  * either the session-zoned or NTZ resolution (both regenerations seen
  * so far); `Q.events` normalizes events.ts, guarded separately by
  * EventsFixtureSpec. */
class FixtureSchemaSpec extends SparkSpec {

  private def ts(dt: DataType): Boolean =
    dt == TimestampType || dt == TimestampNTZType

  private val expected: Map[String, Seq[(String, DataType => Boolean)]] = Map(
    "region" -> Seq("r_regionkey" -> (_ == IntegerType), "r_name" -> (_ == StringType)),
    "nation" -> Seq("n_nationkey" -> (_ == IntegerType), "n_name" -> (_ == StringType),
      "n_regionkey" -> (_ == IntegerType)),
    "customer" -> Seq("c_custkey" -> (_ == LongType), "c_name" -> (_ == StringType),
      "c_nationkey" -> (_ == IntegerType), "c_acctbal" -> (_ == DoubleType),
      "c_mktsegment" -> (_ == StringType)),
    "supplier" -> Seq("s_suppkey" -> (_ == LongType), "s_name" -> (_ == StringType),
      "s_nationkey" -> (_ == IntegerType), "s_acctbal" -> (_ == DoubleType)),
    "part" -> Seq("p_partkey" -> (_ == LongType), "p_name" -> (_ == StringType),
      "p_brand" -> (_ == StringType), "p_type" -> (_ == StringType),
      "p_size" -> (_ == IntegerType), "p_retailprice" -> (_ == DoubleType)),
    "orders" -> Seq("o_orderkey" -> (_ == LongType), "o_custkey" -> (_ == LongType),
      "o_orderstatus" -> (_ == StringType), "o_totalprice" -> (_ == DoubleType),
      "o_orderdate" -> ts _, "o_orderpriority" -> (_ == StringType)),
    "lineitem" -> Seq("l_orderkey" -> (_ == LongType), "l_partkey" -> (_ == LongType),
      "l_suppkey" -> (_ == LongType), "l_linenumber" -> (_ == IntegerType),
      "l_quantity" -> (_ == DoubleType), "l_extendedprice" -> (_ == DoubleType),
      "l_discount" -> (_ == DoubleType), "l_tax" -> (_ == DoubleType),
      "l_returnflag" -> (_ == StringType), "l_linestatus" -> (_ == StringType),
      "l_shipdate" -> ts _),
    "events" -> Seq("event_id" -> (_ == LongType),
      // nanos regenerations resolve to LongType under nanosAsLong
      "ts" -> (dt => ts(dt) || dt == LongType),
      "user_id" -> (_ == LongType), "event_type" -> (_ == StringType),
      "value" -> (_ == DoubleType), "props" -> (_ == StringType)),
    "documents" -> Seq("doc_id" -> (_ == LongType), "text" -> (_ == StringType),
      "lang" -> (_ == StringType), "source" -> (_ == StringType),
      "n_chars" -> (_ == LongType)),
    "embeddings" -> Seq("vec_id" -> (_ == LongType),
      "embedding" -> (_ == ArrayType(FloatType, containsNull = true)),
      "label" -> (_ == IntegerType)))

  expected.foreach { case (table, cols) =>
    test(s"fixture schema pinned: $table") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = spark.read.parquet(s"$sfDir/$table.parquet").schema
      assert(schema.fields.map(_.name).toSeq === cols.map(_._1),
        s"$table columns drifted — regenerate the registry's assumptions")
      cols.foreach { case (name, ok) =>
        val dt = schema(name).dataType
        assert(ok(dt), s"$table.$name resolved to $dt — fixture type drifted")
      }
    }
  }

  /** ~40 registry oracles sum money/rate columns through
    * CAST(x AS DECIMAL(18,2)) for exact, order-free summation. That cast
    * is engine-identical ONLY when the stored double is 2-decimal-exact:
    * on a value with a 3rd decimal digit Spark rounds the shortest
    * decimal representation while DuckDB rounds the exact binary
    * expansion, and boundary values land one cent apart (this bit q230
    * in round 10 when a fixture regeneration emitted full-precision
    * o_totalprice). This test pins the guarantee those oracles assume,
    * so the next drifting regeneration fails HERE, attributably, instead
    * of as scattered hash mismatches. */
  private val twoDecimalCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_acctbal"),
    "supplier" -> Seq("s_acctbal"),
    "part" -> Seq("p_retailprice"),
    "orders" -> Seq("o_totalprice"),
    "lineitem" -> Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
    "events" -> Seq("value"))

  twoDecimalCols.foreach { case (table, cols) =>
    test(s"fixture money columns 2-decimal-exact: $table") {
      import org.apache.spark.sql.functions.{col, count, round, when}
      val df = spark.read.parquet(s"$sfDir/$table.parquet")
      cols.foreach { c =>
        val bad = df.agg(count(when(round(col(c), 2) =!= col(c), 1))
          .as("bad")).head.getLong(0)
        assert(bad === 0L,
          s"$table.$c has $bad values with >2 decimal digits — the " +
            "DECIMAL(18,2)-cast oracles are engine-dependent on such " +
            "values; switch affected queries to floor(x*100+0.5) cents")
      }
    }
  }
}
