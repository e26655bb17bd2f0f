package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.plans.GraftFunctions

/** Native codegen'd dot product: bitwise parity with the HOF reference
  * implementation, SQL registration, null/edge handling. */
class ArrayDotProductSpec extends SparkSpec {

  import spark.implicits._

  test("native dot is bit-identical to the HOF reference on random vectors") {
    GraftFunctions.ensureRegistered(spark)
    val rng = new scala.util.Random(42)
    val rows = Seq.fill(200)((Array.fill(64)(rng.nextGaussian()),
      Array.fill(64)(rng.nextGaussian())))
    val df = rows.toDF("a", "b").select(
      VectorFunctions.dot(col("a"), col("b")).as("hof"),
      GraftFunctions.dotNative(col("a"), col("b")).as("native"))
    // exact equality: both accumulate sequentially in index order
    assert(df.filter(col("hof") =!= col("native")).count() === 0)
  }

  test("graft_dot is callable from SQL after registration") {
    GraftFunctions.ensureRegistered(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .as[Double].head()
    assert(r === 32.0)
  }

  test("float arrays are implicitly cast (embedding column shape)") {
    GraftFunctions.ensureRegistered(spark)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(5)
    val r = emb.select(GraftFunctions.dotNative(
      col("embedding"), col("embedding")).as("d")).as[Double].collect()
    r.foreach(v => assert(v > 0.0))
  }

  test("null array yields null, not a crash") {
    GraftFunctions.ensureRegistered(spark)
    val r = spark.sql(
      "SELECT graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS d").head()
    assert(r.isNullAt(0))
  }

  test("mismatched dimensions yield null (never silent truncation), in eval and codegen") {
    GraftFunctions.ensureRegistered(spark)
    // constant-folded path (interpreted eval)
    val folded = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(1.0d)) AS d").head()
    assert(folded.isNullAt(0))
    // column path (whole-stage codegen)
    val df = Seq((Array(1.0, 2.0, 3.0), Array(1.0, 2.0)))
      .toDF("a", "b")
      .select(GraftFunctions.dotNative(col("a"), col("b")).as("d"))
    assert(df.head().isNullAt(0))
    // equal dims still compute
    val ok = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
      .select(GraftFunctions.dotNative(col("a"), col("b")).as("d"))
      .as[Double].head()
    assert(ok === 11.0)
  }

  test("ensureRegistered is idempotent") {
    GraftFunctions.ensureRegistered(spark)
    GraftFunctions.ensureRegistered(spark)
    assert(spark.sql("SELECT graft_dot(array(1.0d), array(2.0d))").head().getDouble(0) === 2.0)
  }
}
