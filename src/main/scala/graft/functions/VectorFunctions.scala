package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector primitives over `array<float>` embedding columns, built from
  * higher-order functions (zip_with / aggregate) so they run inside
  * codegen'd projections — no UDF serialization on the 100 TB path.
  *
  * Determinism contract: all arithmetic is double, accumulated
  * left-to-right in index order — the same reduction order DuckDB's
  * list_dot_product uses, so cosine values are reproducible cross-engine.
  * Cast float arrays up front ([[asDouble]]): float×float would round at
  * single precision and drift from any double-based oracle.
  */
object VectorFunctions {

  /** Cast array<float> → array<double> (exact per element). */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Sequential left-fold dot product in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity: dot / (|a| * |b|) — the exact formula the oracle
    * mirrors (sqrt-of-each, then multiply; not sqrt-of-product). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance via the dot-product identity |a|²-2a·b+|b|².
    * Used instead of sum((a-b)²) so Spark and the oracle compose the SAME
    * three dot products — identical floating-point result, stable argmins. */
  def l2sq(a: Column, b: Column): Column =
    dot(a, a) - lit(2.0) * dot(a, b) + dot(b, b)

  /** Signed-random-projection LSH bucket id: bit j set iff v·plane_j > 0.
    * With P planes, 2^P buckets; same-bucket vectors are ANN candidates.
    * The planes are driver-side constants broadcast as literals — no
    * shuffle to compute buckets, one equi-join shuffle to pair them. */
  def lshBucket(v: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      val planeCol = array(p.map(lit(_)): _*)
      when(dot(v, planeCol) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Deterministic Gaussian hyperplanes (fixed seed) for [[lshBucket]]. */
  def gaussianPlanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Array.fill(dim)(rng.nextGaussian()))
  }

  /** DuckDB twin of [[lshBucket]]: renders the planes as SQL list literals.
    * Scala's Double.toString emits the shortest decimal that round-trips,
    * so DuckDB parses back bit-identical IEEE doubles; list_dot_product
    * folds left like [[dot]], so every projection sign — hence every
    * bucket id — matches Spark's exactly, making SRP-bucketed queries
    * fully oracle-checkable. */
  def lshBucketSql(vExpr: String, planes: Seq[Array[Double]]): String =
    planes.zipWithIndex.map { case (p, j) =>
      s"(CASE WHEN list_dot_product($vExpr, ${p.mkString("[", ", ", "]")}::DOUBLE[]) > 0" +
        s" THEN (1::BIGINT << $j) ELSE 0::BIGINT END)"
    }.mkString("(", " + ", ")")
}
