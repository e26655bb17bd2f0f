package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.plans.GraftFunctions

/** Similarity-search operators over (idCol, vector array<double>) tables.
  *
  * Brute force is the exactness baseline: O(Q·N) with the query side
  * broadcast, one streaming pass over the corpus. The ANN variants replace
  * the cross join with an equi-join on a derived key (LSH bucket / IVF
  * cluster) — candidates shrink to one bucket and the shuffle partitions by
  * that key, which is what survives a 100× scale-up.
  */
object Similarity {

  /** Cosine via the codegen'd native dot expression (ArrayDotProduct) —
    * bit-identical to VectorFunctions.cosine (same sequential double
    * accumulation), minus the interpreted per-element lambda dispatch. */
  private def cosineNative(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    GraftFunctions.dotNative(a, b) /
      (sqrt(GraftFunctions.dotNative(a, a)) * sqrt(GraftFunctions.dotNative(b, b)))

  private def l2sqNative(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    GraftFunctions.dotNative(a, a) - lit(2.0) * GraftFunctions.dotNative(a, b) +
      GraftFunctions.dotNative(b, b)

  /** Exact cosine top-k neighbors for each query vector. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    GraftFunctions.ensureRegistered(corpus.sparkSession)
    val w = Window.partitionBy(col("q_id")).orderBy(desc("cos"), col("neighbor_id"))
    corpus.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        cosineNative(col("qv"), col("v")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** LSH ANN: bucket both sides with signed random projections, equi-join
    * on bucket, rank within bucket. */
  def lshTopK(corpus: DataFrame, numPlanes: Int, dim: Int, k: Int,
              queryPred: org.apache.spark.sql.Column): DataFrame = {
    GraftFunctions.ensureRegistered(corpus.sparkSession)
    val planes = gaussianPlanes(numPlanes, dim)
    val bucketed = corpus.withColumn("bucket", lshBucket(col("v"), planes))
    val q = bucketed.filter(queryPred)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("bucket"))
    val w = Window.partitionBy(col("q_id")).orderBy(desc("cos"), col("neighbor_id"))
    bucketed.join(q, "bucket")
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("bucket"), col("vec_id").as("neighbor_id"),
        cosineNative(col("qv"), col("v")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF-style assignment: nearest of the broadcast centroids per vector
    * (same dot-product composition as any SQL oracle → stable argmin). */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    GraftFunctions.ensureRegistered(corpus.sparkSession)
    val w = Window.partitionBy(col("vec_id")).orderBy(col("dist"), col("c_id"))
    corpus.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("v"), col("c_id"), l2sqNative(col("v"), col("cv")).as("dist"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("v"), col("c_id").as("cluster_id"), col("dist"))
  }
}
