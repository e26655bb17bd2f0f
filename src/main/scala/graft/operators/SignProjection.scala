package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss sign (Rademacher) random projection — the
  * dimensionality-reduction step a 100 TB embedding pipeline runs BEFORE
  * any pairwise work (near-dup candidate generation, clustering, dedup
  * sweeps): project d-dim vectors onto k ≪ d ±1 directions, cutting every
  * downstream distance computation by d/k while preserving pairwise
  * squared distances in expectation (E[(Δy_j)²] = ‖Δx‖² exactly for
  * Rademacher signs; Achlioptas 2003 gives the JL concentration).
  *
  * Determinism contract: the sign matrix derives from md5 parity, not an
  * RNG — both engines rebuild the identical matrix from the cell's
  * (pos, j) label, so projected values are engine-exact integers on the
  * same 10⁶ grid as the component frame (no float matmul, no seed
  * plumbing). Scale shape: the matrix is d·k rows (broadcast); the
  * projection is ONE map-side-combined pass over the persisted component
  * frame — never a shuffle wider than (id, j).
  */
object SignProjection {

  /** Deterministic ±1 sign matrix (pos, j, s): s = +1 when the first hex
    * digit of md5("<pos>_<j>") is even, −1 otherwise. DuckDB replays it
    * as `('0x' || substr(md5(pos || '_' || j), 1, 1))::BIGINT % 2`. */
  def signMatrix(spark: SparkSession, dim: Int, k: Int): DataFrame = {
    require(dim > 0 && k > 0, s"signMatrix: dim=$dim k=$k must be > 0")
    import spark.implicits._
    val cells = for (p <- 0 until dim; j <- 0 until k) yield (p, j.toLong)
    cells.toDF("pos", "j")
      .withColumn("s",
        when(conv(substring(md5(concat_ws("_", col("pos"), col("j"))),
            1, 1), 16, 10).cast("long") % 2 === 0, lit(1L))
          .otherwise(lit(-1L)))
  }

  /** Project every vector onto the k sign directions: one row per
    * (id, j) with y = Σ_p s(p,j)·q_p on the 10⁶ component grid
    * (|y| ≤ d·2·10⁶ under the componentFrame magnitude contract —
    * far inside BIGINT). */
  def project(vectors: DataFrame, idCol: String, vecCol: String,
              k: Int): DataFrame = {
    val (comp, _) = Similarity.componentFrame(vectors, idCol, vecCol)
    val dimRow = comp.agg(max(col("pos"))).head
    require(!dimRow.isNullAt(0), "project: empty vector corpus")
    val dim = dimRow.getInt(0) + 1
    val sm = broadcast(signMatrix(vectors.sparkSession, dim, k))
    comp.join(sm, "pos")
      .groupBy(col("vid"), col("j"))
      .agg(sum(col("s") * col("q")).as("y"))
      .select(col("vid").as(idCol), col("j"), col("y"))
  }
}
