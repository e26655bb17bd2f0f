package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted ANN index artifact — the materialization story for the
  * vector-search family (the [[Postings]] economics applied to
  * embeddings): a real engine trains its IVF-PQ index ONCE, writes it
  * next to the corpus, and serves every later query from the artifact —
  * it does not re-derive codebooks per session the way the in-session
  * [[FramePool]] amortization does.
  *
  * The artifact is four plain parquet frames (no custom format — any
  * engine, including the DuckDB oracle, can read them):
  *   - `coarse`   (c_id, cv): IVF coarse-quantizer centroids
  *   - `codebook` (sub, code, cv): PQ per-subspace codebooks
  *   - `codes`    (vec_id, sub, code): per-vector PQ codes
  *   - `cells`    (vec_id, cluster_id): per-vector IVF cell assignment
  *
  * Scale shape: `codes`/`cells` are corpus-sized but narrow (three
  * integer-ish columns — the ~32× compression PQ exists for);
  * `coarse`/`codebook` are constant-size and broadcast at serve time.
  * [[searchTopK]] runs the exact q116 pipeline (cell-restricted
  * candidate join → integer ADC accumulation → per-query top-k window)
  * against the LOADED frames; PqSpec proves search-from-artifact is
  * row-identical to the live-trained search. */
object VectorIndex {

  final case class Frames(coarse: DataFrame, codebook: DataFrame,
                          codes: DataFrame, cells: DataFrame)

  /** Assemble the index frames from a corpus and trained quantizers.
    * `e` must carry (idCol, vecCol); `coarse` is (c_id, cv) over the
    * FULL vector, `codebook` (sub, code, cv) over subvectors. */
  def build(e: DataFrame, idCol: String, vecCol: String,
            m: Int, subDim: Int,
            coarse: DataFrame, codebook: DataFrame): Frames = {
    // Pq/Similarity contract the (vec_id, v) shape — rename up front
    val vecs = e.select(col(idCol).as("vec_id"), col(vecCol).as("v"))
    val sv = Pq.subvectors(vecs, "vec_id", "v", m, subDim)
    Frames(
      coarse = coarse,
      codebook = codebook,
      codes = Pq.encode(sv, codebook)
        .select(col("vec_id"), col("sub"), col("code")),
      cells = Similarity.ivfAssign(vecs, coarse)
        .select(col("vec_id"), col("cluster_id")))
  }

  /** Append a NEW vector batch to an existing index under FROZEN
    * quantizers — the ONLINE half of vector-index maintenance (the
    * offline half, retraining coarse/codebook, produces a new artifact;
    * production systems run exactly this split). Codes and cells are
    * per-vector functions of the frozen quantizer frames, so
    * `append(build(old), batch)` equals `build(old ∪ batch)` EXACTLY —
    * not approximately — which PqSpec proves and q189 oracle-gates.
    * The appended frames are plain unions: at artifact scale this is a
    * parquet append of the batch's narrow code/cell rows; nothing old
    * is rewritten or re-encoded. */
  def append(idx: Frames, newVecs: DataFrame, idCol: String, vecCol: String,
             m: Int, subDim: Int): Frames = {
    val add = build(newVecs, idCol, vecCol, m, subDim, idx.coarse, idx.codebook)
    Frames(idx.coarse, idx.codebook,
      codes = idx.codes.unionByName(add.codes),
      cells = idx.cells.unionByName(add.cells))
  }

  /** DELETE maintenance under frozen quantizers — the other online half
    * of index life next to [[append]]: drop the deleted ids' code and
    * cell rows (one anti-join per corpus-sized frame; at artifact scale,
    * a tombstone filter on the narrow frames). The quantizers are
    * membership-independent and encoding is per-vector, so
    * `delete(build(all), ids)` equals `build(all ∖ ids)` EXACTLY —
    * PqSpec-pinned, q212 oracle-gated. A deleted vector can still be
    * used as a QUERY (search assigns queries fresh against the coarse
    * quantizer); it just can't be retrieved. */
  def delete(idx: Frames, ids: DataFrame, idCol: String): Frames = {
    val del = ids.select(col(idCol).as("vec_id"))
    Frames(idx.coarse, idx.codebook,
      codes = idx.codes.join(del, Seq("vec_id"), "left_anti"),
      cells = idx.cells.join(del, Seq("vec_id"), "left_anti"))
  }

  def save(frames: Frames, dir: String): Unit = {
    frames.coarse.write.mode("overwrite").parquet(s"$dir/coarse")
    frames.codebook.write.mode("overwrite").parquet(s"$dir/codebook")
    frames.codes.write.mode("overwrite").parquet(s"$dir/codes")
    frames.cells.write.mode("overwrite").parquet(s"$dir/cells")
  }

  def load(spark: SparkSession, dir: String): Frames = Frames(
    coarse = spark.read.parquet(s"$dir/coarse"),
    codebook = spark.read.parquet(s"$dir/codebook"),
    codes = spark.read.parquet(s"$dir/codes"),
    cells = spark.read.parquet(s"$dir/cells"))

  /** IVF-cell-restricted PQ-ADC top-k over the index frames — q116's
    * serve pipeline, sourced from the artifact instead of in-session
    * training. `queries` carries (qIdCol, vecCol); candidates are the
    * indexed vectors sharing a query's IVF cell (minus the query itself
    * when ids collide), distances are the integer ADC accumulation, and
    * the final window is per-query. */
  def searchTopK(idx: Frames, queries: DataFrame, qIdCol: String,
                 vecCol: String, m: Int, subDim: Int, k: Int): DataFrame = {
    val qcells = Similarity.ivfAssign(
      queries.select(col(qIdCol).as("vec_id"), col(vecCol).as("v")),
      idx.coarse)
      .select(col("vec_id").as("q_id"), col("cluster_id"))
    val pairs = idx.cells.join(qcells, "cluster_id")
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"))
    val qsv = Pq.subvectors(
      queries.select(col(qIdCol).as("vec_id"), col(vecCol).as("v")),
      "vec_id", "v", m, subDim)
    val lut = Pq.adcLut(qsv, idx.codebook)
    Pq.adcTopK(Pq.adcDistances(pairs, idx.codes, lut), k)
  }
}
