package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Pq, Similarity}
import Q._

/** Product quantization, oracle-gated end to end: deterministic codebook
  * training (fixed-point Lloyd step per subspace), encoding with exact
  * integer quantization-error accounting, and IVF-cell-restricted ADC
  * search. Geometry: 64-dim embeddings → m=4 subspaces × 16 dims, k=8
  * codes per subspace (64 floats → 4 bytes, 64×), codebooks seeded from
  * the first 8 vectors' subvectors. Everything downstream of the
  * fixed-point grid is BIGINT arithmetic, so all three queries hash-match
  * a DuckDB oracle that re-derives the same codebooks symbolically.
  */
object PqQueries {

  private val M = 4
  private val SubDim = 16
  private val K = 8

  private def vecs(s: SparkSession, d: String) =
    t(s, d, "embeddings").select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))

  /** (sv, cb0, cb1): shared pipeline head — subvectors, seeded codebook,
    * one-step-refined codebook (empty codes fall back to their seed).
    * Pooled across the whole PQ family ([[graft.operators.FramePool]]):
    * codebook training is a train-once-serve-many artifact, and
    * q114/q115/q116/q126 each start from this identical head. */
  private def trained(s: SparkSession, d: String): (DataFrame, DataFrame, DataFrame) = {
    val Seq(sv, cb0, cb1) = graft.operators.FramePool.frames(s"pq-trained:$d") {
      val sv = Pq.subvectors(vecs(s, d), "vec_id", "v", M, SubDim)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cb0 = sv.filter(col("vec_id") < K)
        .select(col("sub"), col("vec_id").as("code"), col("sv").as("cv"))
      // localCheckpoint truncates the train-step lineage: cb1 is m·k
      // rows but its PLAN embeds the whole Lloyd step over the corpus,
      // and every downstream stage (encode, LUT, search) re-serializes
      // that subtree into its task binary — measured 8.2 MiB task
      // binaries on the q116 search stages, cut to <2 MiB by
      // checkpointing here. A train-once artifact is data, not lineage.
      val cb1 = Pq.codebookFromStep(Pq.trainStep(sv, cb0), Some(cb0))
        .localCheckpoint(true)
      Seq(sv, cb0, cb1)
    }
    (sv, cb0, cb1)
  }

  /** IVF cell assignment against the 8-seed coarse quantizer — the other
    * half of the q116/q126 shared head, pooled for the same reason. */
  private def ivfCells(s: SparkSession, d: String): DataFrame =
    graft.operators.FramePool.frames(s"pq-cells:$d") {
      val e = vecs(s, d)
      val coarse = e.filter(col("vec_id") < K)
        .select(col("vec_id").as("c_id"), col("v").as("cv"))
      Seq(Similarity.ivfAssign(e, coarse)
        .select(col("vec_id"), col("cluster_id"))
        // corpus-sized but 2 ints wide; checkpointing stops the assign
        // window's plan from riding into every cell-join task binary
        .localCheckpoint(true))
    }.head

  /** PQ-encoded corpus (vec_id, sub, code, qdist), pooled and
    * lineage-truncated: the codes ARE the stored index of a PQ system —
    * persisting them with their full encode lineage made every search
    * stage's task binary re-serialize the assign-window subtree
    * (measured: q116's ADC join stages at 5-8 MiB; scheduler/network
    * pressure at thousands of tasks). Checkpointed codes are data, and
    * the search stages drop to well under the 2 MiB warning band. */
  private def encoded(s: SparkSession, d: String): DataFrame =
    graft.operators.FramePool.frames(s"pq-enc:$d") {
      val (sv, _, cb1) = trained(s, d)
      Seq(Pq.encode(sv, cb1).localCheckpoint(true))
    }.head

  // ---- shared oracle scaffolding (DuckDB CTEs mirroring `trained`) ----

  private val svSql =
    """e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |sv AS (SELECT vec_id, sub, v[sub*16+1:(sub+1)*16] AS sv
      |       FROM e CROSS JOIN (SELECT unnest(range(4)) AS sub)),
      |cb0 AS (SELECT sub, vec_id AS code, sv AS cv FROM sv WHERE vec_id < 8)""".stripMargin

  /** Argmin-by-(dist, code) assignment of every subvector to codebook
    * `cb` — the SQL twin of [[Pq.assign]] (same l2 composition from three
    * dot products, same tie order). */
  private def assignSql(cb: String): String =
    s"""(SELECT vec_id, sub, sv, code, dist FROM (
       |    SELECT s.vec_id, s.sub, s.sv, c.code,
       |      list_dot_product(s.sv, s.sv) - 2.0*list_dot_product(s.sv, c.cv)
       |        + list_dot_product(c.cv, c.cv) AS dist,
       |      row_number() OVER (PARTITION BY s.vec_id, s.sub
       |        ORDER BY list_dot_product(s.sv, s.sv) - 2.0*list_dot_product(s.sv, c.cv)
       |          + list_dot_product(c.cv, c.cv), c.code) AS rn
       |    FROM sv s JOIN $cb c USING (sub)) WHERE rn = 1)""".stripMargin

  /** One fixed-point Lloyd step over cb0 → refreshed codebook cb1. */
  private val cb1Sql =
    s"""a0 AS ${assignSql("cb0")},
       |x AS (SELECT sub, code, i - 1 AS dim,
       |        CAST(floor(sv[i] * 1000000 + 0.5) AS BIGINT) AS q
       |      FROM (SELECT sub, code, sv, unnest(range(1, len(sv) + 1)) AS i FROM a0)),
       |step AS (SELECT sub, code, dim,
       |    (CAST(CAST(sum(q) AS BIGINT) AS DOUBLE) / count(*)) / 1000000 AS c_new,
       |    count(*) AS n_members
       |  FROM x GROUP BY sub, code, dim),
       |cb1u AS (SELECT sub, code, list(c_new ORDER BY dim) AS cv
       |         FROM step GROUP BY sub, code),
       |cb1 AS (SELECT c0.sub, c0.code, COALESCE(u.cv, c0.cv) AS cv
       |        FROM cb0 c0 LEFT JOIN cb1u u ON u.sub = c0.sub AND u.code = c0.code)""".stripMargin

  /** The full IVF-PQ-ADC search oracle (cells from the 8-seed coarse
    * quantizer, cb1 codes, integer ADC distances, per-query top-3) —
    * shared by q116 (live-trained pipeline) and q189 (the same search
    * served from an APPEND-maintained index: frozen-quantizer append is
    * exactly a full build, so the two queries must hash-match the same
    * recompute). */
  private lazy val ivfAdcSearchSql: String =
    s"""WITH $svSql,
       |$cb1Sql,
       |enc AS (SELECT vec_id, sub, code FROM ${assignSql("cb1")} t),
       |cells AS (SELECT vec_id, c_id AS cluster_id FROM (
       |    SELECT e.vec_id, c.vec_id AS c_id,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY list_dot_product(e.v, e.v) - 2.0*list_dot_product(e.v, c.v)
       |          + list_dot_product(c.v, c.v), c.vec_id) AS rn
       |    FROM e CROSS JOIN (SELECT vec_id, v FROM e WHERE vec_id < 8) c)
       |  WHERE rn = 1),
       |pairs AS (SELECT q.vec_id AS q_id, x.vec_id AS neighbor_id
       |          FROM cells x JOIN cells q USING (cluster_id)
       |          WHERE q.vec_id < 5 AND x.vec_id <> q.vec_id),
       |lut AS (SELECT s.vec_id AS q_id, s.sub, c.code,
       |          CAST(floor((list_dot_product(s.sv, s.sv)
       |            - 2.0*list_dot_product(s.sv, c.cv)
       |            + list_dot_product(c.cv, c.cv)) * 1000000 + 0.5) AS BIGINT) AS qd
       |        FROM sv s JOIN cb1 c USING (sub) WHERE s.vec_id < 5),
       |dists AS (SELECT p.q_id, p.neighbor_id,
       |            CAST(sum(l.qd) AS BIGINT) AS adc_qdist
       |          FROM pairs p
       |          JOIN enc n ON n.vec_id = p.neighbor_id
       |          JOIN lut l ON l.q_id = p.q_id AND l.sub = n.sub AND l.code = n.code
       |          GROUP BY p.q_id, p.neighbor_id),
       |ranked AS (SELECT q_id, neighbor_id, adc_qdist,
       |             row_number() OVER (PARTITION BY q_id
       |               ORDER BY adc_qdist, neighbor_id) AS rank
       |           FROM dists)
       |SELECT q_id, rank, neighbor_id, adc_qdist
       |FROM ranked WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin

  val specs: Seq[QuerySpec] = Seq(

    // PQ codebook training step: per-subspace fixed-point Lloyd update
    // (q94's bit-reproducible kmeans step generalized with the subspace
    // key). The full refreshed codebook is hash-checked entry by entry.
    QuerySpec("q114_pq_train",
      (s, d) => {
        val (sv, cb0, _) = trained(s, d)
        Pq.trainStep(sv, cb0)
          .select(col("sub").cast("long").as("sub"), col("code"), col("dim"),
            col("c_new"), col("n_members"))
          .orderBy("sub", "code", "dim")
      },
      Some(s"""WITH $svSql,
              |a0 AS ${assignSql("cb0")},
              |x AS (SELECT sub, code, i - 1 AS dim,
              |        CAST(floor(sv[i] * 1000000 + 0.5) AS BIGINT) AS q
              |      FROM (SELECT sub, code, sv, unnest(range(1, len(sv) + 1)) AS i FROM a0))
              |SELECT CAST(sub AS BIGINT) AS sub, code, dim,
              |  (CAST(CAST(sum(q) AS BIGINT) AS DOUBLE) / count(*)) / 1000000 AS c_new,
              |  count(*) AS n_members
              |FROM x GROUP BY sub, code, dim
              |ORDER BY sub, code, dim""".stripMargin)),

    // PQ encode + exact reconstruction-error accounting: every vector's
    // quantization error is the INTEGER sum of its m subspace errors on
    // the fixed-point grid, so the per-label roll-up (the compression
    // quality report a 100 TB vector store watches) is order-independent
    // and hash-exact.
    QuerySpec("q115_pq_encode",
      (s, d) => {
        val (sv, _, cb1) = trained(s, d)
        val perVec = Pq.encode(sv, cb1)
          .groupBy(col("vec_id"))
          .agg(sum(col("qdist")).as("qerr"))
        perVec.join(t(s, d, "embeddings").select(col("vec_id"), col("label")),
          "vec_id")
          .groupBy(col("label"))
          .agg(count(lit(1)).as("n_vecs"), sum(col("qerr")).as("sum_qerr"),
            max(col("qerr")).as("max_qerr"))
          .orderBy("label")
      },
      Some(s"""WITH $svSql,
              |$cb1Sql,
              |enc AS (SELECT vec_id,
              |          CAST(floor(dist * 1000000 + 0.5) AS BIGINT) AS qdist
              |        FROM ${assignSql("cb1")} t),
              |pv AS (SELECT vec_id, CAST(sum(qdist) AS BIGINT) AS qerr
              |       FROM enc GROUP BY vec_id)
              |SELECT label, count(*) AS n_vecs,
              |  CAST(sum(qerr) AS BIGINT) AS sum_qerr, max(qerr) AS max_qerr
              |FROM pv JOIN embeddings USING (vec_id)
              |GROUP BY label ORDER BY label""".stripMargin)),

    // IVF + ADC search: queries and corpus coarse-assign to IVF cells
    // (broadcast centroids), candidates = same cell only; each candidate's
    // distance is the integer sum of m LUT lookups — the query side stays
    // full-precision, the corpus side never touches a float. The complete
    // IVF-PQ search path, hash-checked (codes, cells, LUT, ranks — all of
    // it) against DuckDB.
    QuerySpec("q116_pq_adc_ivf",
      (s, d) => {
        val (sv, _, cb1) = trained(s, d)
        val cells = ivfCells(s, d)
        val qcells = cells.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("cluster_id"))
        val pairs = cells.join(qcells, "cluster_id")
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id").as("neighbor_id"))
        // tiny (|queries|·m·k rows); checkpoint so the broadcast build
        // side's plan doesn't ride into the ADC join's task binary
        val lut = Pq.adcLut(sv.filter(col("vec_id") < 5), cb1)
          .localCheckpoint(true)
        Pq.adcTopK(Pq.adcDistances(pairs, encoded(s, d), lut), 3)
          .select(col("q_id"), col("rank").cast("long").as("rank"),
            col("neighbor_id"), col("adc_qdist"))
          .orderBy("q_id", "rank")
      },
      Some(ivfAdcSearchSql)),

    // Two-stage retrieval, end to end: IVF-cell + PQ-ADC coarse recall
    // (q116's pipeline, widened to top-10 candidates) followed by an
    // exact-cosine re-rank to top-3 (Similarity.rerankExact). The
    // full-precision math runs on 10 candidates per query, never the
    // corpus; compressed-domain ranks reorder under exact distance — that
    // reordering is the thing this query pins cross-engine.
    QuerySpec("q126_ann_rerank",
      (s, d) => {
        val (sv, _, cb1) = trained(s, d)
        val e = vecs(s, d)
        val cells = ivfCells(s, d)
        val qcells = cells.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("cluster_id"))
        val pairs = cells.join(qcells, "cluster_id")
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id").as("neighbor_id"))
        val lut = Pq.adcLut(sv.filter(col("vec_id") < 5), cb1)
          .localCheckpoint(true)
        val cands = Pq.adcTopK(Pq.adcDistances(pairs, encoded(s, d), lut), 10)
        val queries = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("v").as("qv"))
        Similarity.rerankExact(cands, e, queries, 3)
          .select(col("q_id"), col("rank").cast("long").as("rank"),
            col("neighbor_id"), round(col("cos"), 4).as("cos4"))
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH $svSql,
              |$cb1Sql,
              |enc AS (SELECT vec_id, sub, code FROM ${assignSql("cb1")} t),
              |cells AS (SELECT vec_id, c_id AS cluster_id FROM (
              |    SELECT e.vec_id, c.vec_id AS c_id,
              |      row_number() OVER (PARTITION BY e.vec_id
              |        ORDER BY list_dot_product(e.v, e.v) - 2.0*list_dot_product(e.v, c.v)
              |          + list_dot_product(c.v, c.v), c.vec_id) AS rn
              |    FROM e CROSS JOIN (SELECT vec_id, v FROM e WHERE vec_id < 8) c)
              |  WHERE rn = 1),
              |pairs AS (SELECT q.vec_id AS q_id, x.vec_id AS neighbor_id
              |          FROM cells x JOIN cells q USING (cluster_id)
              |          WHERE q.vec_id < 5 AND x.vec_id <> q.vec_id),
              |lut AS (SELECT s.vec_id AS q_id, s.sub, c.code,
              |          CAST(floor((list_dot_product(s.sv, s.sv)
              |            - 2.0*list_dot_product(s.sv, c.cv)
              |            + list_dot_product(c.cv, c.cv)) * 1000000 + 0.5) AS BIGINT) AS qd
              |        FROM sv s JOIN cb1 c USING (sub) WHERE s.vec_id < 5),
              |dists AS (SELECT p.q_id, p.neighbor_id,
              |            CAST(sum(l.qd) AS BIGINT) AS adc_qdist
              |          FROM pairs p
              |          JOIN enc n ON n.vec_id = p.neighbor_id
              |          JOIN lut l ON l.q_id = p.q_id AND l.sub = n.sub AND l.code = n.code
              |          GROUP BY p.q_id, p.neighbor_id),
              |cand AS (SELECT q_id, neighbor_id FROM (
              |    SELECT q_id, neighbor_id,
              |      row_number() OVER (PARTITION BY q_id
              |        ORDER BY adc_qdist, neighbor_id) AS rank
              |    FROM dists) WHERE rank <= 10),
              |rer AS (SELECT c.q_id, c.neighbor_id,
              |          list_dot_product(qe.v, ne.v) /
              |            (sqrt(list_dot_product(qe.v, qe.v)) *
              |             sqrt(list_dot_product(ne.v, ne.v))) AS cos
              |        FROM cand c
              |        JOIN e qe ON qe.vec_id = c.q_id
              |        JOIN e ne ON ne.vec_id = c.neighbor_id)
              |SELECT q_id, rank, neighbor_id, round(cos, 4) AS cos4 FROM (
              |  SELECT q_id, neighbor_id, cos,
              |    row_number() OVER (PARTITION BY q_id
              |      ORDER BY cos DESC, neighbor_id) AS rank
              |  FROM rer) WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin)),

    // Vector-index APPEND maintenance, oracle-gated: the index is built
    // over 90% of the corpus, the held-out 10% (vec_id % 10 = 7) is
    // APPENDED under frozen quantizers (VectorIndex.append — the online
    // half of index maintenance; retraining is the offline half), and
    // the q116 search runs against the appended frames. Frozen-quantizer
    // encoding/assignment is per-vector, so append ≡ full build EXACTLY
    // — which is why this query shares q116's oracle verbatim: the
    // append-maintained index must hash-match the same full-corpus
    // recompute. The text-index twin is q147's partial merge.
    QuerySpec("q189_vector_index_append",
      (s, d) => {
        val (_, _, cb1) = trained(s, d)
        val e = vecs(s, d)
        val coarse = e.filter(col("vec_id") < K)
          .select(col("vec_id").as("c_id"), col("v").as("cv"))
        val oldIdx = graft.operators.VectorIndex.build(
          e.filter(col("vec_id") % 10 =!= 7), "vec_id", "v", M, SubDim,
          coarse, cb1)
        val idx = graft.operators.VectorIndex.append(
          oldIdx, e.filter(col("vec_id") % 10 === 7), "vec_id", "v", M, SubDim)
        graft.operators.VectorIndex.searchTopK(idx,
            e.filter(col("vec_id") < 5), "vec_id", "v", M, SubDim, k = 3)
          .select(col("q_id"), col("rank").cast("long").as("rank"),
            col("neighbor_id"), col("adc_qdist"))
          .orderBy("q_id", "rank")
      },
      Some(ivfAdcSearchSql)),

    // Vector-index DELETE maintenance, oracle-gated — q189's other half:
    // the index is built over the FULL corpus, the vec_id % 10 = 3 ids
    // are DELETED (VectorIndex.delete — an anti-join dropping their
    // code/cell rows; the frozen quantizers are membership-independent,
    // so delete ≡ build-over-remaining EXACTLY), and the q116 search
    // runs against the pruned frames. The oracle is q116's pipeline with
    // the deleted ids excluded from the INDEX side only: queries keep
    // their fresh coarse assignment — a deleted doc can still query, it
    // just can't be retrieved. With append (q189) and the persisted
    // artifact (q140/PqSpec save-load), the online index lifecycle is
    // now closed under both mutations.
    QuerySpec("q212_vector_index_delete",
      (s, d) => {
        val (_, _, cb1) = trained(s, d)
        val e = vecs(s, d)
        val coarse = e.filter(col("vec_id") < K)
          .select(col("vec_id").as("c_id"), col("v").as("cv"))
        val full = graft.operators.VectorIndex.build(
          e, "vec_id", "v", M, SubDim, coarse, cb1)
        val idx = graft.operators.VectorIndex.delete(full,
          e.filter(col("vec_id") % 10 === 3), "vec_id")
        graft.operators.VectorIndex.searchTopK(idx,
            e.filter(col("vec_id") < 5), "vec_id", "v", M, SubDim, k = 3)
          .select(col("q_id"), col("rank").cast("long").as("rank"),
            col("neighbor_id"), col("adc_qdist"))
          .orderBy("q_id", "rank")
      },
      Some {
        // q116's oracle with the deletion applied to the index (x) side
        // of the candidate join only
        val marker = "WHERE q.vec_id < 5 AND x.vec_id <> q.vec_id"
        require(ivfAdcSearchSql.contains(marker),
          "q212 oracle: q116 candidate-join marker not found")
        ivfAdcSearchSql.replace(marker,
          marker + " AND x.vec_id % 10 <> 3")
      })
  )
}
