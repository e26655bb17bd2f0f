package graft

import org.apache.spark.sql.functions._

import graft.operators.Pq

/** Product quantization: encode totality/range, Lloyd-step monotonicity,
  * and an INDEPENDENT plain-Scala recomputation of ADC distances (the
  * oracle checks Spark-vs-DuckDB; this checks Spark-vs-hand-math). */
class PqSpec extends SparkSpec {

  import spark.implicits._

  private val M = 4
  private val SubDim = 16

  private lazy val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
  private lazy val sv = Pq.subvectors(e, "vec_id", "v", M, SubDim)
  private lazy val cb0 = sv.filter(col("vec_id") < 8)
    .select(col("sub"), col("vec_id").as("code"), col("sv").as("cv"))
  private lazy val cb1 = Pq.codebookFromStep(Pq.trainStep(sv, cb0), Some(cb0))

  test("encode emits exactly one in-range code per (vector, subspace)") {
    val n = e.count()
    val codes = Pq.encode(sv, cb1)
    assert(codes.count() === n * M)
    assert(codes.groupBy("vec_id", "sub").count()
      .filter(col("count") =!= 1).count() === 0)
    assert(codes.filter(col("code") < 0 || col("code") >= 8).count() === 0)
    assert(codes.select("sub").distinct().count() === M)
  }

  test("one fixed-point Lloyd step does not increase total quantization error") {
    def totalErr(cb: org.apache.spark.sql.DataFrame): Long =
      Pq.encode(sv, cb).agg(sum("qdist")).head().getLong(0)
    val before = totalErr(cb0)
    val after = totalErr(cb1)
    // exact Lloyd is monotone; the 1e-6 fixed-point snap can cost at most
    // rounding slack, bounded here at 0.01%
    assert(after <= before + before / 10000,
      s"training step worsened quantization error: $before -> $after")
    assert(after < before, "step should strictly improve on this fixture")
  }

  test("ADC distances equal an independent plain-Scala recomputation") {
    def dot(a: Seq[Double], b: Seq[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    val cb = cb1.as[(Int, Long, Seq[Double])].collect()
      .map { case (s, c, v) => (s, c) -> v }.toMap
    val codes = Pq.encode(sv, cb1).select("vec_id", "sub", "code")
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    val qsv = sv.filter(col("vec_id") < 3).as[(Long, Int, Seq[Double])].collect()
      .groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap

    val pairs = (for (q <- qsv.keys; n <- codes.keys.take(50) if n != q)
      yield (q, n)).toSeq
    val expected = pairs.map { case (q, n) =>
      val d = (0 until M).map { s =>
        val a = qsv(q)(s); val c = cb((s, codes(n)(s)))
        val l2 = dot(a, a) - 2.0 * dot(a, c) + dot(c, c)
        math.floor(l2 * 1000000 + 0.5).toLong
      }.sum
      (q, n) -> d
    }.toMap

    val lut = Pq.adcLut(sv.filter(col("vec_id") < 3), cb1)
    val got = Pq.adcDistances(pairs.toDF("q_id", "neighbor_id"),
        Pq.encode(sv, cb1), lut)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (k, v) => assert(v === expected(k), s"pair $k") }
  }

  test("search from the saved/loaded index artifact equals the live pipeline") {
    import graft.operators.{Similarity, VectorIndex}
    val dir = java.nio.file.Files.createTempDirectory("vecidx").toString
    val coarse = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("c_id"), col("v").as("cv"))
    VectorIndex.save(
      VectorIndex.build(e, "vec_id", "v", M, SubDim, coarse, cb1), dir)
    val queries = e.filter(col("vec_id") < 5)
    val fromArtifact = VectorIndex
      .searchTopK(VectorIndex.load(spark, dir), queries, "vec_id", "v",
        M, SubDim, k = 3)
      .select("q_id", "rank", "neighbor_id", "adc_qdist")
      .as[(Long, Int, Long, Long)].collect().toSeq.sorted
    // live pipeline: the q116 composition straight from the session frames
    val cells = Similarity.ivfAssign(e, coarse)
      .select(col("vec_id"), col("cluster_id"))
    val qcells = cells.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("cluster_id"))
    val pairs = cells.join(qcells, "cluster_id")
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"))
    val live = Pq.adcTopK(
        Pq.adcDistances(pairs, Pq.encode(sv, cb1),
          Pq.adcLut(sv.filter(col("vec_id") < 5), cb1)), 3)
      .select("q_id", "rank", "neighbor_id", "adc_qdist")
      .as[(Long, Int, Long, Long)].collect().toSeq.sorted
    assert(fromArtifact === live)
    assert(fromArtifact.nonEmpty)
    // the artifact is plain parquet any engine can read
    assert(spark.read.parquet(s"$dir/codes").columns.toSet
      === Set("vec_id", "sub", "code"))
  }

  test("append under frozen quantizers equals a full rebuild, through save/load") {
    import graft.operators.VectorIndex
    val coarse = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("c_id"), col("v").as("cv"))
    val oldIdx = VectorIndex.build(
      e.filter(col("vec_id") % 10 =!= 7), "vec_id", "v", M, SubDim, coarse, cb1)
    val appended = VectorIndex.append(
      oldIdx, e.filter(col("vec_id") % 10 === 7), "vec_id", "v", M, SubDim)
    // round-trip the appended index through the artifact form too
    val dir = java.nio.file.Files.createTempDirectory("vecidx_app").toString
    VectorIndex.save(appended, dir)
    val queries = e.filter(col("vec_id") < 5)
    def results(ix: VectorIndex.Frames) = VectorIndex
      .searchTopK(ix, queries, "vec_id", "v", M, SubDim, k = 3)
      .select("q_id", "rank", "neighbor_id", "adc_qdist")
      .as[(Long, Int, Long, Long)].collect().toSeq.sorted
    val full = results(VectorIndex.build(e, "vec_id", "v", M, SubDim, coarse, cb1))
    assert(results(appended) === full)
    assert(results(VectorIndex.load(spark, dir)) === full)
    assert(full.nonEmpty)
    // the batch genuinely added rows to the narrow frames
    assert(appended.codes.count() > oldIdx.codes.count())
  }

  test("delete under frozen quantizers equals a rebuild over the remainder") {
    import graft.operators.VectorIndex
    val coarse = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("c_id"), col("v").as("cv"))
    val full = VectorIndex.build(e, "vec_id", "v", M, SubDim, coarse, cb1)
    val deleted = VectorIndex.delete(
      full, e.filter(col("vec_id") % 10 === 3), "vec_id")
    // frame-level: the pruned frames equal a fresh build on the remainder
    val rebuilt = VectorIndex.build(
      e.filter(col("vec_id") % 10 =!= 3), "vec_id", "v", M, SubDim,
      coarse, cb1)
    def codeSet(ix: VectorIndex.Frames) =
      ix.codes.collect().map(_.toSeq).toSet
    def cellSet(ix: VectorIndex.Frames) =
      ix.cells.collect().map(_.toSeq).toSet
    assert(codeSet(deleted) === codeSet(rebuilt))
    assert(cellSet(deleted) === cellSet(rebuilt))
    // search-level, through the artifact round-trip; a DELETED id still
    // works as a query (vec_id 3 is both deleted and in the query set)
    // but never appears as a neighbor
    val dir = java.nio.file.Files.createTempDirectory("vecidx_del").toString
    VectorIndex.save(deleted, dir)
    val queries = e.filter(col("vec_id") < 5)
    def results(ix: VectorIndex.Frames) = VectorIndex
      .searchTopK(ix, queries, "vec_id", "v", M, SubDim, k = 3)
      .select("q_id", "rank", "neighbor_id", "adc_qdist")
      .as[(Long, Int, Long, Long)].collect().toSeq.sorted
    val got = results(VectorIndex.load(spark, dir))
    assert(got === results(rebuilt))
    assert(got.nonEmpty)
    assert(got.map(_._1).distinct.contains(3L))
    assert(!got.exists(_._3 % 10 == 3))
  }
}
