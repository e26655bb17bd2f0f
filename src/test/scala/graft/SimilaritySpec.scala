package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.operators.Similarity

/** Vector primitives + brute-force/LSH/IVF search operators. */
class SimilaritySpec extends SparkSpec {

  import spark.implicits._

  private def randVec(seed: Int, dim: Int = 32): Array[Double] = {
    val rng = new scala.util.Random(seed)
    Array.fill(dim)(rng.nextGaussian())
  }

  private def perturb(v: Array[Double], eps: Double, seed: Int): Array[Double] = {
    val rng = new scala.util.Random(seed)
    v.map(_ + eps * rng.nextGaussian())
  }

  test("cosine of a vector with itself is 1; with its negation -1") {
    val v = randVec(1)
    val df = Seq((v, v.map(-_))).toDF("a", "b")
    val r = df.select(cosine(col("a"), col("a")).as("s"),
      cosine(col("a"), col("b")).as("n")).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1) + 1.0) < 1e-12)
  }

  test("dot/l2sq match direct computation") {
    val a = Array(1.0, 2.0, 3.0); val b = Array(4.0, 5.0, 6.0)
    val r = Seq((a, b)).toDF("a", "b")
      .select(dot(col("a"), col("b")), l2sq(col("a"), col("b"))).head()
    assert(r.getDouble(0) === 32.0)
    assert(r.getDouble(1) === 27.0) // 9+9+9
  }

  test("bruteForceTopK: planted twin is always the rank-1 neighbor") {
    val base = (0 until 50).map(i => (i.toLong, randVec(i)))
    val twins = (0 until 5).map(i => ((100 + i).toLong, perturb(randVec(i), 0.01, 999 + i)))
    val corpus = (base ++ twins).toDF("vec_id", "v")
    val queries = base.take(5).map { case (id, v) => (id, v) }
      .toDF("q_id", "qv")
    val top1 = Similarity.bruteForceTopK(corpus, queries, 1)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toMap
    (0 until 5).foreach(i => assert(top1(i.toLong) === (100 + i).toLong))
  }

  test("lshBucket puts near-identical vectors in the same bucket most of the time") {
    val pairs = (0 until 40).map { i =>
      (i.toLong, randVec(i), perturb(randVec(i), 0.005, 7000 + i))
    }
    val planes = gaussianPlanes(6, 32)
    val df = pairs.map { case (id, a, b) => (id, a, b) }.toDF("id", "a", "b")
      .select(col("id"), lshBucket(col("a"), planes).as("ba"),
        lshBucket(col("b"), planes).as("bb"))
    val same = df.filter(col("ba") === col("bb")).count()
    assert(same >= 28, s"only $same/40 near-dup pairs share a bucket")
  }

  test("ivfAssign assigns each centroid to itself at distance ~0") {
    val vecs = (0 until 20).map(i => (i.toLong, randVec(i))).toDF("vec_id", "v")
    val cents = (0 until 4).map(i => (i.toLong, randVec(i))).toDF("c_id", "cv")
    val assign = Similarity.ivfAssign(vecs, cents)
      .select("vec_id", "cluster_id", "dist").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    (0 until 4).foreach { i =>
      assert(assign(i.toLong)._1 === i.toLong)
      assert(math.abs(assign(i.toLong)._2) < 1e-9)
    }
    assert(assign.size === 20)
  }

  test("kmeansIterate recovers planted cluster centers and lowers distortion") {
    // 4 planted clusters of 25 points; init centroids = one (perturbed)
    // member of each cluster
    val corpus = (0 until 100).map { i =>
      val center = randVec(i % 4, 16)
      (i.toLong, perturb(center, 0.1, 9000 + i))
    }.toDF("vec_id", "v")
    val init = (0 until 4).map { i =>
      (i.toLong, perturb(randVec(i, 16), 0.5, 100 + i))
    }.toDF("c_id", "cv")

    val d0 = Similarity.distortion(corpus, init)
    val trained = Similarity.kmeansIterate(corpus, init, iters = 5)
    val d1 = Similarity.distortion(corpus, trained)
    assert(d1 < d0, s"distortion should drop: $d0 -> $d1")

    // each trained centroid sits near its planted center (within the
    // perturbation scale), and all 4 survive
    val cents = trained.orderBy("c_id").as[(Long, Array[Double])].collect()
    assert(cents.length === 4)
    cents.foreach { case (cid, cv) =>
      val truth = randVec(cid.toInt, 16)
      val dist = math.sqrt(cv.zip(truth).map { case (a, b) => (a - b) * (a - b) }.sum)
      assert(dist < 0.5, s"centroid $cid off by $dist")
    }
  }

  test("kmeansStep computes exact fixed-point means and is partitioning-invariant") {
    val corpus = Seq(
      (0L, Array(0.0, 0.0)), (1L, Array(1.0, 1.0)),       // cluster 0
      (2L, Array(9.0, 9.0)), (3L, Array(11.0, 11.0))      // cluster 1
    ).toDF("vec_id", "v")
    val cents = Seq((0L, Array(0.0, 0.0)), (1L, Array(10.0, 10.0)))
      .toDF("c_id", "cv")
    val out = Similarity.kmeansStep(corpus, cents)
      .orderBy("cluster_id", "dim")
      .select("cluster_id", "dim", "c_new", "n_members")
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(out === Seq(
      (0L, 0L, 0.5, 2L), (0L, 1L, 0.5, 2L),
      (1L, 0L, 10.0, 2L), (1L, 1L, 10.0, 2L)))
    // bit-identical on a different partitioning (the point of fixed-point sums)
    val re = Similarity.kmeansStep(corpus.repartition(5), cents)
      .orderBy("cluster_id", "dim")
      .select("cluster_id", "dim", "c_new", "n_members")
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(re === out)
  }

  test("chained kmeansStep iterations lower distortion like kmeansIterate") {
    val corpus = (0 until 100).map { i =>
      val center = randVec(i % 4, 16)
      (i.toLong, perturb(center, 0.1, 7000 + i))
    }.toDF("vec_id", "v")
    val init = (0 until 4).map { i =>
      (i.toLong, perturb(randVec(i, 16), 0.5, 300 + i))
    }.toDF("c_id", "cv")
    val d0 = Similarity.distortion(corpus, init)
    var c = init
    for (_ <- 1 to 3)
      c = Similarity.centroidsFromStep(Similarity.kmeansStep(corpus, c), Some(c))
        .localCheckpoint()
    val d1 = Similarity.distortion(corpus, c)
    assert(d1 < d0, s"distortion should drop: $d0 -> $d1")
    assert(c.count() === 4)
    // a far-away seed attracts no members; with prev it survives in place
    val withDead = init.unionByName(
      Seq((99L, Array.fill(16)(1e6))).toDF("c_id", "cv"))
    val kept = Similarity.centroidsFromStep(
      Similarity.kmeansStep(corpus, withDead), Some(withDead))
    assert(kept.count() === 5)
    assert(kept.filter(col("c_id") === 99L).count() === 1)
  }

  test("ivfSearch finds in-cluster neighbors; nprobe=2 recall >= nprobe=1") {
    val corpus = (0 until 96).map { i =>
      val c = randVec(i % 8, 32)
      (i.toLong, perturb(c, 0.05, 7000 + i))
    }.toDF("vec_id", "v")
    val cents = (0 until 8).map(i => (i.toLong, randVec(i, 32))).toDF("c_id", "cv")
    val exact = Similarity.bruteForceTopK(
      corpus, corpus.filter(col("vec_id") < 8)
        .select(col("vec_id").as("q_id"), col("v").as("qv")), 3)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recall(np: Int): Double = {
      val got = Similarity.ivfSearch(corpus, cents, k = 3,
          queryPred = col("vec_id") < 8, nprobe = np)
        .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
      (exact intersect got).size.toDouble / exact.size
    }
    val r1 = recall(1); val r2 = recall(2)
    assert(r1 >= 0.5, s"nprobe=1 recall $r1 too low on well-separated clusters")
    assert(r2 >= r1, s"nprobe=2 recall $r2 < nprobe=1 recall $r1")
  }

  test("LSH ANN recall vs brute force is reasonable on clustered data") {
    // clustered corpus: 8 clusters of 12 vectors each around a center
    val corpus = (0 until 96).map { i =>
      val c = randVec(i % 8, 32)
      (i.toLong, perturb(c, 0.05, 5000 + i))
    }.toDF("vec_id", "v")
    val exact = Similarity.bruteForceTopK(
      corpus, corpus.filter(col("vec_id") < 8)
        .select(col("vec_id").as("q_id"), col("v").as("qv")), 3)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(corpus, numPlanes = 4, dim = 32, k = 3,
        queryPred = col("vec_id") < 8)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"ANN recall $recall too low")
  }

  test("semDedup drops planted twins, keeps originals, matches brute force") {
    // 40 spread vectors + 6 near-twins of the first 6 (higher ids) —
    // twins land in their original's cluster and must be the drops.
    val base = (0 until 40).map(i => (i.toLong, randVec(i)))
    val twins = (0 until 6).map(i => ((100 + i).toLong, perturb(randVec(i), 0.01, 7 + i)))
    val corpus = (base ++ twins).toDF("vec_id", "v")
    val cents = (0 until 4).map(i => (i.toLong, randVec(50 + i))).toDF("c_id", "cv")
    val got = Similarity.semDedup(corpus, cents, minCos = 0.9)
      .select("vec_id", "kept").as[(Long, Long)].collect().toMap
    assert(got.size === 46)
    (0 until 6).foreach { i =>
      assert(got((100 + i).toLong) === 0L, s"twin ${100 + i} not dropped")
      assert(got(i.toLong) === 1L, s"original $i wrongly dropped")
    }
    // brute-force the contract: dropped iff a smaller-id same-cluster
    // member has cosine >= 0.9
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val all = base ++ twins
    val cvs = (0 until 4).map(i => (i.toLong, randVec(50 + i)))
    def cluster(v: Array[Double]): Long =
      cvs.minBy { case (cid, cv) =>
        (v.zip(cv).map { case (x, y) => (x - y) * (x - y) }.sum, cid) }._1
    all.foreach { case (id, v) =>
      val want = if (all.exists { case (oid, ov) =>
        oid < id && cluster(ov) == cluster(v) && cos(ov, v) >= 0.9 }) 0L else 1L
      assert(got(id) === want, s"verdict mismatch for $id")
    }
    graft.operators.OperatorCaches.release()
  }

  test("dominantDirection recovers a planted 1-D subspace exactly") {
    // all vectors on the line t·(0.1, 0.2): every bit of variance lies
    // along (1, 2), so the iterated direction converges to the max-abs
    // normalized (5000, 10000) and the Rayleigh share is a full 10⁴.
    // (Hand-rolled: G ∝ [[1,2],[2,4]]; v0=(1e4,1e4) → Gv ∝ (3,6) →
    // v1=(5000,10000), a fixed point; λ = 5s = trace.)
    val vs = Seq(
      (1L, Seq(0.1, 0.2)), (2L, Seq(0.2, 0.4)),
      (3L, Seq(0.3, 0.6)), (4L, Seq(-0.1, -0.2)))
      .toDF("vec_id", "v")
    val got = Similarity.dominantDirection(vs, "vec_id", "v")
      .orderBy("pos")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.map(_._3) === Seq(5000L, 10000L)) // direction (1,2)
    assert(got.map(_._4).distinct === Seq(10000L)) // all variance on PC1
    // sum_q: Σ round(t·1e6) per component
    assert(got.map(_._2) === Seq(500000L, 1000000L))
    graft.operators.OperatorCaches.release()
  }

  test("dominantDirection splits variance across an isotropic pair") {
    // two orthogonal equal-mass directions: the share must be 5000 bp
    // (half the trace), whatever direction the iteration lands on
    val vs = Seq(
      (1L, Seq(0.3, 0.0)), (2L, Seq(-0.3, 0.0)),
      (3L, Seq(0.0, 0.3)), (4L, Seq(0.0, -0.3)))
      .toDF("vec_id", "v")
    val got = Similarity.dominantDirection(vs, "vec_id", "v")
      .select("aniso_bp").distinct()
      .as[Long].collect().toSeq
    assert(got === Seq(5000L))
    graft.operators.OperatorCaches.release()
  }

  test("abttRemoval: on-axis mass reports 10⁴ bp, orthogonal mass 0") {
    // planted dominant direction (1,0): two heavy ±x vectors, two tiny
    // ±y vectors. Hand-rolled trajectory: c = 4q (zero mean), Gxx =
    // 2·(1.6e6)² dwarfs Gyy = 2·(4e4)², and the 10⁴-grid renorm
    // truncates the y component to 0 by iteration 2 — pc1 = (10⁴, 0)
    // EXACTLY, so x-docs project fully (10⁴ bp) and y-docs not at all.
    val vs = Seq(
      (1L, Seq(0.4, 0.0)), (2L, Seq(-0.4, 0.0)),
      (3L, Seq(0.0, 0.01)), (4L, Seq(0.0, -0.01)))
      .toDF("vec_id", "v")
    val got = Similarity.abttRemoval(vs, "vec_id", "v")
      .orderBy("vec_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 16000000000L, 10000L), // c=(1.6e6,0), coef=c·(1e4,0)
      (2L, -16000000000L, 10000L),
      (3L, 0L, 0L), (4L, 0L, 0L)))
    graft.operators.OperatorCaches.release()
  }

  test("abttRemoval: a document sitting on the corpus mean reports 0") {
    // three collinear vectors; the middle one IS the mean, so its
    // centered form is the zero vector — coef 0, removed_bp 0 by the
    // Σc²=0 convention; its collinear neighbors strip a full 10⁴.
    val vs = Seq(
      (1L, Seq(0.1, 0.2)), (2L, Seq(0.2, 0.4)), (3L, Seq(0.3, 0.6)))
      .toDF("vec_id", "v")
    val got = Similarity.abttRemoval(vs, "vec_id", "v")
      .orderBy("vec_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.map(_._3) === Seq(10000L, 0L, 10000L))
    assert(got(1)._2 === 0L)
    graft.operators.OperatorCaches.release()
  }

  test("simplifiedSilhouette: tight separated clusters score 10⁴, " +
      "a point on the rival centroid scores negative") {
    // labels 0/1 each collapse onto one point → a² = 0, b² > 0 → every
    // point scores the full 10⁴
    val tight = Seq(
      (1L, Seq(0.1, 0.0), 0), (2L, Seq(0.1, 0.0), 0),
      (3L, Seq(-0.1, 0.0), 1), (4L, Seq(-0.1, 0.0), 1))
      .toDF("vec_id", "v", "label")
    val got = Similarity.simplifiedSilhouette(tight, "vec_id", "v", "label")
      .orderBy("label").as[(Int, Long, Long, Long)].collect().toSeq
    assert(got === Seq((0, 2L, 20000L, 10000L), (1, 2L, 20000L, 10000L)))
    graft.operators.OperatorCaches.release()
    // plant a label-1 point exactly on label 0's centroid: its a² (to
    // the shifted label-1 centroid) exceeds its b² (0 to label 0) →
    // negative contribution drags label 1's mean below label 0's 10⁴
    val planted = Seq(
      (1L, Seq(0.1, 0.0), 0), (2L, Seq(0.1, 0.0), 0),
      (3L, Seq(-0.1, 0.0), 1), (4L, Seq(-0.1, 0.0), 1),
      (5L, Seq(0.1, 0.0), 1))
      .toDF("vec_id", "v", "label")
    val p = Similarity.simplifiedSilhouette(planted, "vec_id", "v", "label")
      .orderBy("label").as[(Int, Long, Long, Long)].collect().toSeq
    assert(p.head._4 === 10000L)
    assert(p(1)._4 < p.head._4)
    graft.operators.OperatorCaches.release()
  }

  test("simplifiedSilhouette: degenerate identical corpus scores 0; " +
      "fewer than two labels is loud") {
    val same = Seq((1L, Seq(0.5), 0), (2L, Seq(0.5), 1))
      .toDF("vec_id", "v", "label")
    val got = Similarity.simplifiedSilhouette(same, "vec_id", "v", "label")
      .orderBy("label").as[(Int, Long, Long, Long)].collect().toSeq
    assert(got.map(_._4) === Seq(0L, 0L))
    graft.operators.OperatorCaches.release()
    val one = Seq((1L, Seq(0.5), 0), (2L, Seq(0.6), 0))
      .toDF("vec_id", "v", "label")
    val e = intercept[IllegalArgumentException] {
      Similarity.simplifiedSilhouette(one, "vec_id", "v", "label")
    }
    assert(e.getMessage.contains("need >= 2 labels"))
    graft.operators.OperatorCaches.release()
  }

  test("labelAgreement: geometric labels score κ=10⁴, label-blind " +
      "geometry scores κ=0 despite 50% accuracy") {
    // labels == clusters: perfect assignment, κ = accuracy = 10⁴
    val aligned = Seq(
      (1L, Seq(0.1, 0.0), 0), (2L, Seq(0.1, 0.0), 0),
      (3L, Seq(-0.1, 0.0), 1), (4L, Seq(-0.1, 0.0), 1))
      .toDF("vec_id", "v", "label")
    val a = Similarity.labelAgreement(aligned, "vec_id", "v", "label")
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(a === ((4L, 4L, 8L, 10000L, 10000L)))
    graft.operators.OperatorCaches.release()
    // labels orthogonal to geometry: both label centroids coincide at
    // the origin, every point ties and predicts label 0 → accuracy is
    // the 50% a label-blind assigner gets by chance, and κ strips it
    // to exactly 0 — the correction this operator exists for
    val blind = Seq(
      (1L, Seq(0.1, 0.0), 0), (2L, Seq(0.1, 0.0), 1),
      (3L, Seq(-0.1, 0.0), 0), (4L, Seq(-0.1, 0.0), 1))
      .toDF("vec_id", "v", "label")
    val b = Similarity.labelAgreement(blind, "vec_id", "v", "label")
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(b === ((4L, 2L, 8L, 5000L, 0L)))
    graft.operators.OperatorCaches.release()
  }

  test("mmrGreedy picks relevance first, then skips the redundant twin") {
    // candidates: a (rel 100), b (rel 99, near-twin of a: sim 95),
    // c (rel 50, dissimilar: sim 5 to both). Round 1 → a. Round 2:
    // b scores 7·99 − 3·95 = 408 < c's 7·50 − 3·5 = 335? No — 408 > 335,
    // so λ=0.7 keeps b; with λ=0.3 (lamNum10=3) b scores 3·99−7·95 =
    // −368 < c's 3·50−7·5 = 115 → diversity wins. Both pinned.
    val cands = Seq((1L, 100L), (2L, 99L), (3L, 50L))
    val sims = Map(
      (1L, 2L) -> 95L, (2L, 1L) -> 95L,
      (1L, 3L) -> 5L, (3L, 1L) -> 5L,
      (2L, 3L) -> 5L, (3L, 2L) -> 5L)
    val rel7 = Similarity.mmrGreedy(cands, sims, k = 3)
    assert(rel7.map(_._2) === Seq(1L, 2L, 3L))
    assert(rel7.head === ((1L, 1L, 100L, 0L, 700L)))
    assert(rel7(1) === ((2L, 2L, 99L, 95L, 408L)))
    val div3 = Similarity.mmrGreedy(cands, sims, k = 3, lamNum10 = 3L)
    assert(div3.map(_._2) === Seq(1L, 3L, 2L))
    // k beyond the candidate count stops at the candidate count
    assert(Similarity.mmrGreedy(cands, sims, k = 9).size === 3)
  }
}
