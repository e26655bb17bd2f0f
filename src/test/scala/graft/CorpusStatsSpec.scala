package graft

import org.apache.spark.sql.functions._

import graft.operators.{CorpusStats, OperatorCaches}
import graft.operators.CorpusStats.CmsParams

/** Corpus-statistics operators: the properties the oracle can't see —
  * CMS candidate-superset under forced collisions, systematic-sample
  * cardinality and plan shape, span-dedup symmetry on crafted twins. */
class CorpusStatsSpec extends SparkSpec {

  import spark.implicits._

  test("cmsHeavyHitters stays exact when the sketch is forced to collide") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // exact reference: plain groupBy-count threshold
    val exact = docs
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 50)
      .orderBy("tok").collect().toSeq
    // width 4 << vocab 31 → every cell aggregates many tokens, estimates
    // overshoot wildly; the exact confirm pass must still land on the
    // identical answer (CMS only ever prunes, never decides)
    val viaCms = CorpusStats.cmsHeavyHitters(
      docs, "text", threshold = 50L, CmsParams(depth = 3, width = 4))
      .orderBy("tok").collect().toSeq
    assert(viaCms === exact)
  }

  test("cmsSketch cells sum to the posting size (counts are conserved per row)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val posting = docs.select(explode(split(col("text"), " ")).as("tok"))
    val n = posting.count()
    val p = CmsParams(depth = 4, width = 16)
    val sketch = CorpusStats.cmsSketch(posting, "tok", p)
    val perRow = sketch.groupBy("row").agg(sum("cnt").as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perRow.keySet === (0 until p.depth).toSet)
    assert(perRow.values.forall(_ === n))
  }

  test("systematicWeightedSample picks total_w/step units and plans no SinglePartition") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val step = 101L
    val out = CorpusStats.systematicWeightedSample(
      li, Seq(col("l_orderkey"), col("l_linenumber")), col("l_quantity"), step)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"systematic sample must not plan a SinglePartition exchange:\n$plan")
    val picks = out.agg(sum("picks")).head().getLong(0)
    val totalW = li.agg(sum(col("l_quantity").cast("long"))).head().getLong(0)
    // exactly ⌊total/step⌋ weight-axis multiples fall in (0, total]
    assert(picks === totalW / step)
    // a row's multiplicity is bounded by its own weight span
    val bad = out.filter(col("picks") > col("l_quantity").cast("long") / step + 1)
    assert(bad.count() === 0)
    OperatorCaches.release()
  }

  test("duplicatedSpans flags exactly the shared windows of crafted twins") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),     // shares the 8-gram c..j with doc 2
      (2L, "x y c d e f g h i j"),     // → exactly one shared window each
      (3L, "p q r s t u v w"),         // unique 8 tokens → 1 span, not dup
      (4L, "short text")               // < 8 tokens → 0 spans
    ).toDF("doc_id", "text")
    val out = CorpusStats.duplicatedSpans(docs, "doc_id", "text", k = 8)
      .orderBy("doc_id").collect()
    val rows = out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows(0) === ((1L, 3L, 1L, 1.0 / 3.0)))
    assert(rows(1) === ((2L, 3L, 1L, 1.0 / 3.0)))
    assert(rows(2) === ((3L, 1L, 0L, 0.0)))
    assert(rows(3) === ((4L, 0L, 0L, 0.0)))
  }

  test("unigramLmScore: rarer-vocabulary documents score lower avg_p") {
    val docs = Seq(
      (1L, "common common common common"),
      (2L, "common common rare1 rare2")
    ).toDF("doc_id", "text")
    val out = CorpusStats.unigramLmScore(docs, "doc_id", "text", rareBelow = 2L)
      .orderBy("doc_id").collect()
    val byDoc = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4))).toMap
    // corpus: common×6, rare1×1, rare2×1, N=8
    assert(byDoc(1L) === ((4L, 6.0 / 8.0, 6L, 0.0)))
    assert(byDoc(2L) === ((4L, (6 + 6 + 1 + 1) / (4.0 * 8.0), 1L, 0.5)))
    assert(byDoc(2L)._2 < byDoc(1L)._2)
  }

  test("dsirAffinity ranks target-like documents above off-target ones") {
    // target slice speaks bigram vocabulary {a b}, the raw remainder {x y};
    // probe 3 is pure target-speak, probe 4 pure off-target, probe 5 mixed
    val docs = Seq(
      (1L, "en", "a b a b a b"),
      (2L, "zh", "x y x y x y"),
      (3L, "zh", "a b a b"),
      (4L, "zh", "x y x y"),
      (5L, "zh", "a b x y")
    ).toDF("doc_id", "lang", "text")
    val out = CorpusStats.dsirAffinity(docs, "doc_id", "text",
      isTarget = col("lang") === "en", buckets = 4096)
      .orderBy("doc_id").collect()
    val w = out.map(r => r.getLong(0) -> r.getDouble(4)).toMap
    // off-target-only features never occur in the target → weight 0
    assert(w(4L) === 0.0)
    assert(w(2L) === 0.0)
    // target-speak outranks mixed outranks off-target
    assert(w(3L) > w(5L) && w(5L) > w(4L))
    // a doc made ONLY of target-frequent features weighs above 1 (its
    // features are denser in the target than in the raw pool)
    assert(w(3L) > 1.0)
    // every emitted doc has features; dots are consistent (t_dot ≤ r_dot ·
    // anything is not generally true, but r_dot ≥ n_feat always: each
    // feature occurs at least once in the raw pool — itself)
    out.foreach { r =>
      assert(r.getLong(1) > 0L)            // n_feat
      assert(r.getLong(3) >= r.getLong(1)) // r_dot ≥ n_feat
    }
  }

  test("spanContamination measures benchmark-overlap mass exactly") {
    // bench doc 1 holds one 8-token window; training doc 2 contains that
    // window verbatim among 3 spans; doc 3 shares nothing; doc 4 too short
    val docs = Seq(
      (1L, true, "c d e f g h i j"),
      (2L, false, "a b c d e f g h i j"),
      (3L, false, "p q r s t u v w x"),
      (4L, false, "tiny")
    ).toDF("doc_id", "bench", "text")
    val out = CorpusStats.spanContamination(docs, "doc_id", "text",
      isBench = col("bench"), k = 8)
      .orderBy("doc_id").collect()
    val rows = out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // bench docs are excluded from the report
    assert(rows.map(_._1).toSeq === Seq(2L, 3L, 4L))
    assert(rows(0) === ((2L, 3L, 1L, 1.0 / 3.0)))
    assert(rows(1) === ((3L, 2L, 0L, 0.0)))
    assert(rows(2) === ((4L, 0L, 0L, 0.0)))
  }

  test("dsirAffinity and spanContamination plan no quadratic join") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val dsirPlan = CorpusStats.dsirAffinity(docs, "doc_id", "text",
      isTarget = col("lang") === "en")
      .queryExecution.executedPlan.toString
    // the ONLY nested-loop join allowed is the broadcast-singleton ⊗totals
    assert(!dsirPlan.contains("CartesianProduct"), "dsir: cartesian")
    assert("BroadcastNestedLoopJoin".r.findAllIn(dsirPlan).size <= 1,
      "dsir: more than the singleton-totals cross join")
    val contamPlan = CorpusStats.spanContamination(docs, "doc_id", "text",
      isBench = graft.operators.Transforms.hashBucket(col("doc_id")) < 5)
      .queryExecution.executedPlan.toString
    assert(!contamPlan.contains("CartesianProduct") &&
      !contamPlan.contains("BroadcastNestedLoopJoin"),
      "contamination: quadratic join appeared")
  }

  test("KMV sketch merge over random splits equals the full-corpus sketch") {
    // order-statistic mergeability, property-tested: for random corpora
    // and random partitions into parts, merging the per-part sketches
    // must give EXACTLY the full sketch — the claim the streaming
    // maintenance sink (EventStreams.kmvSketchSink) rests on
    val vocab = Vector("qa", "wb", "ec", "rd", "te", "yf", "ug", "ih", "oj", "pk")
    (1 to 3).foreach { trial =>
      val rng = new scala.util.Random(1000 + trial)
      val docs = (1 to 60).map { i =>
        val text = Seq.fill(10 + rng.nextInt(30))(vocab(rng.nextInt(vocab.size)))
          .mkString(" ")
        (i.toLong, s"src${rng.nextInt(4)}", text, rng.nextInt(3))
      }
      val df = docs.toDF("doc_id", "source", "text", "part")
      val k = 5
      val full = CorpusStats.kmvSourceSketch(df, "source", "text", 3, k)
        .as[(String, Long)].collect().toSet
      val partials = (0 until 3).map(p =>
        CorpusStats.kmvSourceSketch(df.filter(col("part") === p),
          "source", "text", 3, k))
      val merged = CorpusStats
        .mergeKmvSketches(partials.reduce(_ unionByName _), k)
        .as[(String, Long)].collect().toSet
      assert(merged === full, s"trial $trial")
      assert(full.nonEmpty)
    }
  }
}
