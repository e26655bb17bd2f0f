package graft

import org.apache.spark.sql.functions._

import graft.operators.{CorpusStats, Dedup, InvertedIndex}

/** Round-8 additions: asymmetric containment, positional phrase search,
  * quality-aware canonical selection, PMI collocations, bigram LM —
  * planted-semantics checks plus the house plan-shape guards (nothing
  * quadratic, nothing driver-side beyond bounded argmax rows). */
class ContainmentCollocationSpec extends SparkSpec {

  import spark.implicits._

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
    "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron")

  private def doc(seed: Int, nTokens: Int = 40): String = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nTokens)(vocab(rng.nextInt(vocab.size))).mkString(" ")
  }

  test("containmentPairs flags the short-inside-long direction Jaccard misses") {
    // B = long doc; A = a verbatim 12-token chunk of B. Plus unrelated noise.
    val b = doc(7, 60)
    val a = b.split(" ").slice(20, 32).mkString(" ")
    val docs = ((0 until 20).map(i => ((100 + i).toLong, doc(1000 + i))) ++
      Seq((1L, a), (2L, b))).toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(docs, "doc_id", "text",
      k = 3, minContainment = 0.5).collect()
    val aInB = pairs.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(aInB.isDefined, s"expected (1→2) containment pair, got ${pairs.toSeq}")
    // every 3-shingle of the chunk occurs in B → containment = 1.0 exactly
    assert(aInB.get.getDouble(5) === 1.0)
    // the reverse direction must NOT clear the bar: B has ~58 shingles, A ~10
    assert(!pairs.exists(r => r.getLong(0) == 2L && r.getLong(1) == 1L))
    // and the symmetric metric on the same pair stays low — the point of
    // the operator (Jaccard ≈ 10/58 < the 0.5 containment A→B clears)
    val na = aInB.get.getLong(2); val nb = aInB.get.getLong(3)
    val inter = aInB.get.getLong(4)
    assert(inter.toDouble / (na + nb - inter) < 0.25)
  }

  test("containmentPairs plan: no cartesian, hot shingles capped before self-join") {
    val docs = (0 until 30).map(i => (i.toLong, doc(i))).toDF("doc_id", "text")
    val out = Dedup.containmentPairs(docs, "doc_id", "text")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("phraseMatchTopTrigram finds the planted dominant trigram positionally") {
    // plant "alpha beta gamma" 3× in doc 1 (positions 1, 6, 11), 1× in doc 2;
    // noise docs share no trigram that often
    val d1 = "alpha beta gamma mu nu alpha beta gamma xi xi alpha beta gamma"
    val d2 = "kappa kappa alpha beta gamma kappa kappa kappa kappa"
    val noise = (0 until 10).map(i => ((10 + i).toLong, doc(500 + i, 20)))
    val docs = (Seq((1L, d1), (2L, d2)) ++ noise).toDF("doc_id", "text")
    val out = InvertedIndex.phraseMatchTopTrigram(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val hits = out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(hits.contains((1L, 3L, 1L)), s"doc 1: want 3 occurrences from pos 1, got $hits")
    assert(hits.contains((2L, 1L, 3L)), s"doc 2: want 1 occurrence at pos 3, got $hits")
  }

  test("phraseMatchTopTrigram on a corpus with no 3-token doc returns empty") {
    val docs = Seq((1L, "a b"), (2L, "c")).toDF("doc_id", "text")
    val out = InvertedIndex.phraseMatchTopTrigram(docs, "doc_id", "text")
    assert(out.count() === 0L)
    assert(out.columns.toSeq === Seq("doc_id", "n_occ", "first_pos"))
  }

  test("canonical selection keeps the richest cluster member, ties to min id") {
    // near-dup cluster {1, 2}: doc 2 carries one extra distinct token
    val base = doc(42, 40)
    val richer = base + " omega"
    val noise = (0 until 15).map(i => ((50 + i).toLong, doc(2000 + i)))
    val docs = (Seq((1L, base), (2L, richer)) ++ noise).toDF("doc_id", "text")
    val pairs = Dedup.lshPairs(docs, "doc_id", "text",
      numBands = 4, minJaccard = 0.1, k = 3, rowsPerBand = 2)
    val clusters = Dedup.pooledDupClusters(pairs)
    val quality = docs.select(col("doc_id"),
      size(array_distinct(split(col("text"), " "))).cast("long").as("q"))
    val keep = clusters.join(quality, "doc_id")
      .groupBy("cluster_id")
      .agg(max(struct(col("q"), (-col("doc_id")).as("nid"))).as("s"))
      .select(col("cluster_id"), (-col("s.nid")).as("keeper_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(keep.get(1L).contains(2L),
      s"cluster 1 should keep the richer doc 2, got $keep")
    graft.operators.FramePool.release()
  }

  test("pmiCollocations ranks a planted always-adjacent pair top with exact lift") {
    // "aa bb" always adjacent, 30×; filler is a single repeated token so
    // expected counts are computable by hand
    val docs = (0 until 30).map(i => (i.toLong, "aa bb cc cc cc"))
      .toDF("doc_id", "text")
    val out = CorpusStats.pmiCollocations(docs, "doc_id", "text",
      window = 3, minPairCount = 5L, topN = 10).collect()
    assert(out.nonEmpty)
    val topRow = out.head
    assert((topRow.getString(0), topRow.getString(1)) === ("aa", "bb"))
    // per doc (5 tokens, window 3): pairs = 4 + 3 + 2 = 9 → npr = 270,
    // (aa,bb) 1× per doc = 30, c(aa) = 30, c(bb) = 30, N = 150
    // lift = 30·150² / (270·30·30) = 675000 / 243000
    assert(topRow.getLong(2) === 30L)
    assert(topRow.getDouble(3) === 675000.0 / 243000.0)
  }

  test("bigramLmScore: deterministic text scores above shuffled text; exact tiny case") {
    // tiny exact case: two docs over bigrams {x y (2×), y x (1×)}
    //   doc 1 = "x y x"  → bigrams (x,y), (y,x)
    //   doc 2 = "x y"    → bigram  (x,y)
    // LM: c(x,y)=2, c(y,x)=1; prefixes c(x·)=2, c(y·)=1
    //   q(x,y) = ⌊2e9/2⌋ = 1e9;  q(y,x) = ⌊1e9/1⌋ = 1e9
    // both docs: every bigram has conditional prob 1 → avg_p9 = 1e9
    val tiny = Seq((1L, "x y x"), (2L, "x y")).toDF("doc_id", "text")
    val tout = CorpusStats.bigramLmScore(tiny, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(tout.map(_.getLong(1)).toSeq === Seq(2L, 1L))
    assert(tout.map(_.getLong(2)).toSeq === Seq(1000000000L, 1000000000L))
    assert(tout.map(_.getDouble(3)).toSeq === Seq(1.0, 1.0))

    // order sensitivity: a corpus of one dominant patterned doc + noise —
    // the patterned doc's bigrams are corpus-frequent, a token-shuffled
    // variant of the same tokens is not
    val pattern = Seq.fill(20)("p q").mkString(" ")       // p q p q ...
    val shuffled = new scala.util.Random(3).shuffle(
      pattern.split(" ").toSeq).mkString(" ")
    val corpus = ((0 until 10).map(i => (i.toLong, pattern)) :+
      (99L, shuffled)).toDF("doc_id", "text")
    val scores = CorpusStats.bigramLmScore(corpus, "doc_id", "text")
      .select("doc_id", "avg_p").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(scores(0L) > scores(99L),
      s"patterned doc should out-score its shuffle: $scores")
  }

  test("tokenDrift surfaces a side-exclusive token with exact fixed-point score") {
    // side A repeats "drifty"; both sides share filler "x"
    val a = (0 until 10).map(i => (i.toLong, "drifty x x x x", "A"))
    val b = (10 until 20).map(i => (i.toLong, "x x x x x", "B"))
    val docs = (a ++ b).toDF("doc_id", "text", "src")
    val out = CorpusStats.tokenDrift(docs, "text",
      sideA = col("src") === "A", minTotal = 5L, topN = 5).collect()
    // driftly: c_a=10, c_b=0, n_a=50, n_b=50
    //   r6 = (11·51·10⁶)//(1·51) = 11_000_000 — the top drift by an order
    val topRow = out.head
    assert(topRow.getString(0) === "drifty")
    assert(topRow.getLong(1) === 10L && topRow.getLong(2) === 0L)
    assert(topRow.getLong(3) === 11000000L)
    // filler "x" drifts mildly: max((41·51·10⁶)//(51·51), (51·51·10⁶)//(41·51))
    val x = out.find(_.getString(0) == "x").get
    assert(x.getLong(3) === (2601L * 1000000L) / 2091L)
  }

  test("label spread predicts the neighborhood-majority label") {
    // docs 1-3 near-identical labeled en; doc 4 the same text labeled de →
    // doc 4's neighbors are all en, so consensus flags its label
    val base = doc(77, 40)
    val noise = (0 until 12).map(i => ((50 + i).toLong, doc(3000 + i), "en"))
    val docs = (Seq((1L, base, "en"), (2L, base + " mu", "en"),
      (3L, base + " nu", "en"), (4L, base + " xi", "de")) ++ noise)
      .toDF("doc_id", "text", "lang")
    val docsL = docs.select(col("doc_id"), col("lang"))
    val pairs = Dedup.lshPairs(docs, "doc_id", "text",
      numBands = 4, minJaccard = 0.1, k = 3, rowsPerBand = 2)
      .select("a_id", "b_id")
    val e = pairs.union(pairs.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
    val cnt = e
      .join(docsL.select(col("doc_id").as("b_id"), col("lang").as("nl")), "b_id")
      .groupBy(col("a_id"), col("nl")).agg(count(lit(1)).as("c"))
    val pred = cnt.groupBy("a_id")
      .agg(min(struct((-col("c")).as("nc"), col("nl").as("lab"))).as("s"))
      .select(col("a_id").as("doc_id"), col("s.lab").as("pred_lang"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(pred(4L) === "en", s"doc 4 should be flagged as en-majority: $pred")
    assert(pred(1L) === "en")
    graft.operators.FramePool.release()
  }

  test("sourceNovelty: a copied source scores 0, a unique one scores 1") {
    val unique = doc(11, 30)
    val docs = Seq(
      (1L, unique, "fresh"),        // only source holding these spans
      (2L, doc(12, 30), "orig"),
      (3L, doc(12, 30), "copycat")) // every span also in "orig"
      .toDF("doc_id", "text", "source")
    val out = CorpusStats.sourceNovelty(docs, "source", "text", k = 8)
      .collect().map(r => (r.getString(0), r.getDouble(3))).toMap
    assert(out("fresh") === 1.0)
    assert(out("copycat") === 0.0)
    assert(out("orig") === 0.0) // its spans all exist in copycat too
  }

  test("event anomaly flags a planted spike against the trailing-24h window") {
    // 30 quiet hours at 10 events, then hour 30 spikes to 100
    // (epoch-second construction — immune to the JVM's default timezone)
    val base = 1767225600L // 2026-01-01 00:00:00 UTC
    val rows = (0 until 31).flatMap { hr =>
      val n = if (hr == 30) 100 else 10
      (0 until n).map(i => (hr.toLong * 1000 + i, base + hr * 3600L + 1800L))
    }
    val ev = rows.toDF("event_id", "epoch")
      .select(col("event_id"), timestamp_seconds(col("epoch")).as("ts"))
    val hourly = ev.groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("h")).rowsBetween(-24, -1)
    val out = hourly
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s", sum(col("c")).over(w))
      .withColumn("q", sum(expr("CAST(c AS DECIMAL(38,0)) * c")).over(w))
      .withColumn("dev", expr("CAST(c AS DECIMAL(38,0)) * 24 - s"))
      .withColumn("varn", expr(
        "24 * CAST(q AS DECIMAL(38,0)) - CAST(s AS DECIMAL(38,0)) * CAST(s AS DECIMAL(38,0))"))
      .select(col("h"), col("c"),
        when(col("n") === 24,
          col("dev") * col("dev") > lit(4) * col("varn"))
          .otherwise(lit(false)).as("anomaly"))
      .orderBy("h").collect()
    // constant-rate window: variance 0, spike dev² > 0 → flagged; quiet
    // hours with full windows have dev = 0 → not flagged
    assert(out.count(_.getBoolean(2)) === 1)
    assert(out.find(_.getBoolean(2)).get.getLong(1) === 100L)
  }

  test("triangle census: a tight triple yields one triangle, a chain yields none") {
    // node-ordered edge list: a 3-clique {1,2,3}, a chain 11-12-13, a
    // 4-clique {20..23} (4 triangles) — the LSH pairing that produces
    // these edges in q172 is oracle-gated and recall-tested elsewhere;
    // this pins the enumeration join (each triangle counted exactly once,
    // anchored at its minimum node)
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (11L, 12L), (12L, 13L),
      (20L, 21L), (20L, 22L), (20L, 23L), (21L, 22L), (21L, 23L), (22L, 23L))
      .toDF("a_id", "b_id")
    val tri = e.as("ab")
      .join(e.as("bc"), col("ab.b_id") === col("bc.a_id"))
      .join(e.as("ac"), col("ac.a_id") === col("ab.a_id") &&
        col("ac.b_id") === col("bc.b_id"))
      .select(col("ab.a_id").as("node"))
      .collect().map(_.getLong(0)).sorted.toSeq
    // clique{1,2,3}: 1 triangle at node 1; chain: none; 4-clique: C(4,3)=4
    // triangles, anchored 20,20,20,21
    assert(tri === Seq(1L, 20L, 20L, 20L, 21L), s"got $tri")
  }

  test("pmi and bigram-lm plans stay linear: no cartesian joins") {
    val docs = (0 until 20).map(i => (i.toLong, doc(i))).toDF("doc_id", "text")
    for (df <- Seq(
        CorpusStats.pmiCollocations(docs, "doc_id", "text", minPairCount = 2L),
        CorpusStats.bigramLmScore(docs, "doc_id", "text"))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), plan)
      // the two one-row totals in PMI broadcast-cross in; nothing larger may
      assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size <= 2, plan)
    }
  }
}
