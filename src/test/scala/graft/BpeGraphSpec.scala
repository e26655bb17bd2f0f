package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bpe, Graphs, OperatorCaches}

/** Specs for the two iterative curation operators whose loops are not
  * SQL-expressible (their distributed heavy-lifting stages are oracle-
  * gated separately: q139 pair counts, q137 PageRank). */
class BpeGraphSpec extends SparkSpec {
  import spark.implicits._

  test("applyMerge fuses greedy left-to-right, including overlap runs") {
    val v = Seq(
      (Array("a", "a", "a"), 1L),            // aaa + (a,a) → [aa, a]
      (Array("a", "b", "a", "b"), 1L),       // abab + (a,b) → [ab, ab]
      (Array("x", "a", "b", "b"), 1L))       // xabb + (a,b) → [x, ab, b]
      .toDF("syms", "freq")
    val ab = Bpe.applyMerge(v, "a", "b").select("syms").as[Seq[String]]
      .collect().toSet
    assert(ab.contains(Seq("ab", "ab")) && ab.contains(Seq("x", "ab", "b")))
    val aa = Bpe.applyMerge(v, "a", "a").select("syms").as[Seq[String]]
      .collect().toSet
    assert(aa.contains(Seq("aa", "a")))
  }

  test("trainMerges matches the sequential reference BPE on fixture text") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 60)
    val got = Bpe.trainMerges(docs, "text", numMerges = 5)
    val vocabDriver = Bpe.vocab(docs, "text")
      .as[(String, Long)].collect().toSeq
    val want = Bpe.referenceMerges(vocabDriver, numMerges = 5)
    assert(got === want)
    OperatorCaches.release()
  }

  test("encodeTokenCounts matches the sequential reference encoder per document") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 40)
    val merges = Bpe.trainMerges(docs, "text", numMerges = 6)
      .map { case (_, a, b, _) => (a, b) }
    // checkpointEvery=2 exercises the mid-loop lineage truncation
    val got = Bpe.encodeTokenCounts(docs, "doc_id", "text", merges,
      checkpointEvery = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    val want = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().toSeq.sortBy(_._1).map { case (id, text) =>
        val words = text.split(" ").filter(_.nonEmpty)
        (id, words.length.toLong,
          words.map(w => Bpe.referenceEncode(w, merges).length.toLong).sum)
      }
    assert(got === want)
    // merges actually compress: fewer tokens than characters-with-endmark
    assert(got.forall { case (_, nw, nt) => nt >= nw }) // ≥ 1 token per word
    val charToks = docs
      .select(sum(expr("length(replace(text, ' ', ''))"))).as[Long].head()
    assert(got.map(_._3).sum < charToks)
    OperatorCaches.release()
  }

  test("merge-table artifact round-trips and serves encoding bit-equal") {
    val tmp = java.nio.file.Files.createTempDirectory("bpeart").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 40)
    val trained = Bpe.trainMerges(docs, "text", numMerges = 6)
    Bpe.save(spark, trained, s"$tmp/merges")
    val loaded = Bpe.load(spark, s"$tmp/merges")
    assert(loaded === trained) // ranks, pairs, AND counts survive
    // serve-from-artifact: encoding through the loaded table is
    // bit-equal to encoding through the in-memory one
    def enc(m: Seq[(Int, String, String, Long)]) =
      Bpe.encodeTokenCounts(docs, "doc_id", "text",
          m.map { case (_, a, b, _) => (a, b) }, checkpointEvery = 2)
        .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(enc(loaded) === enc(trained))
    // an artifact with a hole (rank 3 dropped) is a DIFFERENT tokenizer:
    // load must fail loudly, never mis-tokenize
    spark.createDataFrame(trained.filterNot(_._1 == 3))
      .toDF("ord", "a", "b", "cnt")
      .write.mode("overwrite").parquet(s"$tmp/bad")
    val ex = intercept[IllegalArgumentException] {
      Bpe.load(spark, s"$tmp/bad")
    }
    assert(ex.getMessage.contains("not contiguous"))
    OperatorCaches.release()
  }

  test("pageRank and bm25 plans: no single-partition exchange, no nested loop") {
    val e0 = spark.read.parquet(s"$sfDir/orders.parquet")
      .join(spark.read.parquet(s"$sfDir/lineitem.parquet"),
        col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst"))
      .distinct()
    val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
    val ed = Graphs.edgesWithDeg(edges,
      spark.sessionState.conf.numShufflePartitions)
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
    val pr0 = nodes.withColumn("pr", lit(1000000000L))
    val prPlan = Graphs.iterate(nodes, ed, pr0, lit(150000000L), 85L)
      .queryExecution.executedPlan.toString
    assert(!prPlan.contains("Exchange SinglePartition"), prPlan)
    assert(!prPlan.contains("BroadcastNestedLoopJoin") &&
      !prPlan.contains("CartesianProduct"), prPlan)
    val bm = graft.operators.InvertedIndex.bm25TopK(
      spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text",
      Seq("q1" -> Seq("spark", "join")), k = 5)
    val bmPlan = bm.queryExecution.executedPlan.toString
    assert(bmPlan.contains("BroadcastHashJoin") ||
      bmPlan.contains("BroadcastExchange"), bmPlan)
    // The two scalar factors (n_docs, t_total) are 1-row subplans: each is
    // a partial-agg → SinglePartition final agg, cross-joined back as a
    // 1-row broadcast nested loop. Both shapes are linear and allowed in
    // bounded number; anything beyond that budget would be a real
    // quadratic/bottleneck regression.
    assert(bmPlan.sliding("BroadcastNestedLoopJoin".length)
      .count(_ == "BroadcastNestedLoopJoin") <= 2, bmPlan)
    assert(bmPlan.sliding("Exchange SinglePartition".length)
      .count(_ == "Exchange SinglePartition") <= 2, bmPlan)
    assert(!bmPlan.contains("CartesianProduct"), bmPlan)
    OperatorCaches.release()
  }

  test("pageRank is exact on a hand-computed 3-node graph") {
    // a→b, b→c, c→a ring plus a→c: deg(a)=2, deg(b)=1, deg(c)=1
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"))
      .toDF("src", "dst")
    val scale = 1000000000L
    val pr1 = Graphs.pageRank(edges, iterations = 1)
      .as[(String, Long)].collect().toMap
    // after one iteration from uniform scale: contrib(a)=scale (from c),
    // contrib(b)=scale/2 (from a), contrib(c)=scale/2+scale (a half + b)
    val base = 150000000L
    assert(pr1("a") === base + 85L * scale / 100L)
    assert(pr1("b") === base + 85L * (scale / 2) / 100L)
    assert(pr1("c") === base + 85L * (scale / 2 + scale) / 100L)
    OperatorCaches.release()
  }

  test("pageRank is partitioning-invariant (bit-identical, 3 iterations)") {
    val e0 = spark.read.parquet(s"$sfDir/orders.parquet")
      .join(spark.read.parquet(s"$sfDir/lineitem.parquet"),
        col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst"))
      .distinct()
    val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
    val a = Graphs.pageRank(edges, 2).as[(String, Long)].collect().toMap
    val b = Graphs.pageRank(edges.repartition(13), 2)
      .as[(String, Long)].collect().toMap
    assert(a === b)
    assert(a.values.forall(_ > 0L))
    OperatorCaches.release()
  }
}
