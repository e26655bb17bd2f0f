package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-8 optimization evidence: time the retrieval family (q27, q132,
  * q138, q145 — now sharing the [[graft.operators.Postings]] corpus index)
  * and q137 PageRank (persisted edge input, periodic checkpointing) under
  * Bench's exact release discipline (operator caches dropped per query,
  * the posting pool surviving across the family).
  *
  * Run: SPARK_GRAFT_SF_DIR=… sbt "runMain graft.tools.TimeRetrievalR8"
  */
object TimeRetrievalR8 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val targets = Seq("q27_tfidf_topterms", "q132_tfidf_retrieval",
      "q138_bm25", "q145_hybrid_rrf", "q137_pagerank",
      "q114_pq_train", "q115_pq_encode", "q116_pq_adc_ivf", "q126_ann_rerank")
    val byName = graft.SparkEntry.queries
    // JIT warm-up on the tiny fixture, like Bench's warm block
    targets.foreach { n =>
      try byName(n)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
      graft.operators.OperatorCaches.release()
    }
    graft.operators.Postings.release()
    graft.operators.FramePool.release()

    var familyTotal = 0.0
    targets.foreach { n =>
      val t0 = System.nanoTime()
      byName(n)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      graft.operators.OperatorCaches.release()
      if (n != "q137_pagerank") familyTotal += sec
      println(f"TIMER $n: $sec%.2f s")
    }
    println(f"TIMER retrieval_family_total: $familyTotal%.2f s")
    graft.operators.Postings.release()
    graft.operators.FramePool.release()
    spark.stop()
  }
}
