package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-shape evidence for the dedup family: time lshPairs and
  * simhashPairs on the sf0.1 documents fixture (5k docs) and on a 16×
  * replica (80k docs) whose replicas are token-prefixed per copy — each
  * replica keeps the ORIGINAL corpus's internal similarity structure but
  * shares no shingles across replicas, so true near-dup pairs grow ~16×
  * (not 256×) and the measurement exercises engine scaling, not pair
  * explosion. Linear-ish wall-clock growth (≪16× would mean fixed costs
  * dominate; ≫16× would mean a quadratic term survived) is the check.
  *
  * Run: SPARK_GRAFT_SF_DIR=… sbt "runMain graft.tools.TimeDedup16x"
  */
object TimeDedup16x {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"TIMER $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val n = docs.count()
    val rep = 16
    // replica i: ids offset by i*n; every token prefixed with "d<i>" so
    // replicas share no shingles (regexp prefixes token starts)
    val big = (0 until rep).map { i =>
      docs.select((col("doc_id") + lit(i * n)).as("doc_id"),
        regexp_replace(col("text"), "(^| )", "$1d" + i).as("text"))
    }.reduce(_ unionByName _)
    val bigPath = java.nio.file.Files.createTempDirectory("dedup16x").toString + "/docs"
    big.repartition(32).write.mode("overwrite").parquet(bigPath)
    val big2 = spark.read.parquet(bigPath)
    println(s"base=$n docs, replica=${big2.count()} docs")

    for (round <- 1 to 2) {
      timed(s"lshPairs 1x (round $round)") {
        graft.operators.Dedup.lshPairs(docs, "doc_id", "text").count()
      }
      graft.operators.OperatorCaches.release()
      timed(s"lshPairs 16x (round $round)") {
        graft.operators.Dedup.lshPairs(big2, "doc_id", "text").count()
      }
      graft.operators.OperatorCaches.release()
      timed(s"simhashPairs 1x (round $round)") {
        graft.operators.Dedup.simhashPairs(docs, "doc_id", "text").count()
      }
      graft.operators.OperatorCaches.release()
      timed(s"simhashPairs 16x (round $round)") {
        graft.operators.Dedup.simhashPairs(big2, "doc_id", "text").count()
      }
      graft.operators.OperatorCaches.release()
      timed(s"sortedNeighborPairs 1x (round $round)") {
        graft.operators.Dedup.sortedNeighborPairs(docs, "doc_id", "text").count()
      }
      graft.operators.OperatorCaches.release()
      timed(s"sortedNeighborPairs 16x (round $round)") {
        graft.operators.Dedup.sortedNeighborPairs(big2, "doc_id", "text").count()
      }
      graft.operators.OperatorCaches.release()
      // decontamination: exact hash join vs Bloom-prefiltered — the shapes
      // whose gap WIDENS with corpus size (the bloom probe prunes the
      // training-side shuffle; at 16x the training stream is 16x, the
      // benchmark side constant)
      val bench16 = big2.filter(col("doc_id") % 100 === 0)
      val train16 = big2.filter(col("doc_id") % 100 =!= 0)
      timed(s"contaminatedDocs exact 16x (round $round)") {
        graft.operators.Quality.contaminatedDocs(
          train16, bench16, "doc_id", "text", 8).count()
      }
      graft.operators.OperatorCaches.release()
      timed(s"bloomContaminatedDocs 16x (round $round)") {
        graft.operators.Quality.bloomContaminatedDocs(
          train16, bench16, "doc_id", "text", 8).count()
      }
      graft.operators.OperatorCaches.release()
      if (round == 1) {
        // the scale argument in rows: how much of the training-side hash
        // stream the Bloom probe keeps out of the confirming shuffle —
        // measured via the operator's own stats hook so the evidence can't
        // drift from bloomContaminatedDocs' actual filter construction
        val (total, kept, filterBytes) = graft.operators.Quality
          .bloomPrefilterStats(train16, bench16, "doc_id", "text", 8)
        graft.operators.OperatorCaches.release()
        println(f"BLOOM selectivity: $kept%,d of $total%,d training hashes " +
          f"(${100.0 * kept / total}%.2f%%) reach the confirm shuffle; " +
          f"filter size $filterBytes%,d bytes")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
