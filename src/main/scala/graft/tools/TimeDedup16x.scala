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
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
