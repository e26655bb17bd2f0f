package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-shape evidence for the round-5 corpus operators: time
  * unigramLmScore, duplicatedSpans, cmsHeavyHitters, and
  * sparseCosinePairs on the sf0.1 documents fixture (5 k docs) and a 16×
  * token-prefixed replica (80 k docs — [[TimeDedup16x]]'s construction:
  * replicas keep internal structure, share no tokens/spans across
  * copies, so span-dup mass and block populations grow ~16×, not 256×).
  * Linear-ish growth is the pass condition: ≫16× would mean a quadratic
  * term (uncapped block, posting re-shuffle) survived.
  *
  * Run: SPARK_GRAFT_SF_DIR=… sbt "runMain graft.tools.TimeCorpus16x"
  */
object TimeCorpus16x {
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
    val big = (0 until 16).map { i =>
      docs.select((col("doc_id") + lit(i * n)).as("doc_id"),
        regexp_replace(col("text"), "(^| )", "$1d" + i).as("text"))
    }.reduce(_ unionByName _)
    val bigPath = java.nio.file.Files.createTempDirectory("corpus16x").toString + "/docs"
    big.repartition(32).write.mode("overwrite").parquet(bigPath)
    val big2 = spark.read.parquet(bigPath)
    println(s"base=$n docs, replica=${big2.count()} docs")

    import graft.operators.{CorpusStats, InvertedIndex, OperatorCaches}
    for (round <- 1 to 2) {
      for ((tag, d) <- Seq("1x" -> docs, "16x" -> big2)) {
        timed(s"unigramLm $tag (round $round)") {
          CorpusStats.unigramLmScore(d, "doc_id", "text").count()
        }
        OperatorCaches.release()
        timed(s"spanDedup $tag (round $round)") {
          CorpusStats.duplicatedSpans(d, "doc_id", "text").count()
        }
        OperatorCaches.release()
        timed(s"cmsHeavyHitters $tag (round $round)") {
          CorpusStats.cmsHeavyHitters(d, "text", threshold = 900L).count()
        }
        OperatorCaches.release()
        timed(s"sparseCosine $tag (round $round)") {
          InvertedIndex.sparseCosinePairs(d, "doc_id", "text").count()
        }
        OperatorCaches.release()
      }
    }
    spark.stop()
  }
}
