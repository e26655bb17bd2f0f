package graft.tools
// Scratch: where does q37 (dup clusters) spend its time — LSH pairs or the
// label-propagation loop?
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.queries.Q._

object TimeQ37 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$n%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = t(spark, d, "documents")
    time("warm scan")(docs.count())
    val pairs = Dedup.lshPairs(docs, "doc_id", "text", numBands = 4,
      minJaccard = 0.1, k = 3, rowsPerBand = 2)
    time("lshPairs")(pairs.count())
    val mat = pairs.localCheckpoint()
    time("clusters on materialized pairs")(Dedup.dupClusters(mat).count())
    time("clusters again")(Dedup.dupClusters(mat).count())
    time("full q37 (pairs cached)")(Dedup.dupClusters(pairs).count())
    import spark.implicits._
    val tiny = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id")
    time("clusters on 3 pairs")(Dedup.dupClusters(tiny).count())
    spark.stop()
  }
}
