package graft.tools
// Scratch diagnostic for q32 persist-strategy variants (not part of the engine surface).
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.functions.TextFunctions._
import graft.operators.Dedup
import graft.queries.Q._

object TimeQ32 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$n%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = t(spark, d, "documents")
    time("warm scan")(docs.count())

    def variant(name: String, persistSets: Boolean, persistBands: Boolean,
                capViaWindow: Boolean): Unit = {
      spark.catalog.clearCache()
      val numBands = 4; val rowsPerBand = 2; val maxBucketSize = 1000L
      val sets0 = Dedup.shingleSets(docs, "doc_id", "text", 3)
      val sets = if (persistSets) sets0.persist(StorageLevel.MEMORY_AND_DISK) else sets0
      val sigs = Dedup.minhashSignatures(sets, "doc_id", numBands * rowsPerBand)
      val bands0 = sigs.select(col("doc_id"), explode(array(
        (0 until numBands).map(j => struct(lit(j).as("band"),
          concat_ws("_", (0 until rowsPerBand).map(r => col(s"m${j * rowsPerBand + r}")): _*).as("mv"))): _*))
        .as("bv"))
        .select(col("doc_id"), col("bv.band").as("band"), col("bv.mv").as("mv"))
      val bands = if (persistBands) bands0.persist(StorageLevel.MEMORY_AND_DISK) else bands0
      val capped =
        if (capViaWindow) {
          import org.apache.spark.sql.expressions.Window
          bands.withColumn("bkt_n",
            count(lit(1)).over(Window.partitionBy(col("band"), col("mv"))))
            .filter(col("bkt_n") <= maxBucketSize)
            .drop("bkt_n")
        } else {
          val small = bands.groupBy(col("band"), col("mv"))
            .agg(count(lit(1)).as("bkt_n")).filter(col("bkt_n") <= maxBucketSize)
            .select(col("band"), col("mv"))
          bands.join(small, Seq("band", "mv"))
        }
      val cand = capped.as("a").join(capped.as("b"),
          col("a.band") === col("b.band") && col("a.mv") === col("b.mv") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .distinct()
      val pairs = cand
        .join(sets.select(col("doc_id").as("a_id"), col("hset").as("a_set")), "a_id")
        .join(sets.select(col("doc_id").as("b_id"), col("hset").as("b_set")), "b_id")
        .select(col("a_id"), col("b_id"), jaccard(col("a_set"), col("b_set")).as("jac"))
        .filter(col("jac") >= 0.1)
      time(name)(pairs.count())
    }

    // JIT/codegen warm-up across all plan shapes, untimed
    variant("warmup1 (discard)", persistSets = true, persistBands = true, capViaWindow = false)
    variant("warmup2 (discard)", persistSets = false, persistBands = true, capViaWindow = true)
    for (round <- 1 to 2) {
      variant(s"r$round sets+bands", persistSets = true, persistBands = true, capViaWindow = false)
      variant(s"r$round sets only", persistSets = true, persistBands = false, capViaWindow = false)
      variant(s"r$round bands only", persistSets = false, persistBands = true, capViaWindow = false)
      variant(s"r$round none", persistSets = false, persistBands = false, capViaWindow = false)
      variant(s"r$round sets+bands win", persistSets = true, persistBands = true, capViaWindow = true)
      variant(s"r$round bands only win", persistSets = false, persistBands = true, capViaWindow = true)
      variant(s"r$round sets only win", persistSets = true, persistBands = false, capViaWindow = true)
    }
    spark.stop()
  }
}
