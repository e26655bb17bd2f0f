package graft.tools
// Scratch diagnostic for q32 stage costs (not part of the engine surface).
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.queries.Q._

object TimeQ32 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$n%-16s ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val docs = t(spark, d, "documents").filter(size(tokens(col("text"))) >= 3)
    val withSets = docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), shingleHashSetFromTokens(col("toks"), 3).as("hset")).persist()
    time("materialize")(withSets.count())
    val sigs = withSets.select(col("doc_id") +: (0 until 4).map(j => minhashFromHashes(transform(col("hset"), h => h % MinhashP), j).as(s"m$j")): _*)
    time("sigs")(sigs.count())
    val bands = sigs.select(col("doc_id"), explode(array((0 until 4).map(j => struct(lit(j).as("band"), col(s"m$j").as("mv"))): _*)).as("bv"))
      .select(col("doc_id"), col("bv.band").as("band"), col("bv.mv").as("mv"))
    time("bands")(bands.count())
    val cand = bands.as("a").join(bands.as("b"),
      col("a.band") === col("b.band") && col("a.mv") === col("b.mv") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id")).distinct()
    time("cand")(cand.count())
    val joined = cand
      .join(withSets.select(col("doc_id").as("a_id"), col("hset").as("a_set")), "a_id")
      .join(withSets.select(col("doc_id").as("b_id"), col("hset").as("b_set")), "b_id")
      .select(col("a_id"), col("b_id"), jaccard(col("a_set"), col("b_set")).as("jac"))
      .filter(col("jac") >= 0.1).orderBy("a_id", "b_id")
    time("jaccard+sort")(joined.count())
    time("full again")(joined.count())
    spark.stop()
  }
}
