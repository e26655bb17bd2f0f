package graft.tools
// Scratch: per-op cost of shingle hashing variants at sf0.1.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queries.Q._

object TimeHash {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time[T](n: String)(f: => T): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$n%-24s ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    val toks = t(spark, d, "documents").select(col("doc_id"), split(col("text"), " ").as("t"))
    def sh(body: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      toks.select(transform(sequence(lit(1), size(col("t")) - 2),
        i => body(concat_ws(" ", element_at(col("t"), i), element_at(col("t"), i + 1), element_at(col("t"), i + 2)))).as("x"))
    time("warmup")(sh(s => s).agg(count(lit(1))).collect())
    time("strings only")(sh(s => s).agg(count(lit(1))).collect())
    time("md5")(sh(s => md5(s)).agg(count(lit(1))).collect())
    time("md5+substr")(sh(s => substring(md5(s), 1, 15)).agg(count(lit(1))).collect())
    time("md5+substr+conv+cast")(sh(s => conv(substring(md5(s), 1, 15), 16, 10).cast("long")).agg(count(lit(1))).collect())
    time("xxhash64")(sh(s => xxhash64(s)).agg(count(lit(1))).collect())
    val h = (s: org.apache.spark.sql.Column) => conv(substring(md5(s), 1, 15), 16, 10).cast("long")
    time("+array_distinct")(sh(s => h(s)).select(array_distinct(col("x")).as("x")).agg(count(lit(1))).collect())
    import graft.functions.TextFunctions.shingleHashSetFromTokens
    time("shingleHashSet fn")(toks.select(shingleHashSetFromTokens(col("t"), 3).as("x")).agg(count(lit(1))).collect())
    val p1 = toks.select(col("doc_id"), shingleHashSetFromTokens(col("t"), 3).as("x")).persist()
    time("persist+count")(p1.count())
    time("recount cached")(p1.count())
    spark.stop()
  }
}
