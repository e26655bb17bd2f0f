package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc k2 profiling harness — times CSV-conversion variants of the
  * matched-scale lineitem replica to size each serialization cost
  * (timestamp formatting, double rendering) before optimizing the sink.
  * Not part of the registry or bench; evidence lands in PERF_NOTES.md. */
object K2Lab {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("k2lab").master(s"local[${Runtime.getRuntime.availableProcessors().min(32)}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", "/tmp/graft_k2lab_local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = "/tmp/graft_k2lab"
    graft.operators.Convert.deleteRecursively(java.nio.file.Paths.get(out))

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val n = li.count()
    val rep = math.max(1L, math.min(64L, (10000000L + n - 1) / n))
    val bigPath = s"$out/big_parquet"
    (1L to rep).map(_ => li).reduce(_ union _)
      .write.mode("overwrite").parquet(bigPath)
    println(s"replica rows = ${n * rep}")

    def timed(tag: String)(f: => Unit): Unit = {
      // min of 2 warm runs after 1 untimed warm
      f
      val ts = (1 to 2).map { _ =>
        graft.operators.Convert.deleteRecursively(
          java.nio.file.Paths.get(s"$out/csv"))
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-28s min=${ts.min}%.3f s  runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    val big = spark.read.parquet(bigPath)
    def conv(df: DataFrame): Unit =
      graft.operators.Convert.toCsvDir(df, s"$out/csv")

    timed("base (current sink)") { conv(big) }
    timed("drop timestamp") { conv(big.drop("l_shipdate")) }
    timed("drop doubles") { conv(big.drop("l_quantity", "l_extendedprice",
      "l_discount", "l_tax")) }
    timed("ts pre-fmt date_format") { conv(big.withColumn("l_shipdate",
      date_format(col("l_shipdate"), graft.operators.Convert.TimestampFormat))) }
    timed("only timestamp") { conv(big.select("l_shipdate")) }

    // formatting CPU isolated from the sink: project → noop write
    graft.plans.GraftFunctions.ensureRegistered(spark)
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    timed("noop raw ts") { noop(big.select(col("l_shipdate"))) }
    timed("noop date_format") { noop(big.select(
      date_format(col("l_shipdate"), graft.operators.Convert.TimestampFormat))) }
    timed("noop graft_csv_ts") { noop(big.select(
      call_function("graft_csv_ts", col("l_shipdate")))) }
    spark.stop()
  }
}
