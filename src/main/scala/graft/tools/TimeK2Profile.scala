package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decompose k2_convert_csv_10m: where do the seconds go — parquet read,
  * univocity CSV serialization, timestamp formatting, or the sink?
  * Run: sbt "runMain graft.tools.TimeK2Profile /tmp/k2_duck/big.parquet"
  */
object TimeK2Profile {
  def main(args: Array[String]): Unit = {
    val in = args.headOption.getOrElse("/tmp/k2_duck/big.parquet")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tmp = java.nio.file.Files.createTempDirectory("k2prof").toString

    def timed(label: String)(f: => Unit): Unit = {
      // min of two, cold JIT absorbed by caller ordering
      def once(): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      once(); val s = math.min(once(), once())
      println(f"PROF $label: $s%.2f s")
    }

    val df = spark.read.parquet(in)
    timed("read_noop") { df.write.mode("overwrite").format("noop").save() }
    timed("csv_full") {
      graft.operators.Convert.parquetToCsv(spark, in, s"$tmp/full")
    }
    val noTs = df.schema.fields.filterNot(_.dataType.typeName.startsWith("timestamp")).map(_.name)
    timed("csv_no_timestamps") {
      graft.operators.Convert.toCsvDir(df.select(noTs.head, noTs.tail: _*), s"$tmp/nots")
    }
    timed("csv_strings_only") {
      val allStr = df.select(df.columns.map(c => col(c).cast("string").as(c)): _*)
      graft.operators.Convert.toCsvDir(allStr, s"$tmp/str")
    }
    timed("text_concat_ws") {
      df.select(concat_ws(",", df.columns.map(c => col(c).cast("string")): _*).as("value"))
        .write.mode("overwrite").text(s"$tmp/text")
    }
    // output sizes for the byte-volume comparison
    def dirBytes(p: String): Long = {
      val d = new java.io.File(p)
      if (!d.exists) 0L else d.listFiles.map(f => if (f.isFile) f.length else 0L).sum
    }
    println(s"PROF bytes full=${dirBytes(s"$tmp/full")} text=${dirBytes(s"$tmp/text")}")
    spark.stop()
  }
}
