package graft.tools
// Scratch: cold vs warm parquet→CSV conversion cost at sf0.1.
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.operators.Convert

object TimeConvert {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tmp = Files.createTempDirectory("conv").toString
    def time(n: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$n%-12s ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    time("warm small")(Convert.parquetToCsv(spark, "/root/testdata/sf0.001/lineitem.parquet", s"$tmp/w"))
    time("cold sf0.1")(Convert.parquetToCsv(spark, "/root/testdata/sf0.1/lineitem.parquet", s"$tmp/a"))
    time("warm sf0.1")(Convert.parquetToCsv(spark, "/root/testdata/sf0.1/lineitem.parquet", s"$tmp/b"))
    time("warm sf0.1b")(Convert.parquetToCsv(spark, "/root/testdata/sf0.1/lineitem.parquet", s"$tmp/c"))
    val df = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    println("input partitions: " + df.rdd.getNumPartitions)
    time("repart8")(Convert.toCsvDir(df.repartition(8), s"$tmp/r8"))
    time("repart8b")(Convert.toCsvDir(df.repartition(8), s"$tmp/r8b"))
    time("repart32")(Convert.toCsvDir(df.repartition(32), s"$tmp/r32"))
    time("repart32b")(Convert.toCsvDir(df.repartition(32), s"$tmp/r32c"))
    spark.stop()
  }
}
