package graft.tools
// Scratch: matched-scale (10M-row) parquet→CSV conversion layout probe —
// which input layout / partition count saturates local[32]?
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.operators.Convert

object Time10M {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tmp = Files.createTempDirectory("t10m").toString
    def time(n: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$n%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    val n = li.count()
    val rep = ((10000000L + n - 1) / n).toInt
    println(s"lineitem rows=$n rep=$rep")
    val big = (1 to rep).map(_ => li).reduce(_ union _)
    time("build default")(big.write.mode("overwrite").parquet(s"$tmp/big_default"))
    time("build repart32")(big.repartition(32).write.mode("overwrite").parquet(s"$tmp/big_32"))
    println("default read partitions: " + spark.read.parquet(s"$tmp/big_default").rdd.getNumPartitions)
    println("repart32 read partitions: " + spark.read.parquet(s"$tmp/big_32").rdd.getNumPartitions)
    time("warmup")(Convert.parquetToCsv(spark, s"$tmp/big_default", s"$tmp/csv_w"))
    time("conv default")(Convert.parquetToCsv(spark, s"$tmp/big_default", s"$tmp/csv_a"))
    time("conv default again")(Convert.parquetToCsv(spark, s"$tmp/big_default", s"$tmp/csv_b"))
    time("conv from 32files")(Convert.parquetToCsv(spark, s"$tmp/big_32", s"$tmp/csv_c"))
    time("conv from 32files b")(Convert.parquetToCsv(spark, s"$tmp/big_32", s"$tmp/csv_d"))
    spark.conf.set("spark.sql.files.maxPartitionBytes", "32m")
    time("conv default mpb32m")(Convert.parquetToCsv(spark, s"$tmp/big_default", s"$tmp/csv_e"))
    time("conv 32files mpb32m")(Convert.parquetToCsv(spark, s"$tmp/big_32", s"$tmp/csv_f"))
    spark.conf.set("spark.sql.files.maxPartitionBytes", "16m")
    time("conv default mpb16m")(Convert.parquetToCsv(spark, s"$tmp/big_default", s"$tmp/csv_g"))
    spark.stop()
  }
}
