package graft.tools

import org.apache.spark.sql.SparkSession

/** Reproduce Bench's exact k2 methodology in isolation: union-replica
  * write, warm pass, two timed conversions — to attribute the bench's k2
  * number between replica layout and background writeback.
  * Run: SPARK_GRAFT_SF_DIR=… sbt "runMain graft.tools.TimeK2Bench"
  */
object TimeK2Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tmp = java.nio.file.Files.createTempDirectory("k2bench").toString

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val n = li.count()
    val rep = ((10000000L + n - 1) / n).toInt
    val bigPath = s"$tmp/lineitem_big"
    val t0 = System.nanoTime()
    (1 to rep).map(_ => li).reduce(_ union _)
      .write.mode("overwrite").parquet(bigPath)
    println(f"PROF replica_write: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    println(s"PROF replica_files: ${new java.io.File(bigPath).listFiles.count(_.getName.startsWith("part-"))}")

    def once(i: Int): Double = {
      val out = s"$tmp/out$i"
      val t = System.nanoTime()
      graft.operators.Convert.parquetToCsv(spark, bigPath, out)
      val s = (System.nanoTime() - t) / 1e9
      graft.operators.Convert.deleteRecursively(java.nio.file.Paths.get(out))
      s
    }
    val w = once(0)
    val a = once(1); val b = once(2)
    println(f"PROF k2_bench_style: warm=$w%.2f a=$a%.2f b=$b%.2f min=${math.min(a, b)}%.2f")
    // same conversion after the replica's dirty pages settle
    Thread.sleep(15000)
    val c = once(3); val d = once(4)
    println(f"PROF k2_after_settle: c=$c%.2f d=$d%.2f min=${math.min(c, d)}%.2f")
    spark.stop()
  }
}
