package graft.tools
// Probe: invalid inputs to the pipeline surface.
import org.apache.spark.sql.SparkSession
import graft.pipelines.ExtractData
object ProbePipelines {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try { ExtractData.run(spark, Seq("/root/testdata/sf0.001/lineitem.parquet"), Nil, "/tmp/probe_out") }
    catch { case e: IllegalArgumentException => println("EMPTY-SIZES-> " + e.getMessage) }
    try { ExtractData.run(spark, Seq("/nonexistent.parquet"), Seq(10), "/tmp/probe_out2") }
    catch { case e: Throwable => println("BAD-PATH-> " + e.getClass.getSimpleName) }
    spark.stop()
  }
}
