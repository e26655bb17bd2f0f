package graft.tools
// One-shot audit: physical-plan anti-pattern counts for EVERY registered
// query at sf0.001 (calibration input for RegistryPlanSpec's whitelist).
import org.apache.spark.sql.SparkSession

object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    graft.SparkEntry.allSpecs.foreach { s =>
      try {
        val plan = s.fn(spark, d).queryExecution.executedPlan.toString
        def n(p: String) = p.r.findAllIn(plan).size
        val cart = n("CartesianProduct")
        val bnlj = n("BroadcastNestedLoopJoin")
        val single = n("Exchange SinglePartition")
        if (cart + bnlj + single > 0)
          println(f"AUDIT ${s.name}%-30s cart=$cart bnlj=$bnlj single=$single")
      } catch {
        case e: Throwable => println(s"AUDIT ${s.name} ERROR ${e.getMessage}")
      }
      graft.operators.OperatorCaches.release()
    }
    graft.operators.Postings.release()
    graft.operators.FramePool.release()
    spark.stop()
  }
}
