package graft.tools

// Correlates `WARN DAGScheduler: Broadcasting large task binary` lines
// with the query that emitted them: runs every registry query in order,
// printing a marker to stderr (the same stream log4j's console appender
// writes to) before each, so a grep over the combined stderr attributes
// every warning. Builder-side iteration aid only.
import org.apache.spark.sql.SparkSession

object BinaryHunt {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft_spark"
        else System.getProperty("java.io.tmpdir"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val only: Option[Set[String]] =
      if (args.nonEmpty) Some(args.toSet) else None
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        System.err.println(s"###Q $name"); System.err.flush()
        try fn(spark, sfDir).count()
        catch { case e: Throwable =>
          System.err.println(s"###Q $name FAILED: ${e.getMessage}") }
        graft.operators.OperatorCaches.release()
      }
    graft.operators.Postings.release()
    graft.operators.FramePool.release()
    spark.stop()
  }
}
