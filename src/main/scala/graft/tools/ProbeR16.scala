package graft.tools

// Round-16 optimization scratch probe: time the sub-stages of expensive
// queries in isolation (builder-side iteration aid only; not part of any
// driver surface). Evolves during the round.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProbeR16 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft_spark"
        else System.getProperty("java.io.tmpdir"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.entry(spark).count() // warm-up
    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $label%-32s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }
    val NumBands = 4
    val RowsPerBand = 2
    args.headOption.getOrElse("q204") match {
      case "q204" =>
        val docs = graft.queries.Q.t(spark, sfDir, "documents")
        val oldDocs = docs.filter(col("doc_id") % 10 =!= 7)
        val newDocs = docs.filter(col("doc_id") % 10 === 7)
        timed("old lshPairs") {
          graft.operators.Dedup.lshPairs(oldDocs, "doc_id", "text",
            numBands = NumBands, minJaccard = 0.1, k = 3,
            rowsPerBand = RowsPerBand).count()
        }
        val oldPairs = graft.operators.Dedup.lshPairs(oldDocs, "doc_id",
          "text", numBands = NumBands, minJaccard = 0.1, k = 3,
          rowsPerBand = RowsPerBand)
        timed("old clustersStar") {
          graft.operators.Dedup.dupClustersStar(oldPairs).count()
        }
        timed("new lshPairs") {
          graft.operators.Dedup.lshPairs(newDocs, "doc_id", "text",
            numBands = NumBands, minJaccard = 0.1, k = 3,
            rowsPerBand = RowsPerBand).count()
        }
        timed("cross lshPairsAgainst") {
          graft.operators.Dedup.lshPairsAgainst(newDocs, oldDocs, "doc_id",
            "text", numBands = NumBands, minJaccard = 0.1, k = 3,
            rowsPerBand = RowsPerBand).count()
        }
        timed("full q204") {
          graft.SparkEntry.queries("q204_dupgraph_append")(spark, sfDir).count()
        }
        timed("full q204 again") {
          graft.SparkEntry.queries("q204_dupgraph_append")(spark, sfDir).count()
        }
      case "q204b" =>
        val docs = graft.queries.Q.t(spark, sfDir, "documents")
        val oldDocs = docs.filter(col("doc_id") % 10 =!= 7)
        val newDocs = docs.filter(col("doc_id") % 10 === 7)
        val idx = graft.operators.DupGraph.build(oldDocs, "doc_id", "text",
          numBands = NumBands, minJaccard = 0.1, k = 3,
          rowsPerBand = RowsPerBand)
        timed("warm build.pairs") { idx.pairs.count() }
        timed("warm build.clusters") { idx.clusters.count() }
        timed("within(new)") {
          graft.operators.Dedup.lshPairs(newDocs, "doc_id", "text",
            numBands = NumBands, minJaccard = 0.1, k = 3,
            rowsPerBand = RowsPerBand).count()
        }
        timed("cross") {
          graft.operators.Dedup.lshPairsAgainst(newDocs, oldDocs, "doc_id",
            "text", numBands = NumBands, minJaccard = 0.1, k = 3,
            rowsPerBand = RowsPerBand).count()
        }
        val app = graft.operators.DupGraph.append(idx, oldDocs, newDocs,
          "doc_id", "text", numBands = NumBands, minJaccard = 0.1, k = 3,
          rowsPerBand = RowsPerBand)
        timed("append.clusters") { app.clusters.count() }
        timed("append.clusters again") {
          graft.operators.DupGraph.append(idx, oldDocs, newDocs,
            "doc_id", "text", numBands = NumBands, minJaccard = 0.1, k = 3,
            rowsPerBand = RowsPerBand).clusters.count()
        }
        timed("full q204") {
          graft.SparkEntry.queries("q204_dupgraph_append")(spark, sfDir).count()
        }
      case "q249" =>
        val edges = graft.queries.Q.t(spark, sfDir, "orders")
          .join(graft.queries.Q.t(spark, sfDir, "lineitem"),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("src"), col("l_partkey").as("dst"))
          .distinct()
        timed("edges build") { edges.count() }
        timed("hits 2 iter") {
          graft.operators.Graphs.hits(edges, iterations = 2).count()
        }
        timed("full q249") {
          graft.SparkEntry.queries("q249_hits")(spark, sfDir).count()
        }
      case "q239" =>
        val docs = graft.queries.Q.t(spark, sfDir, "documents")
        timed("prefixFilterPairs") {
          graft.operators.Dedup.prefixFilterPairs(docs, "doc_id", "text",
            jacNum = 1, jacDen = 2).count()
        }
        timed("full q239 warmpool") {
          graft.SparkEntry.queries("q239_prefix_filter_join")(spark, sfDir).count()
        }
      case "q155" =>
        timed("full q155 coldpool") {
          graft.SparkEntry.queries("q155_containment_pairs")(spark, sfDir).count()
        }
        timed("full q155 warmpool") {
          graft.SparkEntry.queries("q155_containment_pairs")(spark, sfDir).count()
        }
    }
    graft.operators.OperatorCaches.release()
    graft.operators.Postings.release()
    graft.operators.FramePool.release()
    spark.stop()
  }
}
