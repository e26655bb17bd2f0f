package graft.tools

// Ad-hoc stage-level profiling probes for the round-17 optimization
// targets — builder-side iteration aid only, never part of the bench.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProbeR17 {
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

    def timeIt(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBE $label%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    args.headOption.getOrElse("q249") match {
      case "q249" =>
        timeIt("edges pooled build+count") {
          graft.queries.Q.custPartEdges(spark, sfDir).count()
        }
        val edges = graft.queries.Q.custPartEdges(spark, sfDir)
        timeIt("hits 2 iterations (count)") {
          graft.operators.Graphs.hits(edges, iterations = 2)
            .write.format("noop").mode("overwrite").save()
        }
        graft.operators.OperatorCaches.release()
        timeIt("hits 2 iterations warm2") {
          graft.operators.Graphs.hits(edges, iterations = 2)
            .write.format("noop").mode("overwrite").save()
        }
        timeIt("hits+window (full q249) warm") {
          graft.SparkEntry.queries("q249_hits")(spark, sfDir).count()
        }
        graft.operators.OperatorCaches.release()
      case "q208" =>
        val base = spark.read.parquet(s"$sfDir/lineitem.parquet")
          .select(col("l_suppkey"), col("l_extendedprice").as("x"))
        timeIt("one groupedAtRanks med50") {
          graft.operators.Percentiles.groupedAtRanks(
            base, "l_suppkey", "x",
            n => array(graft.operators.Percentiles.floorPctRank(n, 50)))
            .write.format("noop").mode("overwrite").save()
        }
        graft.operators.OperatorCaches.release()
        timeIt("one groupedAtRanks med50 warm") {
          graft.operators.Percentiles.groupedAtRanks(
            base, "l_suppkey", "x",
            n => array(graft.operators.Percentiles.floorPctRank(n, 50)))
            .write.format("noop").mode("overwrite").save()
        }
        graft.operators.OperatorCaches.release()
        timeIt("full q208 warm") {
          graft.SparkEntry.queries("q208_grouped_mad")(spark, sfDir).count()
        }
        graft.operators.OperatorCaches.release()
      case "q239" =>
        timeIt("pooled shingles build") {
          graft.SparkEntry.queries("q31_minhash_sig")(spark, sfDir).count()
        }
        graft.operators.OperatorCaches.release()
        timeIt("full q239 pool-warm") {
          graft.SparkEntry.queries("q239_prefix_filter_join")(spark, sfDir).count()
        }
        graft.operators.OperatorCaches.release()
        timeIt("full q239 pool-warm 2") {
          graft.SparkEntry.queries("q239_prefix_filter_join")(spark, sfDir).count()
        }
        graft.operators.OperatorCaches.release()
        timeIt("full q155 pool-warm") {
          graft.SparkEntry.queries("q155_containment_pairs")(spark, sfDir).count()
        }
        graft.operators.OperatorCaches.release()
      case "q239parts" =>
        import org.apache.spark.sql.expressions.Window
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        timeIt("pooled shingles warm") {
          graft.SparkEntry.queries("q31_minhash_sig")(spark, sfDir).count()
        }
        graft.operators.OperatorCaches.release()
        val sets = graft.operators.Dedup.shingleSets(docs, "doc_id", "text", 3)
        val posting = sets.select(col("doc_id"), explode(col("hset")).as("h"))
          .persist()
        timeIt("posting materialize") { posting.count() }
        val dfreq = posting.groupBy(col("h")).agg(count(lit(1)).as("df"))
        timeIt("dfreq") {
          dfreq.write.format("noop").mode("overwrite").save() }
        val ranked = posting.join(dfreq, Seq("h"))
          .withColumn("rnk", row_number().over(
            Window.partitionBy(col("doc_id")).orderBy(asc("df"), asc("h"))))
        timeIt("ranked window") {
          ranked.write.format("noop").mode("overwrite").save() }
        val sizes = sets.select(col("doc_id"), size(col("hset")).cast("long").as("n"))
        val prefix = ranked.join(sizes, Seq("doc_id"))
          .filter(col("rnk") <= col("n") - expr("(n * 1 + 1) DIV 2") + lit(1L))
          .select(col("doc_id"), col("h")).persist()
        timeIt("prefix materialize") { println("prefix rows " + prefix.count()) }
        val cand = prefix.as("a").join(posting.as("b"),
            col("a.h") === col("b.h") && col("a.doc_id") =!= col("b.doc_id"))
          .select(least(col("a.doc_id"), col("b.doc_id")).as("a_id"),
            greatest(col("a.doc_id"), col("b.doc_id")).as("b_id"))
          .distinct().persist()
        timeIt("cand join+distinct") { println("cand rows " + cand.count()) }
        timeIt("full q239") {
          graft.SparkEntry.queries("q239_prefix_filter_join")(spark, sfDir).count()
        }
        posting.unpersist(); prefix.unpersist(); cand.unpersist()
        graft.operators.OperatorCaches.release()
      case other =>
        println(s"unknown probe: $other")
    }
    graft.operators.Postings.release()
    graft.operators.FramePool.release()
    spark.stop()
  }
}
