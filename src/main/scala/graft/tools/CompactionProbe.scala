package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling probe for the takedown/compaction path: lay out an ingest-sink
  * corpus (batch dirs + pairs + tombstones over the documents fixture,
  * 1% of ids tombstoned) at 1× and N×, time
  * [[graft.streaming.EventStreams.compactTakedowns]] at both scales, and
  * report the ratio. The fold is one anti-join + full rewrite of the
  * survivor corpus plus a pairs-frame prune — linear in corpus size by
  * construction; a superlinear ratio here would mean the staged-swap
  * rewrite shape regressed. Evidence lands in PERF_NOTES.md. */
object CompactionProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val replicas = args.headOption.map(_.toInt).getOrElse(10)
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    def layout(rep: Int): String = {
      val dir = java.nio.file.Files.createTempDirectory("cprobe").toString
      val corpus = (0 until rep).map(r =>
          docs.select((col("doc_id") + lit(r * 10000000L)).as("doc_id"),
            col("text")))
        .reduce(_ unionAll _)
      // two batch dirs, like a real ingest history
      corpus.filter(pmod(col("doc_id"), lit(2)) === 0)
        .write.parquet(s"$dir/corpus/batch=0")
      corpus.filter(pmod(col("doc_id"), lit(2)) === 1)
        .write.parquet(s"$dir/corpus/batch=1")
      // a pairs frame ~corpus-sized (synthetic adjacent-id pairs)
      corpus.select(col("doc_id").as("a_id"),
          (col("doc_id") + 1L).as("b_id"))
        .write.parquet(s"$dir/corpus_pairs/batch=1")
      // 1% of ids tombstoned
      corpus.filter(pmod(col("doc_id"), lit(100)) === 7)
        .select("doc_id")
        .write.parquet(s"$dir/corpus_tombstones/batch=1")
      dir
    }

    def run(rep: Int): (Double, Long) = {
      val dir = layout(rep)
      val t0 = System.nanoTime()
      val n = graft.streaming.EventStreams.compactTakedowns(
        spark, s"$dir/corpus", "doc_id")
      ((System.nanoTime() - t0) / 1e9, n)
    }

    run(1) // warm (JIT + committer)
    val (s1, n1) = run(1)
    val (sN, nN) = run(replicas)
    println(f"compactTakedowns  1x: $s1%6.2f s ($n1 live)   ${replicas}x: $sN%6.2f s ($nN live)   ratio ${sN / s1}%4.1f")
    spark.stop()
  }
}
