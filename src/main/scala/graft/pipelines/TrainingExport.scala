package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Convert, Quality}

/** The last mile of the training-data story: take a CURATED corpus (the
  * output of the gate → dedup → decontaminate composites) and produce
  * what a training job actually mounts — hive-partitioned shard files in
  * the deterministic shuffle order, plus a manifest of per-shard row and
  * token counts for the loader's bookkeeping.
  *
  * Determinism contract: shard membership and in-shard position come
  * from [[Quality.trainingShuffle]] (md5-keyed — reproducible across
  * engines, partitionings and reruns), so re-exporting the same corpus
  * with the same salt yields byte-identical shard SETS. Rows inside a
  * shard carry their `pos` explicitly; loaders sort on it (file order
  * inside a multi-file shard dir is not part of the contract).
  *
  * Scale shape: one shuffle for the permutation windows (per-shard,
  * parallel), one repartition by shard for the write — each shard dir is
  * written by tasks holding only that shard's rows, and the manifest
  * aggregation reuses the same frame. Nothing driver-sized but the
  * manifest itself (nShards rows).
  */
object TrainingExport {

  final case class Result(manifestPath: String,
                          shards: Seq[(Long, Long, Long)]) // (shard, rows, tokens)

  def run(spark: SparkSession, docs: DataFrame, idCol: String,
          textCol: String, outDir: String, nShards: Int,
          salt: String = "shuf"): Result = {
    require(nShards >= 1, s"nShards must be >= 1 (got $nShards)")
    val order = Quality.trainingShuffle(docs, idCol, nShards, salt)
    val ordered = docs.join(order, idCol)
    ordered
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite").partitionBy("shard")
      .parquet(s"$outDir/shards")
    // manifest from the WRITTEN data — counts what landed, not what was
    // planned (the K6/K7 discipline: artifacts audit themselves)
    val written = spark.read.parquet(s"$outDir/shards")
    val stats = written.groupBy(col("shard"))
      .agg(count(lit(1)).as("rows"),
        sum(size(split(col(textCol), " ")).cast("long")).as("tokens"))
      .orderBy("shard")
      .collect()
      .map(r => (r.get(0).toString.toLong, r.getLong(1), r.getLong(2)))
      .toSeq
    import spark.implicits._
    val manifestPath = s"$outDir/manifest.csv"
    Convert.csvSingleFile(
      stats.toDF("shard", "rows", "tokens").coalesce(1), manifestPath)
    Result(manifestPath, stats)
  }
}
