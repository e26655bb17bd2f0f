package graft

import org.apache.spark.sql.SparkSession

/** Opinionated session bootstrap for running the graft engine — the
  * defaults a 1000-executor deployment wants, gathered in one place so
  * `spark-submit` users and embedded callers start from the same
  * posture. Everything here is a DEFAULT (`.config` before `getOrCreate`
  * loses to explicit submit-time conf), and the graft extensions
  * (functions + custom operators + optional rewrites) come along.
  */
object GraftSession {

  /** Recommended cluster configuration:
    *  - AQE on with coalescing AND skew-join splitting — runtime
    *    re-planning replaces hand-tuned shuffle partition counts at
    *    scale, and skewed join partitions split instead of strangling a
    *    task (the salted-agg operator covers the aggregation side);
    *  - shuffle partitions sized for the cluster, not the 200 default
    *    (callers pass cores; AQE coalesces down from there);
    *  - 128 MiB file partitions (the parquet row-group sweet spot) and
    *    vectorized reads;
    *  - extensions: graft_dot / graft_shingle_hashes / graft_simhash /
    *    graft_minhash in SQL + the TopKPerKey strategy and window-top-k
    *    rewrite.
    */
  def builder(appName: String, defaultParallelism: Int): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.shuffle.partitions", (defaultParallelism * 2).toString)
      .config("spark.sql.files.maxPartitionBytes", (128L * 1024 * 1024).toString)
      .config("spark.sql.parquet.enableVectorizedReader", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")

  /** Local development/test session with the same engine posture at
    * `local[n]` scale. */
  def local(appName: String, cores: Int): SparkSession = {
    val spark = builder(appName, cores)
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // getOrCreate may return a pre-existing session whose builder confs
    // (incl. extensions) did NOT apply — make the FULL graft surface
    // (functions, strategy, AND the window-top-k rewrite the builder
    // advertises) present either way, so fresh and reused sessions plan
    // identically.
    graft.plans.GraftFunctions.ensureRegistered(spark)
    graft.plans.TopKPerKeyPlans.ensureRewrite(spark) // includes the strategy
    spark
  }
}
