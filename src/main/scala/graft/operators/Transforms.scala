package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reference-parity row transforms (SURVEY.md §2.3–2.5).
  *
  *  - P2 suffix filter (`utils.py:37-44`: keep files ending `.parquet`)
  *  - P3 stem extraction (`utils.py:44`: split at the FIRST dot)
  *  - O1 ascending sort (`main.py:14`)
  *  - O2 seeded exact-n sample (`utils.py:73`) — Spark's `sample()` is
  *    Bernoulli (inexact count), so exact-n is `orderBy(rand(seed)).limit(n)`;
  *    deterministic for a fixed seed, but the RNG differs from Polars so
  *    row-identity parity with the reference is impossible by construction
  *    (SURVEY.md §5.4) — verify count/schema/stats instead.
  *  - A1 long→wide pivot (`utils.py:28-31`) — Spark pivot requires an
  *    aggregate; `first` is exact when (index, key) is unique, which is the
  *    reference's case.
  */
object Transforms {

  /** Trailing-24-observed-hours 2σ anomaly flags over an hourly count
    * spine `(h, c)` — the ONE copy of the exact-integer squared
    * z-condition shared by the q163 batch query and the streaming
    * anomaly monitor (so the spec-proven batch/stream equality cannot
    * silently diverge):
    *   (c·n − S)² > 4·(n·Q − S²),  n = 24, S = Σc, Q = Σc²
    * DECIMAL-seeded products (nothing wraps at any event rate), no sqrt,
    * no float mean. The global window is over the hour spine, whose
    * cardinality is hours-not-events. Returns
    * (h, c, n_prev, s_prev, anomaly). */
  def eventAnomalyFlags(hourly: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("h")).rowsBetween(-24, -1)
    hourly
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s", sum(col("c")).over(w))
      .withColumn("q", sum(expr("CAST(c AS DECIMAL(38,0)) * c")).over(w))
      .withColumn("dev", expr("CAST(c AS DECIMAL(38,0)) * 24 - s"))
      .withColumn("varn", expr(
        """24 * CAST(q AS DECIMAL(38,0))
          | - CAST(s AS DECIMAL(38,0)) * CAST(s AS DECIMAL(38,0))"""
          .stripMargin))
      .select(col("h"), col("c").cast("long").as("c"),
        col("n").cast("long").as("n_prev"),
        coalesce(col("s").cast("long"), lit(0L)).as("s_prev"),
        when(col("n") === 24,
          col("dev") * col("dev") > lit(4) * col("varn"))
          .otherwise(lit(false)).as("anomaly"))
  }

  /** Burst table from an hourly count frame (event_type, hour, n) — the
    * assembly q215 and the streaming burst monitor SHARE, so streamed
    * reports over merged count partials are the identical expression
    * tree (hourly counts are plain integer sums: merged partials ≡ one
    * batch aggregation). The trailing baseline is a RANGE frame on the
    * epoch key ([−86400 s, −3600 s] — value-ranged, absent hours weigh
    * zero with no gap-fill), the burst decision is the pure-integer
    * 24·n > 3·base24, and the only double is one per-row ratio (null
    * while the trailing window is empty). Window partitioned by
    * event_type — never a global sort. */
  def burstFlags(hourly: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
      .orderBy(col("hsec")).rangeBetween(-86400L, -3600L)
    hourly
      .withColumn("hsec", unix_timestamp(col("hour")))
      .withColumn("base24", coalesce(sum(col("n")).over(w), lit(0L)))
      .select(col("event_type"), col("hour"), col("n"), col("base24"),
        when(col("base24") > 0,
          (lit(24L) * col("n")).cast("double") / col("base24"))
          .as("burst_ratio"),
        (col("base24") > 0 && lit(24L) * col("n") > lit(3L) * col("base24"))
          .as("is_burst"))
      .orderBy("event_type", "hour")
  }

  /** P2: keep rows whose `col` ends with `suffix`. */
  def filterSuffix(df: DataFrame, colName: String, suffix: String): DataFrame =
    df.filter(col(colName).endsWith(suffix))

  /** P3: everything before the first '.' — same first-dot semantics as the
    * reference's `f.split(".")[0]`. */
  def stem(c: Column): Column = split(c, "\\.").getItem(0)

  /** O1: global ascending sort (range-partitioned shuffle at scale). */
  def sortAsc(df: DataFrame, cols: String*): DataFrame =
    df.orderBy(cols.map(col): _*)

  /** O2: seeded exact-n random sample (reference: pandas
    * `df.sample(n, random_state)` — `utils.py:73`), as a SEEDED MD5-RANK
    * top-n: rank = md5(seed || ':' || to_json(row)) and take the n
    * smallest. Round-16 change (verdict item 7): the original
    * `orderBy(rand(seed)).limit(n)` was NOT reproducible — Spark seeds
    * `rand` per PARTITION (seed + partitionIndex), so the "same" seed
    * drew a different sample whenever the partition count or row
    * placement changed (file-split config, cluster size, compaction) — a
    * real reproducibility bug for a pipeline that must re-derive its
    * sample. The hash rank is a pure function of (seed, row content):
    * stable across runs and partitionings — the [[hashSample]]/
    * [[hashTopK]]/q104 determinism discipline applied to seeded exact-n
    * draws. The rank is `xxhash64(seed, cols…)` — Spark's codegen'd
    * row hash, which consumes each column's typed VALUE directly
    * (null-safe, no string materialization; the first md5(to_json)
    * version paid a per-row JSON serialization that benched 28× the
    * rand() original on lineitem). A 64-bit collision between distinct
    * rows at the cut boundary is broken deterministically by the row
    * struct itself (comparator cost only on hash ties). Rows that are
    * full duplicates rank identically and are interchangeable at the
    * cut. Plan shape is unchanged: orderBy+limit →
    * TakeOrderedAndProject (per-partition top-n heap + one n-row merge,
    * O(rows·log n) map-side, n rows of driver traffic at ANY scale). */
  def sampleExactN(df: DataFrame, n: Int, seed: Long): DataFrame = {
    val cols = df.columns.map(col)
    df.orderBy(xxhash64(lit(seed) +: cols: _*).asc,
      struct(cols: _*).asc).limit(n)
  }

  /** A1: pivot long→wide. `values` should be passed when known — it skips
    * the extra distinct-values job Spark otherwise runs. */
  def pivotWide(df: DataFrame, index: String, on: String, value: String,
                values: Seq[String] = Nil): DataFrame = {
    val g = df.groupBy(col(index))
    val p = if (values.nonEmpty) g.pivot(on, values) else g.pivot(on)
    p.agg(first(col(value)))
  }

  /** Deterministic md5-derived bucket of a key in [0, 100) — the basis for
    * reproducible, engine-portable sampling (DuckDB twin:
    * `('0x' || substr(md5(key::VARCHAR),1,15))::BIGINT % 100`). Built on
    * the one shared 60-bit md5 idiom (TextFunctions.md5Long). */
  def hashBucket(key: Column): Column =
    graft.functions.TextFunctions.md5Long(key.cast("string")) % 100

  /** Deterministic hash-based sample: keeps rows whose key bucket falls
    * under `pct` (a per-row expression — pass a constant for a uniform
    * sample or a stratum-dependent CASE for stratified curation).
    *
    * This is the curation-grade sampling a training-data pipeline needs
    * where seeded-RNG sampling ([[sampleExactN]]) can't serve: membership
    * is a pure function of the key, so it is reproducible across engines
    * and runs, stable under data reordering, join-consistent across
    * derived tables of the same key, and extending the pct only ADDS rows
    * (nested samples). No shuffle — a codegen'd filter over the scan. */
  def hashSample(df: DataFrame, key: Column, pct: Column): DataFrame =
    df.filter(hashBucket(key) < pct)

  /** Deterministic FIXED-SIZE sample: the `k` rows with the smallest
    * md5 rank of `key` (key itself as the tie-break), via orderBy+limit
    * — Spark plans a TakeOrderedAndProject: a per-partition top-k heap
    * and one k-row merge, O(n log k) map-side work and k rows of driver
    * traffic at ANY corpus size. DuckDB twin:
    * `ORDER BY ('0x' || substr(md5(key::VARCHAR),1,15))::BIGINT, key
    * LIMIT k`.
    *
    * THE SAMPLING RULE FOR BRUTE-FORCE AUDITS: an evaluation frame that
    * feeds all-pairs ground truth (LSH recall, JL distortion/recall)
    * must bound the sample SIZE, not the sample RATE — a rate-bounded
    * sample grows linearly with the corpus, so its pair set grows
    * QUADRATICALLY (at 100× data a 5% sample does 10,000× the pair
    * work). A fixed-k md5-rank sample keeps audit work O(k²) — constant
    * at any scale — while staying reproducible, engine-portable, and
    * reorder-stable like [[hashSample]]. Unlike [[hashSample]] it is
    * NOT nested (k and k' samples share a prefix, which is fine for
    * audits) and costs one bounded sort-limit instead of a free filter
    * — use it exactly where the downstream work is superlinear in the
    * sample. */
  def hashTopK(df: DataFrame, key: Column, k: Int): DataFrame = {
    require(k > 0, s"hashTopK: k must be positive, got $k")
    df.orderBy(
      graft.functions.TextFunctions.md5Long(key.cast("string")).asc,
      key.asc).limit(k)
  }

  /** Mixture/balance sampling — the data-MIXING step of a training
    * pipeline: downsample every category (source, language, domain) to
    * ≈ the smallest category's size, so no single crawl dominates the
    * mix. Per-category keep-rate = ⌊min_n · grain / n_cat⌋ out of
    * `grain`, applied with the deterministic md5 bucket rule
    * ([[hashSample]]'s contract at `grain` resolution: reproducible,
    * reorder-stable, engine-portable). The category stats are one tiny
    * aggregation broadcast back against the scan — the sample itself is
    * a codegen'd filter, no shuffle of the data.
    */
  def mixtureBalanceSample(df: DataFrame, catCol: String, keyCol: String,
                           grain: Int = 10000): DataFrame = {
    require(grain > 0, "grain must be positive")
    val counts = df.groupBy(col(catCol)).agg(count(lit(1)).as("__n"))
    val thr = counts.crossJoin(counts.agg(min(col("__n")).as("__mn")))
      .select(col(catCol), expr(s"(__mn * $grain) DIV __n").as("__thr"))
    df.join(broadcast(thr), catCol)
      .filter(graft.functions.TextFunctions.md5Long(col(keyCol).cast("string"))
        % grain < col("__thr"))
      .drop("__thr")
  }
}
