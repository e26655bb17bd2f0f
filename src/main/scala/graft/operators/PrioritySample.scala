package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Priority sampling (Duffield–Lund–Thorup, JACM 2007) — a FIXED-SIZE
  * weighted sample that answers arbitrary subset-sum queries with
  * unbiased Horvitz–Thompson estimates: each item gets priority
  * q_i = w_i / u_i (u_i deterministic-uniform in (0,1] from the md5
  * bridge, so both engines draw the SAME sample), the sample is the k
  * highest priorities, the threshold τ is the (k+1)-th, and every
  * sampled item estimates its own weight as max(w_i, τ). Σ max(w_i, τ)
  * over the sampled members of ANY group is an unbiased estimate of the
  * group's true weight sum — the audit-economics primitive of a 100 TB
  * deployment: maintain one k-row sample next to the corpus and answer
  * every ad-hoc "total by X" question from it, with error ~ 1/√k,
  * instead of re-scanning the corpus per question.
  *
  * Scale shape: priorities are map-side expressions; the selection is
  * ONE top-(k+1) (per-partition top-k + merge — never a global sort);
  * everything downstream operates on k+1 rows. The state is also
  * MERGE-CLOSED — top-(k+1) of a union of per-partition top-(k+1)s
  * equals the global top-(k+1) (the KMV argument on the priority axis)
  * — which is what the streaming monitor rides
  * ([[graft.streaming.EventStreams]] `prioritySampleSink`).
  *
  * Exactness discipline: weights enter as integer CENTS
  * (floor(x·100+0.5), the q230 rule), u and q are pure IEEE doubles
  * (bit-identical in DuckDB), the HT term is greatest(w_c, floor(τ))
  * in exact longs, and group sums ride DECIMAL(38,0) — q237
  * hash-gates the whole report. Requires n > k (with n ≤ k the
  * estimator should degenerate to the exact sum with τ = 0; this
  * implementation assumes the sampling regime — PrioritySampleSpec
  * pins behavior). Priorities are almost-surely distinct; ties break
  * on the key for full determinism. */
object PrioritySample {

  /** 2^60 — the exclusive upper bound of md5Long's 15-hex-digit range.
    * A power of two, so the literal is exactly representable as a
    * double and parses identically in both engines. */
  val HMax: Double = 1152921504606846976.0d

  /** Attach `__w_c` (exact long cents) and the deterministic priority
    * `__prio` = w / u, u = (md5_60(key)+1) / 2^60 ∈ (0, 1]. */
  def withPriority(df: DataFrame, keyCol: Column,
                   weightCents: Column): DataFrame =
    df.withColumn("__key", keyCol)
      .withColumn("__w_c", weightCents)
      .withColumn("__prio", col("__w_c").cast("double") /
        ((TextFunctions.md5Long(col("__key")) + lit(1L)).cast("double")
          / lit(HMax)))

  /** The k-row sample and the 1-row threshold frame (`__tau`): the
    * sample is the k highest (priority, key)-ordered rows, τ the
    * (k+1)-th priority — or 0 when the population has ≤ k items (then
    * EVERY item is sampled, max(w, 0) = w, and the HT estimator
    * degenerates to the exact sum, the classical n ≤ k contract;
    * PrioritySampleSpec pins it). The top-(k+1) is persisted — it
    * feeds both. */
  def sampleWithTau(prioritized: DataFrame, k: Int)
      : (DataFrame, DataFrame) = {
    require(k >= 1, s"sample size must be positive (got $k)")
    val topk1 = OperatorCaches.persistTracked(
      prioritized.orderBy(desc("__prio"), asc("__key")).limit(k + 1))
    val sample = topk1.orderBy(desc("__prio"), asc("__key")).limit(k)
    val tau = topk1
      .agg(min(col("__prio")).as("__m"), count(lit(1)).as("__n"))
      .select(when(col("__n") <= k, lit(0.0d)).otherwise(col("__m"))
        .as("__tau"))
    (sample, tau)
  }

  /** Per-group Horvitz–Thompson totals from a sample+τ: n_sampled and
    * Σ greatest(w_c, floor(τ)) as DECIMAL(38,0). floor(τ) is guarded
    * loudly against the (astronomically unlikely) long overflow — a
    * silent wrap would corrupt every estimate. */
  def htGroupTotals(sample: DataFrame, tau: DataFrame,
                    groupCol: String): DataFrame =
    sample.crossJoin(broadcast(tau))
      .filter(isnull(assert_true(col("__tau") < lit(9.0e18d),
        lit("PrioritySample: tau exceeds the long range — the HT fixed" +
          "-point arithmetic would overflow"))))
      .select(col(groupCol),
        greatest(col("__w_c"), floor(col("__tau"))).as("__ht_c"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_sampled"),
        sum(col("__ht_c").cast("decimal(38,0)")).as("ht_c"))
}
