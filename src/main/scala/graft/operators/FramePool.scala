package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Generic named pool of persisted frames shared ACROSS queries — the
  * ad-hoc sibling of [[Postings]] (which owns the typed corpus posting
  * index). Use it for any expensive pipeline head several queries
  * rebuild identically: PQ codebook training, IVF cell assignments —
  * artifacts a real system trains once and serves many times. Same
  * lifecycle contract as Postings: entries survive the per-query
  * [[OperatorCaches.release]] (that pool is for single-query
  * intermediates) and are dropped by [[release]] at end of run, or when
  * the pool would exceed [[MaxEntries]] keys.
  *
  * Callers key by a stable corpus identity — a tuple of a pipeline tag
  * with the corpus's CANONICALIZED ANALYZED PLAN (structural equality,
  * the `sameResult` comparison; for in-memory frames it includes the
  * data, where the plan's toString or a 32-bit hash would collide) plus
  * parameters, or a scale-factor-dir string where the corpus is a fixed
  * fixture. The builder runs at most once per key per run.
  */
object FramePool {

  /** A full 204-query registry run touches ~14 distinct keys for ONE
    * corpus (per-corpus shingle/band frames multiply per bipartite side
    * and per evaluation sample); 32 leaves a ×2 margin before any
    * eviction fires at all. */
  val MaxEntries = 32

  private val pool = new ConcurrentHashMap[Any, Seq[DataFrame]]()
  private val order = new java.util.concurrent.ConcurrentLinkedQueue[Any]()

  /** Build cost per pool TAG (the key tuple's leading string), summed
    * across keys sharing the tag: seconds spent constructing AND
    * materializing pooled frames on a miss. Recorded so a bench artifact
    * can report `pool_builds` — pooled per-query numbers are pool-warm
    * by design (the train-once/serve-many artifact pattern), and the
    * adjudicator needs the build cost they amortize in the same artifact
    * (VERDICT r16 item 7). Cleared by [[release]]. */
  private val buildSecs = new ConcurrentHashMap[String, Double]()

  private def tagOf(key: Any): String = key match {
    case p: Product if p.productArity >= 1 => p.productElement(0) match {
      case s: String => s
      case other => other.getClass.getSimpleName
    }
    case s: String => s
    case other => other.getClass.getSimpleName
  }

  /** Snapshot of accumulated pool-build seconds by tag (bench hook). */
  def buildSeconds: Map[String, Double] = {
    val b = Map.newBuilder[String, Double]
    buildSecs.forEach((k, v) => b += k -> v)
    b.result()
  }

  /** Get-or-build the named frame set; frames are persisted
    * MEMORY_AND_DISK on first build. The builder's frames may already be
    * persisted (e.g. so later frames in the set reuse earlier ones while
    * building) — re-persisting at the same level is a no-op.
    *
    * Capacity: exceeding [[MaxEntries]] evicts the LEAST-RECENTLY-USED
    * entry only — a flush-all would also drop the hot frames the
    * in-flight query family is amortizing, and FIFO (insertion order)
    * could evict a key the CURRENT query just re-accessed. That matters
    * more than a cache miss: pooled frames may be `localCheckpoint`ed
    * (lineage-truncated — e.g. the PQ codebook/codes artifacts), and
    * unpersisting one while an in-flight plan still references it is
    * unrecoverable, not a recompute. LRU keeps the active family's keys
    * at the back of the eviction order. */
  def frames(key: Any)(build: => Seq[DataFrame]): Seq[DataFrame] =
    // one REENTRANT monitor, not ConcurrentHashMap.computeIfAbsent: a
    // builder may itself resolve pooled frames (Logit.pooledTrajectory
    // builds from pooledFeatures; PqQueries.encoded from trained), and
    // nested computeIfAbsent on one map throws IllegalStateException
    // ("Recursive update") whenever the two keys land in the same bin —
    // a nondeterministic landmine that fired in round 15. Intrinsic
    // locks are reentrant, so nested frames() calls are safe; the pool
    // is driven by single-threaded query loops, so one global monitor
    // costs nothing.
    pool.synchronized {
      val hit = pool.get(key)
      if (hit != null) {
        // LRU touch: move the key to the back of the eviction order
        if (order.remove(key)) order.add(key)
        hit
      } else {
        while (pool.size >= MaxEntries && !order.isEmpty) {
          val dropped = pool.remove(order.poll())
          if (dropped != null) dropped.foreach(_.unpersist(blocking = false))
        }
        val t0 = System.nanoTime()
        val built = build.map(_.persist(StorageLevel.MEMORY_AND_DISK))
        // Materialize eagerly so the recorded build seconds are the TRUE
        // cost (plan construction + execution), not just plan-build time.
        // Every pooled frame is fully scanned by its consumers anyway
        // (that is why it is pooled), so the count() adds one cached read,
        // never new work — and the cost still lands inside the FIRST
        // consumer's timed region, exactly where it landed before.
        built.foreach(_.count())
        buildSecs.merge(tagOf(key), (System.nanoTime() - t0) / 1e9,
          (a, b) => a + b)
        pool.put(key, built)
        order.add(key)
        built
      }
    }

  /** Unpersist and forget every pooled entry (non-blocking). Takes the
    * same monitor as [[frames]] so a lifecycle sweep (end of a Verify/
    * Bench run, a streaming sink's per-batch release) cannot clear or
    * unpersist frames another thread is resolving mid-plan — for
    * localCheckpoint'ed entries that would be unrecoverable, not a
    * recompute. NOTE the release is JVM-GLOBAL: concurrently running
    * queries that share the pool must not interleave with it. */
  def release(): Unit = pool.synchronized {
    pool.values.forEach(_.foreach(_.unpersist(blocking = false)))
    pool.clear()
    order.clear()
    buildSecs.clear()
  }

  /** Currently pooled key count (test/monitoring hook). */
  def pooledCount: Int = pool.synchronized { pool.size() }
}
