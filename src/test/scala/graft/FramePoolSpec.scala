package graft

import graft.operators.FramePool

/** The ad-hoc cross-query frame pool: build-once semantics, release. */
class FramePoolSpec extends SparkSpec {

  test("frames builds once per key and returns the same persisted frames") {
    FramePool.release()
    import spark.implicits._
    var builds = 0
    def build() = FramePool.frames("fp-test") {
      builds += 1
      Seq(Seq((1L, "a")).toDF("id", "s"))
    }
    val a = build(); val b = build()
    assert(builds === 1)
    assert(a.head eq b.head)
    assert(FramePool.pooledCount === 1)
    FramePool.release()
    assert(FramePool.pooledCount === 0)
  }

  test("pool caps its size by evicting the LRU entry, not flushing everything") {
    FramePool.release()
    import spark.implicits._
    var rebuilds = 0
    def touch(i: Int) = FramePool.frames(s"fp-$i") {
      rebuilds += 1
      Seq(Seq((i.toLong, "x")).toDF("id", "s"))
    }
    (0 until FramePool.MaxEntries).foreach(touch) // exactly at capacity
    // LRU, not FIFO: re-access the OLDEST entry, then overflow — the
    // victim must be fp-1 (now least recently used), never the
    // just-touched fp-0. This is the hazard that matters for
    // localCheckpoint'ed pooled frames: evicting a key the in-flight
    // family just accessed would drop blocks its plans cannot recompute.
    touch(0)
    val before = rebuilds
    touch(FramePool.MaxEntries) // one past capacity → evict LRU
    assert(FramePool.pooledCount === FramePool.MaxEntries)
    touch(0)
    assert(rebuilds === before + 1, "recently-used entry was evicted")
    touch(1)
    assert(rebuilds === before + 2, "LRU entry survived the eviction")
    FramePool.release()
  }
}
