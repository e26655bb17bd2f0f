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

  test("pool caps its size by evicting the oldest entry, not flushing everything") {
    FramePool.release()
    import spark.implicits._
    var rebuilds = 0
    def touch(i: Int) = FramePool.frames(s"fp-$i") {
      rebuilds += 1
      Seq(Seq((i.toLong, "x")).toDF("id", "s"))
    }
    (0 to FramePool.MaxEntries).foreach(touch) // one past capacity
    assert(FramePool.pooledCount === FramePool.MaxEntries)
    // the newest entries survived the eviction — no rebuild on re-access
    val before = rebuilds
    touch(FramePool.MaxEntries)
    assert(rebuilds === before, "hot entry was evicted by a flush-all")
    // the oldest entry (fp-0) was the one dropped
    touch(0)
    assert(rebuilds === before + 1)
    FramePool.release()
  }
}
