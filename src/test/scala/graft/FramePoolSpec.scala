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

  test("pool caps its size by flushing, not growing") {
    FramePool.release()
    import spark.implicits._
    (0 until FramePool.MaxEntries + 1).foreach { i =>
      FramePool.frames(s"fp-$i") { Seq(Seq((i.toLong, "x")).toDF("id", "s")) }
    }
    assert(FramePool.pooledCount === 1)
    FramePool.release()
  }
}
