package graft

import org.apache.spark.sql.functions._

/** Session bootstrap: the graft surface (SQL functions + custom
  * operators) is present on a GraftSession.local session even when
  * getOrCreate returned a pre-existing session whose builder confs could
  * not apply. */
class GraftSessionSpec extends SparkSpec {

  // local() enables the window-top-k rewrite; detach it after each test
  // so the shared test session's planning stays vanilla for other suites
  override def withFixture(test: NoArgTest) =
    try super.withFixture(test)
    finally graft.plans.TopKPerKeyPlans.removeRewrite(spark)

  test("local() session exposes graft functions and the top-k operator") {
    val s = GraftSession.local("graft-session-spec", 4)
    assert(s.experimental.extraOptimizations
      .contains(graft.plans.WindowTopKRewrite))
    // functions callable from SQL
    val dot = s.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))")
      .head().getDouble(0)
    assert(dot === 11.0)
    val sh = s.sql("SELECT graft_simhash(array('a','b'), 16)").head().getLong(0)
    assert(sh >= 0L)
    // custom operator plannable
    import s.implicits._
    val df = Seq((1, "a", 2.0), (2, "a", 1.0), (3, "b", 9.0)).toDF("id", "k", "v")
    val top = graft.plans.TopKPerKeyPlans.topKPerKey(
      df, Seq("k"), Seq(desc("v"), col("id")), 1)
      .orderBy("k").select("id").as[Int].collect()
    assert(top.toSeq === Seq(1, 3))
  }

  test("builder carries the cluster posture (AQE, skew join, extensions)") {
    // assert on the builder's config map via a throwaway session-less
    // check: build against the existing session and read effective confs
    val s = GraftSession.local("graft-session-spec2", 4)
    assert(s.conf.get("spark.sql.adaptive.enabled") === "true")
    // shared-session caveat: confs set at FIRST session build win; the
    // contract here is that the graft surface is present regardless
    // (ensured registration), which the test above proves.
  }
}
