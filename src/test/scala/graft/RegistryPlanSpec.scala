package graft

/** Registry-wide physical-plan tripwire: EVERY registered query's plan is
  * built at sf0.001 and screened for the anti-patterns the 100 TB
  * doctrine forbids (the screen itself lives in [[graft.tools.PlanScreen]],
  * shared with the PlanAudit calibration probe). Individual specs assert
  * shapes for their own operators; this one guarantees no future query
  * ships a quadratic or global-collapse plan unnoticed. A query that
  * throws at plan-build time is reported BY NAME and the sweep continues.
  */
class RegistryPlanSpec extends SparkSpec {

  test("no registered query plans a cartesian product or unbounded nested loop") {
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.allSpecs.foreach { s =>
      try {
        val plan = s.fn(spark, sfDir).queryExecution.executedPlan.toString
        offenders ++= graft.tools.PlanScreen.offenses(s.name, plan)
      } catch {
        case e: Throwable => offenders += s"${s.name}: ERROR ${e.getMessage}"
      }
      graft.operators.OperatorCaches.release()
    }
    graft.operators.Postings.release()
    graft.operators.FramePool.release()
    assert(offenders.isEmpty, offenders.mkString("; "))
  }
}
