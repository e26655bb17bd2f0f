package graft

/** Registry-wide physical-plan tripwire: EVERY registered query's plan is
  * built at sf0.001 and screened for the anti-patterns the 100 TB
  * doctrine forbids. Individual specs assert shapes for their own
  * operators; this one guarantees no future query ships a quadratic or
  * global-collapse plan unnoticed.
  *
  * Invariants (calibrated by tools/PlanAudit at the 169-query state):
  *   - ZERO CartesianProduct anywhere, ever;
  *   - BroadcastNestedLoopJoin only as broadcast-singleton crosses
  *     (one-row totals frames ⊗ data) — bounded at 6 per query (q132's
  *     PPJoin pipeline carries the most one-row totals);
  *   - Exchange SinglePartition only from one-row total aggregations and
  *     the hour-spine window (cardinality = hours, not events) — bounded
  *     at 6 per query.
  */
class RegistryPlanSpec extends SparkSpec {

  test("no registered query plans a cartesian product or unbounded nested loop") {
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.allSpecs.foreach { s =>
      val plan = s.fn(spark, sfDir).queryExecution.executedPlan.toString
      def n(p: String) = p.r.findAllIn(plan).size
      if (n("CartesianProduct") > 0)
        offenders += s"${s.name}: CartesianProduct"
      if (n("BroadcastNestedLoopJoin") > 6)
        offenders += s"${s.name}: ${n("BroadcastNestedLoopJoin")} BNLJ"
      if (n("Exchange SinglePartition") > 6)
        offenders += s"${s.name}: ${n("Exchange SinglePartition")} single-partition exchanges"
      graft.operators.OperatorCaches.release()
    }
    graft.operators.Postings.release()
    graft.operators.FramePool.release()
    assert(offenders.isEmpty, offenders.mkString("; "))
  }
}
