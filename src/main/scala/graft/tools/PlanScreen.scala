package graft.tools

/** The ONE copy of the physical-plan anti-pattern screen shared by the
  * enforcing spec (RegistryPlanSpec) and the calibration probe
  * (PlanAudit): a plan string is screened for the shapes the 100 TB
  * doctrine forbids. The counted patterns are parallelism-independent
  * (a CartesianProduct / one-row broadcast cross / single-partition
  * exchange appears the same at any shuffle-partition setting), so
  * calibration and enforcement agree regardless of session config.
  *
  * Bounds (calibrated at the 171-query state): BroadcastNestedLoopJoin
  * appears only as broadcast-singleton crosses of one-row totals frames
  * (q132's PPJoin pipeline carries the most, 6); Exchange SinglePartition
  * only from one-row total aggregations and the hour-spine window
  * (cardinality = hours, not events), also ≤ 6.
  */
object PlanScreen {

  val MaxBnlj = 6
  val MaxSinglePartition = 6

  /** Violations found in `plan` for the query `name`; empty = clean. */
  def offenses(name: String, plan: String): Seq[String] = {
    def n(p: String) = p.r.findAllIn(plan).size
    Seq(
      Option.when(n("CartesianProduct") > 0)(s"$name: CartesianProduct"),
      Option.when(n("BroadcastNestedLoopJoin") > MaxBnlj)(
        s"$name: ${n("BroadcastNestedLoopJoin")} BNLJ"),
      Option.when(n("Exchange SinglePartition") > MaxSinglePartition)(
        s"$name: ${n("Exchange SinglePartition")} single-partition exchanges")
    ).flatten
  }
}
