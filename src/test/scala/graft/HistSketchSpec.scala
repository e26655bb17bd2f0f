package graft

import org.apache.spark.sql.functions.col

import graft.operators.HistSketch

/** Planted-semantics checks for the histogram quantile sketch: the
  * delete-by-linearity contract (pruned ≡ fresh build over the
  * remainder, frame for frame, drained bins vanishing — the algebra
  * q236 oracle-gates end to end) and the non-negativity precondition
  * failing LOUDLY in-plan instead of silently folding (−W, W) into the
  * bin-0 region. */
class HistSketchSpec extends SparkSpec {

  import spark.implicits._

  test("delete equals a fresh build over the remainder, drained bins vanish") {
    val w = HistSketch.W
    // bin 0: 3 values, bin 1: 2 values, bin 5: 1 value (to be drained)
    val full = Seq(0L, w / 2, w - 1, w, 2 * w - 1, 5 * w + 7)
      .toDF("y")
    val deleted = Seq(w / 2, 5 * w + 7).toDF("y")
    val remainder = Seq(0L, w - 1, w, 2 * w - 1).toDF("y")

    val pruned = HistSketch.delete(
      HistSketch.sketch(full, "y"), HistSketch.sketch(deleted, "y"))
    val rebuilt = HistSketch.sketch(remainder, "y")
    assert(pruned.as[(Long, Long)].collect().toSet
      === rebuilt.as[(Long, Long)].collect().toSet)
    // the drained bin (5) is GONE, not zero — a fresh build never
    // materializes untouched bins
    assert(!pruned.as[(Long, Long)].collect().map(_._1).contains(5L))
    assert(pruned.as[(Long, Long)].collect().toMap
      === Map(0L -> 2L, 1L -> 2L))
    // and the quantiles served from the pruned sketch match the rebuild
    val ps = Seq(25, 50, 99)
    assert(HistSketch.quantiles(pruned, ps).collect().map(_.toSeq).toSeq
      === HistSketch.quantiles(rebuilt, ps).collect().map(_.toSeq).toSeq)
  }

  test("deleting a bin the sketch never held fails loudly") {
    val w = HistSketch.W
    val full = HistSketch.sketch(Seq(0L, w, w + 1).toDF("y"), "y")
    // bin 9 was never in the full sketch: deleting values never
    // inserted breaks rebuild equivalence and must error, not be
    // silently ignored (the same loud contract as over-deletion)
    val e = intercept[Exception] {
      HistSketch.delete(
        full, HistSketch.sketch(Seq(9 * w).toDF("y"), "y")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("exceeds bin count")),
      s"expected the over-delete precondition message, got: $e")
  }

  test("over-deleting a bin fails loudly instead of clamping") {
    val w = HistSketch.W
    val full = HistSketch.sketch(Seq(0L, w).toDF("y"), "y")
    // bin 0 holds 1 value; deleting it twice would drive the counter
    // negative — the silent clamp would drop the bin as if cleanly
    // drained, diverging from the delete-equals-rebuild contract
    val twice = HistSketch.sketch(Seq(1L, 2L).toDF("y"), "y")
    val e = intercept[Exception] {
      HistSketch.delete(full, twice).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("exceeds bin count")),
      s"expected the over-delete precondition message, got: $e")
  }

  test("negative input fails loudly instead of mis-binning") {
    val bad = Seq(5L, -HistSketch.W / 2).toDF("y")
    val e = intercept[Exception] {
      HistSketch.sketch(bad, "y").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("non-negative")),
      s"expected the HistSketch precondition message, got: $e")
  }
}
