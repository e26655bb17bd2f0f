package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregation (the `Aggregator` escalation path — for
  * semantics `org.apache.spark.sql.functions` can't express exactly):
  * deterministic mean/variance of a currency-ish 2-decimal column.
  *
  * Float summation is partition-order-dependent, so `avg`/`var_samp` over
  * doubles can't be hash-compared against another engine. This aggregator
  * accumulates EXACT integer cents (and 10^-4 units for the squares) in
  * longs — associative, commutative, overflow-safe to ~9e14 value-sum —
  * and converts to double exactly once at finish, with the variance
  * assembled by a fixed double-arithmetic formula any SQL engine
  * reproduces bit-for-bit: mean = s/n, var = (ss − s·s/n)/(n−1).
  *
  * Input contract: values carry at most 2 decimal places (they round to
  * cents at map time — the same rounding CAST(x AS DECIMAL(18,2))
  * performs for such values).
  */
object ExactMoments {

  /** (sum in cents, sum of squares in 1e-4 units, row count). */
  case class Buf(sumCents: Long, sumSq4: Long, n: Long)

  /** (n, mean, sample variance) as deterministic doubles. */
  case class Out(n: Long, mean: Double, varSamp: Double)

  /** Aggregates the `_2` (value) of a (key, value) tuple so it can run
    * under `groupByKey(_._1)` without a second projection. */
  val of2: Aggregator[(String, Double), Buf, Out] =
    new Aggregator[(String, Double), Buf, Out] {
      override def zero: Buf = Buf(0L, 0L, 0L)
      override def reduce(b: Buf, a: (String, Double)): Buf = {
        val cents = math.round(a._2 * 100.0)
        Buf(b.sumCents + cents, b.sumSq4 + cents * cents, b.n + 1)
      }
      override def merge(x: Buf, y: Buf): Buf =
        Buf(x.sumCents + y.sumCents, x.sumSq4 + y.sumSq4, x.n + y.n)
      override def finish(b: Buf): Out = {
        if (b.n == 0) Out(0L, Double.NaN, Double.NaN)
        else {
          val s = b.sumCents / 100.0 // < 2^53 cents → one exact-to-nearest division
          val ss = b.sumSq4 / 10000.0
          val n = b.n.toDouble
          val v = if (b.n < 2) Double.NaN else (ss - s * s / n) / (n - 1.0)
          Out(b.n, s / n, v)
        }
      }
      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Out] = Encoders.product[Out]
    }
}
