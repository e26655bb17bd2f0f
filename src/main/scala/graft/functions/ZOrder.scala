package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (z-order) interleaving — the multi-dimensional clustering key
  * behind Delta/Iceberg OPTIMIZE ZORDER: sorting by the bit-interleave of
  * two columns places rows close in BOTH dimensions into the same files,
  * so min/max file statistics prune scans for predicates on EITHER column
  * (a single-column sort only prunes its own column).
  *
  * Composed from built-in shift/and/or columns — 32 terms that constant-
  * fold into whole-stage codegen; no custom expression needed (SURVEY §7.3
  * escalation order), and the identical arithmetic is expressible in any
  * SQL engine, which keeps the z-values oracle-checkable bit for bit.
  */
object ZOrder {

  /** Interleave the low 16 bits of two non-negative integral columns:
    * x's bit i lands at result bit 2i, y's at 2i+1 — a 32-bit z-value as
    * a long. Callers mask/scale inputs into [0, 65535] first (the usual
    * recipe: rank- or range-bucket each dimension to 16 bits). */
  def zorder16(x: Column, y: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(x.cast("long"), i).bitwiseAND(1L), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(y.cast("long"), i).bitwiseAND(1L), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** The oracle twin: the same 32-term interleave as SQL text over column
    * expressions `x` and `y` (DuckDB `>>`/`<<`/`&`/`|` on BIGINT). */
  def zorder16Sql(x: String, y: String): String =
    (0 until 16).map { i =>
      s"(((($x) >> $i) & 1) << ${2 * i}) | (((($y) >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")
}
