package graft.plans

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native k-gram shingle hashing: token array → ORDERED array of 60-bit
  * md5-derived shingle hashes (position i = hash of tokens i..i+k-1
  * joined by a single space).
  *
  * Bit-identical to the higher-order-function formulation
  * (`transform(sequence(...), i => conv(substring(md5(concat_ws(...)))))`)
  * and to the DuckDB oracle's `('0x'||substr(md5(...),1,15))::BIGINT` —
  * asserted exhaustively in ShingleHashesSpec — but executed as ONE tight
  * JVM loop per row: one reused MessageDigest instead of an interpreted
  * lambda dispatch, a fresh digest, and a hex→decimal string conversion
  * per shingle. This is the dominant kernel of the MinHash/LSH dedup path
  * (SURVEY §7.3 escalation: compose built-ins first, go native where the
  * 100 TB hot loop demands it).
  *
  * Codegen contract: the generated code is a single static call into
  * [[ShingleHashKernel]], so the expression stays inside whole-stage
  * codegen (same pattern as Spark's own digest functions).
  */
case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, s"shingle size must be >= 1 (got $k)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_shingle_hashes expects array<string>, got ${other.simpleString(10)}")
    }

  override def prettyName: String = "graft_shingle_hashes"

  override def nullSafeEval(tokens: Any): Any =
    ShingleHashKernel.compute(tokens.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.ShingleHashKernel.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashKernel {

  /** One row's shingle hashes. Called from both interpreted eval and the
    * generated code; must stay allocation-lean. */
  def compute(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val md = MessageDigest.getInstance("MD5")
    val out = new Array[Long](n - k + 1)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= n - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(tokens.getUTF8String(i + j).toString)
        j += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes(StandardCharsets.UTF_8))
      // value of the first 15 hex chars of the md5 hex string, as base-16:
      // bytes 0..6 in full, then the high nibble of byte 7 (60 bits total)
      var h = 0L
      var b = 0
      while (b < 7) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      h = (h << 4) | ((d(7) & 0xf0L) >>> 4)
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }
}
