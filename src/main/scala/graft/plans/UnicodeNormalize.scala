package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native codegen'd expression.
  *
  * Spark ships no Unicode-normalization function (SPARK-47001 territory);
  * the usual fallback is a Scala UDF around `java.text.Normalizer`, which
  * boxes, breaks whole-stage codegen, and is invisible to the optimizer.
  * This expression keeps the exact same JDK normalizer (ICU-correct NFC/
  * NFD/NFKC/NFKD per the Unicode standard, so results match any conforming
  * engine — DuckDB's `nfc_normalize` included) but participates in codegen
  * like a built-in: web-corpus text canonicalization (the step before any
  * hash-based dedup — composed vs decomposed accents MUST hash equal) runs
  * inside the generated loop.
  *
  * The `form` is baked at resolution time (a literal, like
  * graft_shingle_hashes' k); the fast path skips normalization entirely
  * when the JDK reports the string is already normalized — true for
  * almost all real text, making the common case a pure scan.
  */
case class UnicodeNormalizeExpr(child: Expression, form: String)
  extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_unicode_normalize expects string, got ${other.simpleString(10)}")
    }

  override def prettyName: String = "graft_unicode_normalize"

  override def nullSafeEval(s: Any): Any =
    UnicodeNormalizeExpr.normalize(s.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""graft.plans.UnicodeNormalizeExpr.normalize($c, "$form")""")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalizeExpr =
    copy(child = newChild)
}

object UnicodeNormalizeExpr {

  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  /** JVM kernel shared by eval and codegen. `form` arrives as a validated
    * literal; Form.valueOf on a hot path is a static enum lookup. */
  def normalize(s: UTF8String, form: String): UTF8String = {
    val f = Normalizer.Form.valueOf(form)
    val str = s.toString
    if (Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(Normalizer.normalize(str, f))
  }
}
