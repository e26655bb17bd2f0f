package graft.plans

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

import graft.functions.TextFunctions

/** Native one-pass SimHash over a token array: md5-hash each token to the
  * 60-bit value the engine-portable hash discipline defines, accumulate
  * per-bit majority votes, emit the `bits`-bit code — all in a single JVM
  * loop with one reused MessageDigest.
  *
  * Bit-identical to the higher-order-function formulation
  * (`TextFunctions.simhashFromHashes(tokenHashes(text), bits)`, which
  * remains as the cross-checked reference) but without the `bits`
  * interpreted `filter()` passes over the hash array — the HOF form walks
  * the token hashes once PER BIT through interpreted lambda dispatch; this
  * is the dedup hot path's dominant interpreted cost at 100 TB.
  * Parity is asserted exhaustively in NativeSketchSpec.
  */
case class SimHashCode(child: Expression, bits: Int) extends UnaryExpression {

  require(bits >= 1 && bits <= 60,
    s"simhash bits must be in [1, 60] — the md5-derived hashes carry 60 bits (got $bits)")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_simhash expects array<string>, got ${other.simpleString(10)}")
    }

  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(tokens: Any): Any =
    SketchKernels.simhash(tokens.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SketchKernels.simhash($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimHashCode =
    copy(child = newChild)
}

/** Native one-pass MinHash signature vector over a 60-bit shingle-hash
  * array: for each of the `numSigs` universal hash functions
  * (a_j·(h mod P) + b_j) mod P with the shared deterministic parameter
  * family (TextFunctions.MinhashA/B, P = 2^31−1), the minimum over the
  * array — one JVM loop per row instead of `numSigs` interpreted
  * `array_min(transform(...))` passes.
  *
  * Null contract: empty hash set → null (matching `array_min` over an
  * empty transformed array in the HOF formulation). Parity asserted in
  * NativeSketchSpec.
  */
case class MinHashSigs(child: Expression, numSigs: Int) extends UnaryExpression {

  require(numSigs >= 1 && numSigs <= TextFunctions.MinhashA.length,
    s"only ${TextFunctions.MinhashA.length} hash-family parameter pairs are defined (got $numSigs)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_minhash expects array<bigint>, got ${other.simpleString(10)}")
    }

  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(hashes: Any): Any =
    SketchKernels.minhash(hashes.asInstanceOf[ArrayData], numSigs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("mh")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.plans.SketchKernels.minhash($c, $numSigs);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

/** Native one-pass text normalization: lowercase, collapse every run of
  * characters outside [a-z0-9] to a single space, trim — byte-identical
  * to the reference regex form `trim(regexp_replace(regexp_replace(
  * lower(s), "[^a-z0-9 ]+", " "), " +", " "))` (TextFunctions
  * .normalizeText, which remains as the cross-checked reference and as
  * the oracle's SQL twin), in ONE byte-level pass with one output
  * allocation instead of two java.util.regex matcher/StringBuffer walks.
  *
  * The lowercase step reuses UTF8String.toLowerCase — the exact code
  * Spark's `lower()` runs — so unicode case mapping can never diverge
  * from the reference; every byte of a multi-byte character is ≥ 0x80
  * and therefore a separator in BOTH formulations. Normalization is the
  * near-exact-dedup hot path (q66/q93/q96): two regex passes per
  * document dominate those operators' profiles, and regex throughput
  * additionally anti-scales with threads on some virtualized hosts
  * (PERF_NOTES.md) — a plain byte loop does neither.
  * Parity is property-tested in NativeSketchSpec.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_normalize expects string, got ${other.simpleString(10)}")
    }

  override def prettyName: String = "graft_normalize"

  override def nullSafeEval(s: Any): Any =
    SketchKernels.normalize(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SketchKernels.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object SketchKernels {

  private val P = TextFunctions.MinhashP
  private val A = TextFunctions.MinhashA.toArray
  private val B = TextFunctions.MinhashB.toArray

  /** 60-bit md5-derived hash of the UTF-8 bytes — the same value as
    * `('0x' || substr(md5(s),1,15))::BIGINT` (bytes 0..6 then the high
    * nibble of byte 7). */
  private def md5Long60(md: MessageDigest, bytes: Array[Byte]): Long = {
    md.reset()
    val d = md.digest(bytes)
    var h = 0L
    var b = 0
    while (b < 7) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
    (h << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  /** One row's SimHash code: per-bit majority over all token hashes
    * (duplicates kept — it's a multiset vote; ties clear the bit, matching
    * `ones*2 > n`). Null ELEMENTS count toward n but cast no votes —
    * exactly the HOF reference's behavior (md5(null) → null hash, which
    * every per-bit filter() excludes while size() still counts it). */
  def simhash(tokens: ArrayData, bits: Int): Long = {
    val n = tokens.numElements()
    val counts = new Array[Int](bits)
    val md = MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = md5Long60(md, tokens.getUTF8String(i).toString.getBytes(StandardCharsets.UTF_8))
        var j = 0
        while (j < bits) { if (((h >>> j) & 1L) == 1L) counts(j) += 1; j += 1 }
      }
      i += 1
    }
    var code = 0L
    var j = 0
    while (j < bits) { if (counts(j) * 2 > n) code |= 1L << j; j += 1 }
    code
  }

  /** One row's MinHash signature vector; null for an empty or all-null
    * hash set (HOF parity: array_min is null over empty and SKIPS null
    * elements otherwise — transform maps null → null, min ignores it). */
  def minhash(hashes: ArrayData, numSigs: Int): ArrayData = {
    val n = hashes.numElements()
    val out = Array.fill(numSigs)(Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!hashes.isNullAt(i)) {
        any = true
        val hp = hashes.getLong(i) % P
        var j = 0
        while (j < numSigs) {
          val v = (A(j) * hp + B(j)) % P
          if (v < out(j)) out(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!any) return null
    new GenericArrayData(out)
  }

  /** One row's canonical normalization (see [[NormalizeText]]): lowercase
    * via UTF8String.toLowerCase (Spark `lower()` parity), then a single
    * byte pass keeping [a-z0-9], collapsing separator runs to one space,
    * emitting no leading/trailing space. Output is pure ASCII, length ≤
    * input bytes, one allocation. */
  def normalize(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
    val b = s.toLowerCase.getBytes
    val out = new Array[Byte](b.length)
    var o = 0
    var pendingSpace = false
    var i = 0
    while (i < b.length) {
      val c = b(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pendingSpace && o > 0) { out(o) = ' '; o += 1 }
        pendingSpace = false
        out(o) = c
        o += 1
      } else {
        pendingSpace = true
      }
      i += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromBytes(out, 0, o)
  }
}
