package graft.plans

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deflate-compressed byte length of a string, as a native codegen'd
  * expression (`graft_deflate_len`).
  *
  * compressed_len / octet_length is the classic compression-ratio quality
  * signal of web-corpus curation (RefinedWeb/MassiveText-style): machine-
  * generated boilerplate and keyword-stuffed spam compress far below
  * natural prose, and near-random noise compresses above it, so both
  * tails of the ratio distribution are cheap removal candidates. No SQL
  * engine exposes deflate lengths, so there is no DuckDB oracle — the
  * signal is spec-verified (determinism, monotonicity on planted
  * repetitive vs diverse text) instead of hash-gated, and deliberately
  * NOT registered in the query registry.
  *
  * Implementation: one `java.util.zip.Deflater` per thread (ThreadLocal,
  * `reset()` between rows — allocating a native zlib stream per row would
  * dominate the scan), raw-deflate mode so the 6-byte zlib framing does
  * not blur short strings, default compression level. Output counts
  * bytes; the UTF-8 payload is compressed directly off the UTF8String's
  * bytes with no transcode.
  */
case class DeflateLength(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_deflate_len expects string, got ${other.simpleString(10)}")
    }

  override def prettyName: String = "graft_deflate_len"

  override def nullSafeEval(s: Any): Any =
    DeflateLength.compressedLength(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.DeflateLength.compressedLength($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateLength =
    copy(child = newChild)
}

object DeflateLength {

  /** Ends each thread's native zlib stream once its thread has exited
    * and been GC'd. This makes the release EAGER and DETERMINISTIC, not
    * leak-proofing: since JDK 12 the Deflater registers its own Cleaner
    * that calls `end()` when the Deflater becomes unreachable — which
    * happens anyway once the dead thread's ThreadLocal map is collected
    * — so native memory would be reclaimed eventually regardless; this
    * cleaner just ties the release to thread death instead of a later
    * Deflater GC cycle (`end()` is idempotent, so double-ending with
    * the JDK's own cleaner is harmless). The cleanup action holds only
    * the Deflater — never the Thread — so registration cannot pin the
    * thread. */
  private val cleaner = java.lang.ref.Cleaner.create()
  private final class EndDeflater(d: Deflater) extends Runnable {
    def run(): Unit = d.end()
  }

  private val deflaters = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater = {
      val d = new Deflater(Deflater.DEFAULT_COMPRESSION, /* nowrap = */ true)
      cleaner.register(Thread.currentThread(), new EndDeflater(d))
      d
    }
  }

  private val buffers = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }

  /** JVM kernel shared by eval and codegen. */
  def compressedLength(s: UTF8String): Int = {
    val d = deflaters.get()
    d.reset()
    d.setInput(s.getBytes)
    d.finish()
    val buf = buffers.get()
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}
