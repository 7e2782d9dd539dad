package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared MinHash parameters — single source of truth for the Spark
  * expression chain, the fused native expression, and the DuckDB oracle
  * SQL (LlmText builds its oracle strings from these same constants). */
object MinHashParams {
  val ShingleN = 3
  val NumHashes = 8
  val P = 2147483647L // 2^31 - 1
  val A: IndexedSeq[Long] = (1 to NumHashes).map(i => (i * 2654435761L) % P)
  val B: IndexedSeq[Long] = (1 to NumHashes).map(i => (i * 40503L + 2531011L) % P)
}

/** Fused MinHash signature: word-3-gram shingles → portable md5-prefix
  * hash → k permutation minima, in ONE eval per document. Value-identical
  * to the composable expression chain
  * (`array_min(transform(shingles, …md5…))` — the DuckDB oracle twin is
  * unchanged), but one JVM loop instead of ~k·#shingles interpreted
  * lambda applications: the higher-order-function plumbing, not the
  * hashing, dominated the signature stage's cost.
  *
  * The md5-prefix parse takes the digest's first 8 bytes big-endian
  * shifted right 4 bits == base-16 parse of the first 15 hex digits
  * (what `conv(substr(md5(x),1,15),16,10)` computes).
  *
  * CodegenFallback: the body is a single opaque loop with no
  * per-element expression tree, so codegen would only inline the call —
  * the lambda-elimination is where the win is.
  */
case class MinHashSigExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  import MinHashParams._

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"min_hash_sig requires a STRING argument, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "min_hash_sig"

  @transient private lazy val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val toks = s.split(" ", -1)
    val out = Array.fill(NumHashes)(-1L)
    if (toks.length >= ShingleN) {
      val digest = md5.get()
      val mins = Array.fill(NumHashes)(Long.MaxValue)
      var i = 0
      while (i <= toks.length - ShingleN) {
        // shingle = tokens joined by ' ' — byte-identical to
        // array_join(slice(toks, i, n), " ")
        val sb = new java.lang.StringBuilder(toks(i))
        var j = 1
        while (j < ShingleN) { sb.append(' ').append(toks(i + j)); j += 1 }
        digest.reset()
        val d = digest.digest(sb.toString.getBytes("UTF-8"))
        var v64 = 0L
        var b = 0
        while (b < 8) { v64 = (v64 << 8) | (d(b) & 0xffL); b += 1 }
        val hq = (v64 >>> 4) & 0x3FFFFFFFL
        var k = 0
        while (k < NumHashes) {
          val v = (A(k) * hq + B(k)) % P
          if (v < mins(k)) mins(k) = v
          k += 1
        }
        i += 1
      }
      var k = 0
      while (k < NumHashes) { out(k) = mins(k); k += 1 }
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
