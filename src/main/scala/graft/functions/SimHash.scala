package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused SimHash (Charikar) of a normalized-text column: whitespace
  * tokens → per-token term frequency → tf-weighted ±votes on each bit of
  * the portable 60-bit md5-prefix token hash → sign bits packed into one
  * LONG. One eval per document.
  *
  * The computation is entirely DOC-LOCAL (tf is the count within this
  * document's token array), so fusing it turns d05 from two corpus-wide
  * hash aggregates — the first keyed by (doc, token), the second by
  * (doc, bit) over a 60× bit explosion — into a MAP-ONLY projection.
  * At 100 TB that removes two shuffles of a 60×-inflated row stream;
  * locally it removes ~1.3 s of the 1.6 s query. Value-identical to the
  * aggregate pipeline (LlmTextSpec pins native == fallback row-for-row;
  * the DuckDB oracle keeps the aggregate formulation as an independent
  * derivation).
  *
  * Token hash = base-16 parse of the first 15 md5 hex digits == the
  * digest's first 8 bytes big-endian shifted right 4 (what
  * `conv(substr(md5(x),1,15),16,10)` computes — [[Portable.h64]]).
  *
  * CodegenFallback for the same reason as [[MinHashSigExpr]]: one opaque
  * JVM loop; codegen would only inline the call.
  */
case class SimHashExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  import SimHashExpr.Bits

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sim_hash requires a STRING argument, got ${child.dataType}")

  override def dataType: DataType = LongType

  override def prettyName: String = SimHashExpr.Name

  @transient private lazy val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // split(norm, " ") semantics incl. the empty-string → [""] case
    val toks = s.split(" ", -1)
    val tf = new java.util.HashMap[String, Long]()
    var i = 0
    while (i < toks.length) {
      tf.merge(toks(i), 1L, (a, b) => a + b)
      i += 1
    }
    val votes = new Array[Long](Bits)
    val digest = md5.get()
    val it = tf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val w = e.getValue
      digest.reset()
      val d = digest.digest(e.getKey.getBytes("UTF-8"))
      var v64 = 0L
      var b = 0
      while (b < 8) { v64 = (v64 << 8) | (d(b) & 0xffL); b += 1 }
      val th = v64 >>> 4 // 60-bit portable hash
      b = 0
      while (b < Bits) {
        votes(b) += (if (((th >> b) & 1L) == 1L) w else -w)
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < Bits) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashExpr {
  val Name = "sim_hash"
  val Bits = 60
}
