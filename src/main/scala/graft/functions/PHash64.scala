package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused 64-bit perceptual hash of a text-carried media payload: bit j is
  * the parity of the code point sampled at (0-based) character position
  * j·stride — the aHash sampling grid as ONE compiled loop per row.
  *
  * The composed-expression formulation (a 64-element `transform` with a
  * dynamic `substr` per sample, re-sliced per band) evaluates interpreted
  * and re-computes the sample array once per band — ~2 ms/row, 19 s at
  * sf0.1 for what is a map-only projection. This loop is one forward scan
  * of the string (sample positions are monotone in j), ~µs/row. Same
  * fuse-the-doc-local-computation rationale as [[SimHashExpr]]; the HOF
  * fallback stays in [[graft.operators.Multimodal]] as the
  * extension-less twin (spec-pinned value-identical), and the DuckDB
  * oracle keeps the unrolled per-band arithmetic as an independent
  * derivation.
  *
  * CodegenFallback like the other graft natives: one opaque JVM loop;
  * codegen would only inline the call.
  */
case class PHash64Expr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  import PHash64Expr.Bits

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${PHash64Expr.Name} requires (STRING, BIGINT) arguments, " +
        s"got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = LongType

  override def prettyName: String = PHash64Expr.Name

  override protected def nullSafeEval(text: Any, stride: Any): Any = {
    val s = text.asInstanceOf[UTF8String].toString
    val st = stride.asInstanceOf[Long]
    var h = 0L
    var j = 0 // next sample index
    var cp = 0L // code-point index of the char at string offset i
    var i = 0 // char (code-unit) offset into s
    while (j < Bits && i < s.length) {
      val target = j * st
      while (cp < target && i < s.length) {
        i += Character.charCount(s.codePointAt(i))
        cp += 1
      }
      if (cp == target && i < s.length) {
        if ((s.codePointAt(i) & 1) == 1) h |= 1L << j
        j += 1
      } else {
        // ran off the end advancing: every remaining sample is past the
        // string and contributes bit 0 (the HOF twin's `otherwise(0)`)
        j = Bits
      }
    }
    h
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PHash64Expr {
  val Name = "p_hash64"
  val Bits = 64
}
