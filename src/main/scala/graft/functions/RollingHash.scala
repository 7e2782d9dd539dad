package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash over a string: emits the hash of every
  * `window`-byte substring, computed in O(n) total — each slide updates
  * the previous hash in O(1) (`h' = (B·h + c_in − c_out·B^W) mod P`)
  * instead of rehashing the window. This is the Rabin–Karp /
  * winnowing-fingerprint primitive; a naive per-window fold is O(n·W).
  *
  * Bytes, not code points: operates on the UTF-8 bytes of the input —
  * identical to code points for ASCII (the normalized corpus here). The
  * DuckDB oracle mirrors the exact arithmetic per window (it can afford
  * O(n·W) at fixture scale).
  *
  * Constants: B = 31, P = 2^31 − 1. All intermediates < 2^40, far from
  * signed-64 overflow in either engine.
  */
case class RollingHash(left: Expression, right: Expression)
    extends BinaryExpression {

  import RollingHash._

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType && right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"rolling_hash requires (STRING, constant INT window), got ${left.dataType}, ${right.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(str: Any, win: Any): Any = {
    val bytes = str.asInstanceOf[UTF8String].getBytes
    val w = win.asInstanceOf[Int]
    val n = bytes.length
    if (w <= 0 || n < w) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n - w + 1)
    var pw = 1L // B^w mod P
    var i = 0
    while (i < w) { pw = pw * B % P; i += 1 }
    var h = 0L
    i = 0
    while (i < w) { h = (h * B + (bytes(i) & 0xff)) % P; i += 1 }
    out(0) = h
    i = w
    while (i < n) {
      h = ((h * B + (bytes(i) & 0xff) - (bytes(i - w) & 0xff) * pw) % P + P) % P
      out(i - w + 1) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (str, win) => {
      val bytes = ctx.freshName("bytes")
      val n = ctx.freshName("n")
      val w = ctx.freshName("w")
      val pw = ctx.freshName("pw")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |byte[] $bytes = $str.getBytes();
         |int $n = $bytes.length;
         |int $w = $win;
         |if ($w <= 0 || $n < $w) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new long[0]);
         |} else {
         |  long[] $out = new long[$n - $w + 1];
         |  long $pw = 1L;
         |  for (int $i = 0; $i < $w; $i++) { $pw = $pw * ${B}L % ${P}L; }
         |  long $h = 0L;
         |  for (int $i = 0; $i < $w; $i++) { $h = ($h * ${B}L + ($bytes[$i] & 0xff)) % ${P}L; }
         |  $out[0] = $h;
         |  for (int $i = $w; $i < $n; $i++) {
         |    $h = (($h * ${B}L + ($bytes[$i] & 0xff) - ($bytes[$i - $w] & 0xff) * $pw) % ${P}L + ${P}L) % ${P}L;
         |    $out[$i - $w + 1] = $h;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object RollingHash {
  val B = 31L
  val P = 2147483647L // 2^31 - 1
  val Name = "rolling_hash"
}
