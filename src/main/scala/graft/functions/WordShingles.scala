package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-n-gram shingle set of a (normalized) string in one
  * eval — value-identical to
  * `array_distinct(transform(sequence(…), i -> array_join(slice(toks,i,n), " ")))`
  * (first-occurrence order preserved, like array_distinct) without the
  * per-shingle interpreted lambda/slice/join allocations. Feeds the
  * near-dup verification joins and the fingerprint/repetition signals. */
case class WordShinglesExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType && right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires (STRING, constant INT n), got ${left.dataType}, ${right.dataType}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(str: Any, nAny: Any): Any = {
    val s = str.asInstanceOf[UTF8String].toString
    val n = nAny.asInstanceOf[Int]
    val toks = s.split(" ", -1)
    if (n <= 0 || toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= toks.length - n) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object WordShinglesExpr {
  val Name = "word_shingles"
}
