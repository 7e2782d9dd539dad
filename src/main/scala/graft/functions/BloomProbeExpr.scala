package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd Bloom membership probe — value-identical to the
  * composable [[BloomFilter.mightContain]] chain (two bounded xxhash64
  * base hashes + k double-hashed bit tests, Kirsch & Mitzenmacher ESA
  * 2006) but evaluated as ONE tight JVM call per row instead of a
  * ~4·k-node expression tree: the r13 micro-bench priced the composable
  * k=7 probe at ~20 µs CPU per row (each probe re-evaluates its pmod/
  * element_at/shiftleft nodes, and the optimizer inlines the shared
  * base-hash struct back into every probe), which made d49/st23's
  * prefilter COST more than the exact verify it prefilters at fixture
  * scale. Here the string hashes once per base, the k probes are
  * primitive long ops over a plain `long[]`, and the call inlines into
  * the enclosing WholeStageCodegen stage.
  *
  * Hash identity with the SQL builder is the correctness contract: the
  * filter's words are built by [[BloomFilter.wordsDF]] with the SQL
  * `xxhash64`, so the probe MUST reproduce `pmod(xxhash64(x), 2^60)`
  * and `pmod(xxhash64('graft-bloom-h2', x), 2^31) | 1` bit-for-bit —
  * [[XxHash64Function]] IS the engine's xxhash64 (seed 42; the 2-arg
  * form chains the literal's hash as the seed, precomputed once in
  * [[BloomProbeExpr.H2Seed]]). Pinned against the composable chain in
  * BloomFilterSpec.
  *
  * Children: (key STRING, words ARRAY<BIGINT> foldable, bits INT
  * foldable, k INT foldable). Null key → null verdict (the composable
  * chain's null semantics). */
case class BloomProbeExpr(key: Expression, wordsExpr: Expression,
                          bitsExpr: Expression, kExpr: Expression)
    extends Expression {

  override def children: Seq[Expression] = Seq(key, wordsExpr, bitsExpr, kExpr)
  override def nullable: Boolean = key.nullable
  override def dataType: DataType = BooleanType
  override def prettyName: String = BloomProbeExpr.Name

  override def checkInputDataTypes(): TypeCheckResult = {
    def arrOk(t: DataType): Boolean = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (key.dataType == StringType && arrOk(wordsExpr.dataType) &&
        wordsExpr.foldable && bitsExpr.dataType == IntegerType &&
        bitsExpr.foldable && kExpr.dataType == IntegerType && kExpr.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${BloomProbeExpr.Name} requires (STRING key, constant ARRAY<BIGINT> words, " +
        s"constant INT bits, constant INT k), got ${children.map(_.dataType).mkString(", ")}")
  }

  @transient private lazy val words: Array[Long] =
    wordsExpr.eval(null).asInstanceOf[ArrayData].toLongArray()
  @transient private lazy val bits: Int = bitsExpr.eval(null).asInstanceOf[Int]
  @transient private lazy val k: Int = kExpr.eval(null).asInstanceOf[Int]

  override def eval(input: InternalRow): Any = {
    val v = key.eval(input)
    if (v == null) null
    else BloomProbeExpr.probe(v.asInstanceOf[UTF8String], words, bits, k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("bloomWords", words, "long[]")
    val childGen = key.genCode(ctx)
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = ${childGen.isNull};
        boolean ${ev.value} = false;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.BloomProbeExpr.probe(
            ${childGen.value}, $w, $bits, $k);
        }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(key = newChildren(0), wordsExpr = newChildren(1),
      bitsExpr = newChildren(2), kExpr = newChildren(3))
}

object BloomProbeExpr {
  val Name = "bloom_probe"

  /** Chained seed of the 2-arg `xxhash64('graft-bloom-h2', x)`: the SQL
    * n-ary hash folds left with seed 42, so the literal's hash is the
    * effective seed of the key's hash. */
  val H2Seed: Long =
    XxHash64Function.hash(UTF8String.fromString("graft-bloom-h2"), StringType, 42L)

  private def pmod(a: Long, m: Long): Long = {
    val r = a % m
    if (r < 0) r + m else r
  }

  /** The per-row probe — called from generated code too, so it must
    * stay a static pure function of its arguments. Fails fast on a
    * (words, bits) geometry mismatch: `bloom_probe` is registered as a
    * public SQL function, and an unguarded `words[pos >> 6]` would
    * surface a caller's bad geometry as an ArrayIndexOutOfBounds deep
    * inside codegen instead of a named contract violation (the
    * composable element_at chain degrades to null/false there). */
  def probe(s: UTF8String, words: Array[Long], bits: Int, k: Int): Boolean = {
    require(bits > 0 && bits <= words.length.toLong * 64L,
      s"$Name: bits=$bits exceeds the words array capacity " +
        s"(${words.length} words = ${words.length.toLong * 64L} bits)")
    val h1 = pmod(XxHash64Function.hash(s, StringType, 42L), 1L << 60)
    val h2 = pmod(XxHash64Function.hash(s, StringType, H2Seed), 1L << 31) | 1L
    var i = 0
    while (i < k) {
      val pos = pmod(h1 + i.toLong * h2, bits.toLong)
      if ((words((pos >> 6).toInt) & (1L << pmod(pos, 64L).toInt)) == 0L) return false
      i += 1
    }
    true
  }
}
