package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions

/** Typed Aggregators — the modern replacement for the reference's
  * UserDefinedAggregateFunction (removed in Spark 4). Provided for the
  * cases where a custom aggregate is genuinely wanted; the engine's own
  * queries prefer built-ins (q13 uses `concat_ws(sort_array(collect_set))`
  * — codegen'd, no kryo buffers), and a spec pins that both forms agree.
  */
object Aggregators {

  /** The reference's GroupConcatDistinct
    * (areaStat/src/main/scala/GroupConcatDistinct.scala:8-56) as a typed
    * Aggregator: distinct values, sorted, comma-joined. The set buffer
    * makes the reference's merge-without-dedup bug
    * (GroupConcatDistinct.scala:38-51) structurally impossible. */
  private class GroupConcatDistinct extends Aggregator[String, Set[String], String] {
    override def zero: Set[String] = Set.empty
    override def reduce(b: Set[String], a: String): Set[String] =
      if (a == null) b else b + a
    override def merge(b1: Set[String], b2: Set[String]): Set[String] = b1 ++ b2
    override def finish(r: Set[String]): String = r.toSeq.sorted.mkString(",")
    override def bufferEncoder: Encoder[Set[String]] = Encoders.kryo[Set[String]]
    override def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** Column-API handle: `df.agg(groupConcatDistinct(col("x")))`. */
  val groupConcatDistinct: UserDefinedFunction =
    functions.udaf(new GroupConcatDistinct)

  /** s05's stratified sample as a BOUNDED aggregate: keeps the `quota`
    * smallest (rnd, id) pairs per group — row-identical to
    * `row_number().over(partitionBy(stratum).orderBy(rnd, id)) <= quota`
    * (the top-quota of a total order is the same set however it is
    * computed; pinned in StratifiedSampleSpec), but as a partial-
    * aggregable fold: map-side combine caps every input partition's
    * contribution at quota rows, so the exchange carries
    * O(#strata × quota × #partitions) candidate pairs instead of every
    * event row through a full per-stratum shuffle + sort. At 100 TB
    * that is the difference between shuffling ~200 sampled rows and
    * shuffling the corpus. `quota` rides the input (joined per-stratum,
    * constant within a group; max() folds the zero state's 0).
    *
    * Tie-break (rnd, id) is a total order via Double.compare — the
    * KmvSketch pairLt discipline, though rand() never emits NaN. */
  private class QuotaSample
      extends Aggregator[(Long, Double, Long), (Long, Array[(Double, Long)]), Array[Long]] {
    private def lt(ar: Double, ai: Long, br: Double, bi: Long): Boolean = {
      val c = java.lang.Double.compare(ar, br)
      c < 0 || (c == 0 && ai < bi)
    }
    /** Sorted-insert keeping the q smallest; O(1) reject when full and
      * the candidate is not below the current max. */
    private def insert(q: Long, buf: Array[(Double, Long)],
                       r: Double, id: Long): Array[(Double, Long)] = {
      val n = buf.length
      if (q <= 0) return buf
      if (n >= q && !lt(r, id, buf(n - 1)._1, buf(n - 1)._2)) return buf
      var lo = 0
      var hi = n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (lt(buf(mid)._1, buf(mid)._2, r, id)) lo = mid + 1 else hi = mid
      }
      val grown = new Array[(Double, Long)](n + 1)
      System.arraycopy(buf, 0, grown, 0, lo)
      grown(lo) = (r, id)
      System.arraycopy(buf, lo, grown, lo + 1, n - lo)
      if (grown.length > q) grown.dropRight(1) else grown
    }
    override def zero: (Long, Array[(Double, Long)]) =
      (0L, Array.empty[(Double, Long)])
    override def reduce(b: (Long, Array[(Double, Long)]),
                        a: (Long, Double, Long)): (Long, Array[(Double, Long)]) = {
      val q = math.max(b._1, a._1)
      (q, insert(q, b._2, a._2, a._3))
    }
    override def merge(b1: (Long, Array[(Double, Long)]),
                       b2: (Long, Array[(Double, Long)])): (Long, Array[(Double, Long)]) = {
      val q = math.max(b1._1, b2._1)
      val (x, y) = (b1._2, b2._2)
      val out = new Array[(Double, Long)](math.min(q, (x.length + y.length).toLong).toInt)
      var i = 0; var j = 0; var o = 0
      while (o < out.length) {
        out(o) =
          if (j >= y.length || (i < x.length && lt(x(i)._1, x(i)._2, y(j)._1, y(j)._2))) {
            i += 1; x(i - 1)
          } else { j += 1; y(j - 1) }
        o += 1
      }
      (q, out)
    }
    /** Sample ids in draw order (ascending rnd). */
    override def finish(b: (Long, Array[(Double, Long)])): Array[Long] =
      b._2.map(_._2)
    override def bufferEncoder: Encoder[(Long, Array[(Double, Long)])] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Array[(Double, Long)])]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Column-API handle: `quotaSample(quotaCol, rndCol, idCol)`. */
  val quotaSample: UserDefinedFunction = functions.udaf(new QuotaSample)
}
