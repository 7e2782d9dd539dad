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
}
