package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Strategy-gated equi-join for the bucket/band self-join family (LSH
  * bands, Jaccard blocks, hyperplane buckets, IVF cells, candidate→doc
  * verification joins).
  *
  * The local[32] default is `broadcast`: bucket keys are few, so hashing
  * the corpus into #keys partitions would collapse parallelism, while a
  * broadcast keeps the probe side's partitioning. But the broadcast side
  * here is a FULL derived table (signatures / shingle sets / vectors) —
  * at 100 TB that's a driver OOM, not a plan. The at-scale setting is
  *
  *   spark.conf.set(SelfJoin.StrategyConf, "shuffle")
  *
  * which plans a sort-merge join with an Exchange on the bucket key on
  * both sides — the standard banded-LSH bucket join — and leaves skewed
  * buckets to AQE's OptimizeSkewedJoin (enabled in this engine's
  * sessions), which splits a hot bucket's partition and replicates the
  * matching side instead of pinning it on one task. `auto` delegates to
  * Catalyst's size-based choice (broadcast below
  * `spark.sql.autoBroadcastJoinThreshold`, shuffle above), which is the
  * right production default when table stats are trustworthy.
  *
  * Both shapes are pinned in PlanAuditSpec; results are
  * strategy-invariant (same rows, any join order), which
  * SelfJoinStrategySpec asserts query-by-query.
  */
object SelfJoin {
  val StrategyConf = "spark.graft.selfJoin.strategy"

  def on(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    joined(left, right, keys, "inner")

  /** Strategy-gated LEFT SEMI — the reduction join shape (restrict a
    * heavy table to keys present in a derived list, e.g. d03's
    * candidate-doc shingle reduction). Same gate, same reasoning: the
    * key list is small locally (broadcast), but at 100 TB a candidate
    * list is itself unbounded — shuffle mode sort-merges it like every
    * other self-join side. */
  def semi(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    joined(left, right, keys, "left_semi")

  private def joined(left: DataFrame, right: DataFrame,
                     keys: Seq[String], how: String): DataFrame =
    left.sparkSession.conf.get(StrategyConf, "broadcast") match {
      case "shuffle"   => left.join(right.hint("merge"), keys, how)
      case "auto"      => left.join(right, keys, how)
      case "broadcast" => left.join(broadcast(right), keys, how)
      case other => // a typo'd at-scale config must not silently take the driver-OOM path
        throw new IllegalArgumentException(
          s"$StrategyConf must be broadcast|shuffle|auto, got '$other'")
    }
}
