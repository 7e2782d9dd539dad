package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval-containment) join via interval bucketing — the
  * published rewrite for a join Spark has no native strategy for.
  *
  * `points ⋈ intervals ON point ∈ [lo, hi]` has no equi-key, so Catalyst
  * plans BroadcastNestedLoopJoin (quadratic work, and impossible when
  * neither side fits in one executor's memory). The rewrite quantizes the
  * domain into buckets of a chosen width: each interval replicates to the
  * buckets its span covers (⌈span/width⌉ + 1 keys), each point maps to
  * exactly ONE bucket, and the join becomes an EQUI-join on the bucket
  * key followed by the residual range predicate. Because the point side
  * holds a single bucket, every qualifying (interval, point) pair meets
  * exactly once — no dedup stage.
  *
  * Scale properties:
  *  - Both sides shuffle-partition on the bucket key → sort-merge/hash
  *    equi-join machinery, AQE skew-split applies to hot buckets (a hot
  *    minute of events is a hot bucket — the same lever d03's band join
  *    leans on, stress-pinned in SkewSpec).
  *  - Replication factor is span/width + 1: width ≈ the typical interval
  *    span keeps it ≤ ~3× the interval side, tunable per workload.
  *  - No all-pairs product at any scale; the residual filter runs inside
  *    the joined partitions (codegen'd comparison, no extra exchange).
  *
  * The same shape generalizes to interval-overlap joins (replicate BOTH
  * sides, dedup on a canonical bucket) — this is the containment form the
  * m13 query and the reference-adjacent "events near an incident" lookups
  * need. Reference has equi-joins only (SURVEY §2.3); this is a north-star
  * extension operator.
  */
object RangeJoin {

  /** Exact floor division on longs: `floor(a / w)` routes through a
    * DOUBLE division, which is only exact for |a| < 2^53 — an epoch in
    * nanos or a synthetic 63-bit key silently lands pairs in the wrong
    * bucket. Truncating integer DIV corrected toward −∞ stays in
    * integer arithmetic with no intermediate that can overflow (the
    * earlier `(a - pmod(a, w)) div w` form wrapped for a within
    * pmod(a,w) of Long.MinValue). Floor (not truncation) keeps bucket
    * ids MONOTONE in `a` across zero, so consecutive keys share or
    * neighbor buckets. NOTE this is an internal candidate-generation
    * key only — results come from the exact containment filter after
    * the bucket join, so no oracle depends on it (DuckDB's `//`, for
    * the record, TRUNCATES toward zero: −7 // 2 = −3, measured round
    * 10 — earlier wording here claimed the two match domain-wide).
    * Requires w > 0 (enforced by the caller). */
  private def floorDiv(a: Column, w: Long): Column =
    call_function("div", a, lit(w)) -
      when(a % lit(w) < 0, lit(1L)).otherwise(lit(0L))

  /** Join `points` to `intervals` on `points(pointCol)` ∈
    * `[intervals(loCol), intervals(hiCol)]` (inclusive). All three
    * columns must share an integral domain (e.g. epoch micros);
    * `bucketWidth` is in the same unit. Column sets must be disjoint. */
  def bucketed(points: DataFrame, intervals: DataFrame, pointCol: String,
      loCol: String, hiCol: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val pts = points.withColumn("__bucket", floorDiv(col(pointCol), bucketWidth))
    // malformed intervals (lo > hi) can never contain a point, but
    // without this filter `sequence` would step DOWN through them
    // (implicit step -1) and replicate the row to every bucket of the
    // reversed span — rows the residual predicate then discards, so the
    // waste is invisible in the output. Drop them before the explode.
    val ivs = intervals.where(col(loCol) <= col(hiCol)).withColumn("__bucket",
      explode(sequence(floorDiv(col(loCol), bucketWidth), floorDiv(col(hiCol), bucketWidth))))
    // strategy-gated like every bucket join ([[SelfJoin]]): broadcast
    // locally; `spark.graft.selfJoin.strategy=shuffle` at scale plans
    // the sort-merge exchange on the bucket key and leaves a hot time
    // bucket to AQE's skew split
    SelfJoin.on(ivs, pts, Seq("__bucket"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }
}
