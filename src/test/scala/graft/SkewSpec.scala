package graft

import org.apache.spark.sql.functions._
import graft.operators.SelfJoin

/** Stress test for the at-scale skew story (round-4 verdict item 7).
  * The shuffle-strategy docs claim AQE's OptimizeSkewedJoin handles a
  * hot bucket; until now no test INDUCED skew. This one builds a
  * fixture where one bucket key holds ~30% of all rows (the shape a
  * boilerplate-heavy LSH band bucket produces), runs the same
  * strategy-gated equi-join d03/e02 use in shuffle mode with skew
  * thresholds scaled down to fixture size, and asserts both that the
  * join completes with exact results and that the adaptive plan
  * actually split the skewed partition.
  */
class SkewSpec extends GraftSuite {

  test("shuffle strategy + AQE splits a hot bucket and keeps results exact") {
    val n = 200000L
    val hotShare = 3 // id % 10 < 3 → 30% of rows on bucket 0
    val left = spark.range(0, n)
      .select(
        when(col("id") % 10 < hotShare, lit(0L))
          .otherwise(pmod(col("id"), lit(1000L)) + 1L).as("bucket"),
        col("id").as("ida"),
        // ~100-byte payload so the hot partition's shuffle bytes clear
        // the (scaled-down) skew threshold
        concat_ws("", (1 to 10).map(_ => md5(col("id").cast("string"))): _*).as("payload"))
    val right = spark.range(0, 1001)
      .select(col("id").as("bucket"), (col("id") * 7L).as("tag"))
    val confs = Seq(
      SelfJoin.StrategyConf -> "shuffle",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1MB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "512KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val joined = SelfJoin.on(left, right, Seq("bucket"))
      // execute THIS dataframe's own physical plan (count()/collect()
      // would build a separate QueryExecution and the adaptive plan
      // below would stay un-finalized) — and exactness despite the
      // split: every left row matches exactly one right row
      assert(joined.queryExecution.toRdd.count() === n)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"shuffle mode must sort-merge:\n$plan")
      // OptimizeSkewedJoin marks the join and the shuffle read it split
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"hot bucket was not skew-split:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("range join under a hot time bucket: skew-split with exact residual filtering") {
    val n = 200000L
    val w = 1000000L // bucket width
    // 30% of points land in time bucket 0 (the "hot minute"); the rest
    // spread across 1000 buckets
    val points = spark.range(0, n)
      .select(
        when(col("id") % 10 < 3, pmod(col("id"), lit(w)))
          .otherwise((pmod(col("id"), lit(1000L)) + 1L) * w + pmod(col("id"), lit(w)))
          .as("p"),
        col("id").as("pid"),
        concat_ws("", (1 to 10).map(_ => md5(col("id").cast("string"))): _*).as("payload"))
    // one interval per bucket, covering it exactly → every point matches
    // exactly one interval
    val intervals = spark.range(0, 1001)
      .select(col("id").as("iid"), (col("id") * w).as("lo"), (col("id") * w + w - 1).as("hi"))
    val confs = Seq(
      SelfJoin.StrategyConf -> "shuffle",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1MB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "512KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val joined = graft.operators.RangeJoin
        .bucketed(points, intervals, "p", "lo", "hi", w)
      assert(joined.queryExecution.toRdd.count() === n,
        "every point lies in exactly one covering interval")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"shuffle mode must sort-merge:\n$plan")
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"hot time bucket was not skew-split:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
