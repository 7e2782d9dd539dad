package graft

import org.apache.spark.sql.functions._

/** Pins the two Spark runtime-pruning mechanisms the 100 TB story
  * leans on beyond AQE skew handling (docs/SCALE.md):
  *
  *  - runtime BLOOM-FILTER injection: on a shuffle join whose build
  *    side carries a selective predicate, the optimizer plants a bloom
  *    filter of the build-side keys into the probe-side scan, cutting
  *    shuffle volume before the exchange — the mechanism that makes
  *    "big fact ⋈ filtered dim without broadcast" survive at scale.
  *  - DYNAMIC PARTITION PRUNING: a broadcastable dim filtered on the
  *    fact's partition column prunes fact PARTITIONS at runtime — the
  *    mechanism that makes date-partitioned layouts (etl.Sinks'
  *    staging mode) pay only for the dates a query touches.
  *
  * Local thresholds are scaled to fixture size exactly like SkewSpec
  * scales the skew thresholds; both tests also pin result equality
  * against the mechanism-off run, so the pruning is proven
  * value-neutral, not just present in the plan.
  */
class RuntimeFilterSpec extends GraftSuite {

  private def withConfs[A](confs: Seq[(String, String)])(body: => A): A = {
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter injects on the probe side of a selective shuffle join") {
    val fact = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val dim = Tables.orders(spark, sf)
      .where(col("o_totalprice") < 1000.0) // selective build side
      .select("o_orderkey")
    def joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
    val expected = withConfs(Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1"))(joined.count())
    withConfs(Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // fixture scans are far under the 10 GB production default
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")) {
      val df = joined
      assert(df.queryExecution.toRdd.count() === expected,
        "bloom filter must be value-neutral")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"no runtime bloom filter on the probe side:\n$plan")
    }
  }

  test("dynamic partition pruning reads only the dim-selected fact partitions") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp-").toString
    // date-partitioned fact — the etl.Sinks staging layout
    Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
      .write.partitionBy("l_returnflag").mode("overwrite").parquet(dir)
    val fact = spark.read.parquet(dir)
    // the pruning rule requires an actual selective FILTER on the dim
    // side; a local relation won't do (constant folding evaluates the
    // filter away before the pruning batch runs), so the dim is
    // parquet-backed like any production dimension table
    val dimDir = java.nio.file.Files.createTempDirectory("graft-dpp-dim-").toString
    Seq(("A", 1), ("N", 2), ("R", 3)).toDF("flag", "grp")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).where(col("grp") === 1).select("flag")
    def joined = fact.join(broadcast(dim), col("l_returnflag") === col("flag"))
    val expected = withConfs(Seq(
      "spark.sql.optimizer.dynamicPartitionPruning.enabled" -> "false"))(joined.count())
    withConfs(Seq(
      "spark.sql.optimizer.dynamicPartitionPruning.enabled" -> "true")) {
      val df = joined
      assert(df.queryExecution.toRdd.count() === expected,
        "partition pruning must be value-neutral")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"),
        s"fact scan carries no dynamic partition filter:\n$plan")
    }
  }
}
