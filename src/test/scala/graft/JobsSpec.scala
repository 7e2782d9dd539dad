package graft

import java.util.Properties

import org.apache.spark.sql.functions._
import graft.functions.TaskParams
import graft.jobs.{AreaTop3Job, SessionJob}
import graft.operators.Categories

/** End-to-end job lifecycles against embedded Derby: params JSON →
  * filtered frame → every output appended under one task UUID — the
  * reference's unit of use (SessionStat.scala:23-92,
  * AreaTop3Stat.scala:15-58). Operator RESULTS are oracle-pinned
  * elsewhere; what this spec pins is the wiring: all tables written,
  * keyed correctly, appends accrete across runs, and the job output
  * equals the library query it wires.
  */
class JobsSpec extends GraftSuite {

  private val url = "jdbc:derby:memory:graftjobsdb;create=true"
  private val props = new Properties()

  private def table(name: String) = spark.read.jdbc(url, name, props)

  test("SessionJob writes all five outputs keyed by the task UUID") {
    val p = TaskParams.fromJson(SessionJob.DefaultParamsJson)
    SessionJob.run(spark, sf, url, props, p, "task-one")
    val tables = Seq(SessionJob.StatsTable, SessionJob.RatioTable,
      SessionJob.ExtractTable, SessionJob.Top10CategoryTable,
      SessionJob.Top10SessionTable)
    for (t <- tables) {
      val rows = table(t).where(col("task_id") === "task-one")
      assert(rows.count() > 0, s"$t must contain rows for the task")
    }
    assert(table(SessionJob.StatsTable).where(col("task_id") === "task-one").count() === 1)
    assert(table(SessionJob.RatioTable).where(col("task_id") === "task-one").count() === 1)
    assert(table(SessionJob.Top10CategoryTable)
      .where(col("task_id") === "task-one").count() <= 10)
  }

  test("SessionJob appends accrete: a second run keys its own rows") {
    val p = TaskParams.fromJson(SessionJob.DefaultParamsJson)
    SessionJob.run(spark, sf, url, props, p, "task-two")
    val ids = table(SessionJob.RatioTable)
      .select("task_id").distinct().collect().map(_.getString(0)).toSet
    assert(ids.contains("task-one") && ids.contains("task-two"))
    // identical params ⇒ identical (deterministic) extract rows per task
    val one = table(SessionJob.ExtractTable).where(col("task_id") === "task-one")
      .drop("task_id").collect().map(_.toString).sorted.toSeq
    val two = table(SessionJob.ExtractTable).where(col("task_id") === "task-two")
      .drop("task_id").collect().map(_.toString).sorted.toSeq
    assert(one === two)
  }

  test("AreaTop3Job output equals the c07 library query row-for-row") {
    AreaTop3Job.run(spark, sf, url, props, TaskParams.empty, "task-area")
    val got = table(AreaTop3Job.Table).where(col("task_id") === "task-area")
      .drop("task_id").collect().map(_.toString).sorted.toSeq
    // empty params = no filter ⇒ the job wires exactly c07
    val expect = Categories.c07AreaTop3(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(got === expect)
  }

  test("SessionJob staging mode: identical outputs, date-pruned staging reads") {
    val p = TaskParams.fromJson(SessionJob.DefaultParamsJson)
    val staging = java.nio.file.Files.createTempDirectory("graft-staging-").toString
    SessionJob.run(spark, sf, url, props, p, "task-staged", Some(staging))
    // byte-identical outputs vs the in-memory path ("task-one")
    for (t <- Seq(SessionJob.RatioTable, SessionJob.ExtractTable)) {
      val direct = table(t).where(col("task_id") === "task-one")
        .drop("task_id").collect().map(_.toString).sorted.toSeq
      val staged = table(t).where(col("task_id") === "task-staged")
        .drop("task_id").collect().map(_.toString).sorted.toSeq
      assert(staged === direct, s"$t must not depend on the staging mode")
    }
    // a date-scoped read of the staging copy prunes partition dirs
    val day = spark.read.parquet(staging).select("date").distinct()
      .collect().map(_.get(0).toString).sorted.head
    val pruned = spark.read.parquet(staging).where(col("date") === day)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("isnotnull(date"),
      s"date filter must prune partitions:\n$scan")
  }

  test("AdverStatJob writes the four streaming outputs keyed by the task UUID") {
    graft.jobs.AdverStatJob.run(spark, sf, url, props, "task-adver")
    import graft.jobs.AdverStatJob._
    for (t <- Seq(TrendTable, StatTable, Top3Table, BlacklistTable)) {
      val n = table(t).where(col("task_id") === "task-adver").count()
      assert(n > 0, s"$t must contain rows for the task")
    }
    // blacklist rows are exactly the threshold-promoted users
    val direct = graft.streaming.AdAnalytics.st05ThresholdPromote(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val viaJob = table(BlacklistTable).where(col("task_id") === "task-adver")
      .drop("task_id").collect().map(_.toString).sorted.toSeq
    assert(viaJob === direct)
  }

  test("job mains run end-to-end with an existing session") {
    SessionJob.main(Array(sf, url))
    AreaTop3Job.main(Array(sf, url))
    // each main generated a fresh UUID and appended under it
    assert(table(SessionJob.RatioTable).select("task_id").distinct().count() >= 3)
    assert(table(AreaTop3Job.Table).select("task_id").distinct().count() >= 2)
  }
}
