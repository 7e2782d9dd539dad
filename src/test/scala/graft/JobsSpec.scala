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

  test("SessionJob: a targetPageFlow param adds the flow-convert output") {
    // no flow param ⇒ no flow rows were written by task-one/task-two
    val flowBefore = scala.util.Try(table(SessionJob.FlowTable).count()).getOrElse(0L)
    assert(flowBefore === 0L, "flow table must stay empty without the param")
    val p = TaskParams.fromJson(
      """{"targetPageFlow":"view,click,purchase"}""")
    SessionJob.run(spark, sf, url, props, p, "task-flow")
    val rows = table(SessionJob.FlowTable).where(col("task_id") === "task-flow")
      .collect().map(r => (r.getAs[Int]("step"), r.getAs[String]("pair"))).sorted.toSeq
    // one row per configured route step, in route order
    assert(rows === Seq(1 -> "view->click", 2 -> "click->purchase"))
  }

  test("flow-convert chains denominators along an arbitrary configured route") {
    import graft.functions.TaskParams
    val p = TaskParams(Map(Categories.FlowParam -> "view,click,view,purchase"))
    val sess = graft.operators.Sessions.sessionized(spark, sf)
    val rows = Categories.flowConvertFrom(spark, sess, p).collect()
      .map(r => r.getInt(0) -> (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(rows.keySet === Set(1, 2, 3))
    // step 1's denominator is the route head's raw visit count
    val startPv = sess.where(col("event_type") === "view").count()
    assert(rows(1)._2 === startPv)
    // each later step's denominator is the previous step's pair count
    assert(rows(2)._2 === rows(1)._1)
    assert(rows(3)._2 === rows(2)._1)
    // rates are the exact integer ratios
    for ((_, (n, prev, rate)) <- rows if prev > 0)
      assert(rate === n.toDouble / prev.toDouble)
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

  test("CurationJob writes decisions, manifest, and both audits under one task UUID") {
    graft.jobs.CurationJob.run(spark, sf, url, props, "task-curation")
    import graft.jobs.CurationJob._
    for (t <- Seq(SourceTable, ManifestTable, LshAuditTable, AnnAuditTable, RulesTable)) {
      val n = table(t).where(col("task_id") === "task-curation").count()
      assert(n > 0, s"$t must contain rows for the task")
    }
    // the rule-verdict table covers every document exactly once
    assert(table(RulesTable).where(col("task_id") === "task-curation").count()
      === Tables.documents(spark, sf).count())
    // the stored manifest is exactly the d25 library query
    val direct = graft.operators.LlmText.d25CurationManifest(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val viaJob = table(ManifestTable).where(col("task_id") === "task-curation")
      .drop("task_id").collect().map(_.toString).sorted.toSeq
    assert(viaJob === direct)
    // every manifest doc comes from a source the decision table kept
    val keptSrc = table(SourceTable).where(col("task_id") === "task-curation")
      .where(col("keep")).select("source").collect().map(_.getString(0)).toSet
    val manSrc = table(ManifestTable).where(col("task_id") === "task-curation")
      .select("source").distinct().collect().map(_.getString(0)).toSet
    assert(manSrc.subsetOf(keptSrc))
  }

  test("IngestJob writes both incremental-dedup verdict tables under one task UUID") {
    graft.jobs.IngestJob.run(spark, sf, url, props, "task-ingest")
    import graft.jobs.IngestJob._
    // the stored verdicts are exactly the library queries
    val textDirect = graft.operators.LlmText.d30IncrementalDedup(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val textViaJob = table(TextTable).where(col("task_id") === "task-ingest")
      .drop("task_id").collect().map(_.toString).sorted.toSeq
    assert(textViaJob === textDirect)
    val embDirect = graft.operators.Embeddings.e09IncrementalSemDedup(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val embViaJob = table(EmbeddingTable).where(col("task_id") === "task-ingest")
      .drop("task_id").collect().map(_.toString).sorted.toSeq
    assert(embViaJob === embDirect)
  }

  test("job mains run end-to-end with an existing session") {
    SessionJob.main(Array(sf, url))
    AreaTop3Job.main(Array(sf, url))
    graft.jobs.CurationJob.main(Array(sf, url))
    graft.jobs.IngestJob.main(Array(sf, url))
    assert(table(graft.jobs.IngestJob.TextTable)
      .select("task_id").distinct().count() >= 1)
    // each main generated a fresh UUID and appended under it
    assert(table(SessionJob.RatioTable).select("task_id").distinct().count() >= 3)
    assert(table(AreaTop3Job.Table).select("task_id").distinct().count() >= 2)
    assert(table(graft.jobs.CurationJob.ManifestTable)
      .select("task_id").distinct().count() >= 2)
  }
}
