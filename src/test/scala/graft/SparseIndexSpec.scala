package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.etl.Sinks
import graft.jobs.IncrementalIndex
import graft.operators.LlmText

/** The persisted SPARSE retrieval index — the postings store that turns
  * d33 from an operator into a serving pipeline with a day 2. Day 1
  * freezes term statistics and lands the weighted postings + norms;
  * day 2's query batch weights itself under the FROZEN stats and probes
  * the store with zero corpus re-tokenization. Tests run in declaration
  * order; the append/reidf tests mutate their own second store.
  */
class SparseIndexSpec extends GraftSuite {

  /** Query-partitioned corpus layout + a full-corpus day-1 index. The
    * partition split mirrors d33's deterministic query subsample, so
    * the stored probe is comparable to d33 verbatim (queries are corpus
    * members — the reference formulation). */
  private lazy val env: (String, String) = {
    val tmp = Files.createTempDirectory("graft-sparse-").toString
    val docsDir = s"$tmp/docs"; val indexDir = s"$tmp/index"
    Sinks.writePartitioned(
      Tables.documents(spark, sf).withColumn("part",
        when(col("doc_id") % LlmText.SparseQMod === 0, "q").otherwise("c")),
      docsDir, Seq("part"))
    IncrementalIndex.writeSparseIndex(spark, Tables.documents(spark, sf), indexDir)
    (docsDir, indexDir)
  }

  private def queryBatch = spark.read.parquet(env._1)
    .where(col("part") === "q").drop("part")

  /** The files a plan's scans actually SELECT after partition pruning
    * (the IncrementalIndexSpec shape). */
  private def scannedFiles(mk: => org.apache.spark.sql.DataFrame): Seq[String] = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try mk.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.toPartitionArray.map(_.filePath.toString).toSeq
    }.flatten
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("stored-postings probe is row-identical to the d33 recompute form") {
    val got = IncrementalIndex.probeSparse(spark, queryBatch, env._2)
      .collect().map(_.toString).sorted.toSeq
    val expect = LlmText.d33SparseCosine(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(got.nonEmpty && got === expect)
  }

  test("sparse probe reads only the query partition and the stored index") {
    var caches: Seq[org.apache.spark.sql.DataFrame] = Nil
    try {
      val files = scannedFiles {
        val (df, c) = IncrementalIndex.probeSparseLazy(spark, queryBatch, env._2)
        caches = c
        df
      }
      assert(files.nonEmpty)
      val off = files.filterNot(f => f.contains("part=q") || f.contains("/index/"))
      assert(off.isEmpty, s"sparse probe re-reads corpus text: ${off.take(3).mkString(", ")}")
    } finally caches.foreach(_.unpersist())
  }

  test("append folds new postings under the FROZEN idf and leaves term stats untouched") {
    val tmp = Files.createTempDirectory("graft-sparse-incr-").toString
    val mod = LlmText.IncrementalBatchMod
    val all = Tables.documents(spark, sf)
    val day1 = all.where(col("doc_id") % mod =!= 0)
    val day2 = all.where(col("doc_id") % mod === 0)
    IncrementalIndex.writeSparseIndex(spark, day1, tmp)
    val statsBefore = spark.read
      .parquet(s"$tmp/${IncrementalIndex.TermStats}")
      .collect().map(_.toString).sorted.toSeq
    IncrementalIndex.appendSparsePostings(spark, day2, tmp)
    val statsAfter = spark.read
      .parquet(s"$tmp/${IncrementalIndex.TermStats}")
      .collect().map(_.toString).sorted.toSeq
    assert(statsAfter === statsBefore, "append must never touch the frozen statistics")
    // the full store now equals one pass over BOTH days weighted under
    // day-1's frozen stats — day-2 docs joined the index, day-1 rows
    // were not rewritten, unseen day-2 terms dropped by construction
    val statsDf = spark.read.parquet(s"$tmp/${IncrementalIndex.TermStats}")
    val expectPostings = LlmText.weightedPostingsOf(
        LlmText.tfOf(LlmText.baseFrom(all)), statsDf)
      .collect().map(_.toString).sorted.toSeq
    val gotPostings = spark.read
      .parquet(s"$tmp/${IncrementalIndex.Postings}")
      .collect().map(_.toString).sorted.toSeq
    assert(gotPostings === expectPostings)
    val expectNorms = LlmText.sparseNormsOf(LlmText.weightedPostingsOf(
        LlmText.tfOf(LlmText.baseFrom(day1)), statsDf))
      .unionByName(LlmText.sparseNormsOf(LlmText.weightedPostingsOf(
        LlmText.tfOf(LlmText.baseFrom(day2)), statsDf)))
      .collect().map(_.toString).sorted.toSeq
    val gotNorms = spark.read
      .parquet(s"$tmp/${IncrementalIndex.DocNorms}")
      .collect().map(_.toString).sorted.toSeq
    assert(gotNorms === expectNorms)
    // reidf: the explicit re-weighting event — stats recomputed over the
    // corpus so far, postings rebuilt wholesale, drift reset
    IncrementalIndex.reidf(spark, all, tmp)
    val tfAll = LlmText.tfOf(LlmText.baseFrom(all))
    val expectStats = LlmText.termStatsOf(spark, LlmText.baseFrom(all), tfAll)
      .collect().map(_.toString).sorted.toSeq
    val reStats = spark.read
      .parquet(s"$tmp/${IncrementalIndex.TermStats}")
      .collect().map(_.toString).sorted.toSeq
    assert(reStats === expectStats)
    assert(reStats !== statsBefore, "re-idf over a grown corpus must move the statistics")
  }
}
