package graft

import java.nio.file.Files
import java.util.Properties

import org.apache.spark.sql.functions._

import graft.etl.Sinks
import graft.jobs.{IncrementalIndex, IngestJob}
import graft.operators.{Embeddings, LlmText}

/** The two-day persisted-index lifecycle — the test that gives the
  * incremental operators (d30/e09) their day 2. Day 1 writes the
  * band-key/shingle and centroid/member tables to a parquet store from
  * its own partition; day 2 reads ONLY its partition, probes the STORED
  * index, and must (a) reproduce the oracle-pinned recompute forms
  * row-for-row, (b) never read a day-1 text/vector file, and (c) fold
  * its survivors into the store. Tests run in declaration order; the
  * final test mutates the store and therefore comes last.
  */
class IncrementalIndexSpec extends GraftSuite {

  private val mod = LlmText.IncrementalBatchMod

  /** Two-day partitioned corpus layout + day-1 index, built once. The
    * day split mirrors the operators' deterministic batch slice, so the
    * stored-index probes are comparable to d30/e09 verbatim. */
  private lazy val env: (String, String, String) = {
    val tmp = Files.createTempDirectory("graft-incr-").toString
    val docsDir = s"$tmp/docs"; val vecsDir = s"$tmp/vecs"
    val indexDir = s"$tmp/index"
    Sinks.writePartitioned(
      Tables.documents(spark, sf).withColumn("ingest_day",
        when(col("doc_id") % mod === 0, 2).otherwise(1)),
      docsDir, Seq("ingest_day"))
    Sinks.writePartitioned(
      Tables.embeddings(spark, sf).withColumn("ingest_day",
        when(col("vec_id") % mod === 0, 2).otherwise(1)),
      vecsDir, Seq("ingest_day"))
    val day1Docs = spark.read.parquet(docsDir)
      .where(col("ingest_day") === 1).drop("ingest_day")
    val day1Vecs = spark.read.parquet(vecsDir)
      .where(col("ingest_day") === 1).drop("ingest_day")
    // the frozen centroid table is trained on the full history — e09's
    // oracle formulation — so the stored probe must reproduce e09
    // verbatim; members stored are day-1's only
    IngestJob.buildIndex(spark, day1Docs, day1Vecs, indexDir,
      centroidTrain = Some(Tables.embeddings(spark, sf)))
    (docsDir, vecsDir, indexDir)
  }

  private def day2Docs = spark.read.parquet(env._1)
    .where(col("ingest_day") === 2).drop("ingest_day")
  private def day2Vecs = spark.read.parquet(env._2)
    .where(col("ingest_day") === 2).drop("ingest_day")

  /** The files a plan's scans actually SELECT after partition pruning
    * (`inputFiles` lists the whole relation, pruned or not). Built with
    * AQE off so every FileSourceScanExec is visible in the physical
    * tree; the df must be constructed inside the window (by-name). */
  private def scannedFiles(mk: => org.apache.spark.sql.DataFrame): Seq[String] = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try mk.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.toPartitionArray.map(_.filePath.toString).toSeq
    }.flatten
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("day-2 batch read prunes to its partition directory") {
    val files = scannedFiles(day2Docs)
    assert(files.nonEmpty && files.forall(_.contains("ingest_day=2")),
      s"batch scan must touch only its partition: ${files.take(3).mkString(", ")}")
    val plan = day2Docs.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"expected partition filters:\n$plan")
  }

  test("stored-index text probe is row-identical to the d30 recompute form") {
    val got = IncrementalIndex.probeText(spark, day2Docs, env._3)
      .collect().map(_.toString).sorted.toSeq
    val expect = LlmText.d30IncrementalDedup(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(got.nonEmpty && got === expect)
  }

  test("stored-index cell probe is row-identical to the e09 recompute form") {
    val got = IncrementalIndex.probeCells(spark, day2Vecs, env._3)
      .collect().map(_.toString).sorted.toSeq
    val expect = Embeddings.e09IncrementalSemDedup(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(got.nonEmpty && got === expect)
  }

  test("day-2 probes read only the batch partition and the stored index") {
    var caches: Seq[org.apache.spark.sql.DataFrame] = Nil
    try {
      val files = scannedFiles {
        val (df, c) = IncrementalIndex.probeTextLazy(spark, day2Docs, env._3)
        caches = c
        df
      }
      assert(files.nonEmpty)
      val off = files.filterNot(f => f.contains("ingest_day=2") || f.contains("/index/"))
      assert(off.isEmpty, s"text probe reads day-1 data: ${off.take(3).mkString(", ")}")
    } finally caches.foreach(_.unpersist())
    val vFiles = scannedFiles(IncrementalIndex.probeCellsLazy(spark, day2Vecs, env._3))
    assert(vFiles.nonEmpty)
    val vOff = vFiles.filterNot(f => f.contains("ingest_day=2") || f.contains("/index/"))
    assert(vOff.isEmpty, s"cell probe reads day-1 vectors: ${vOff.take(3).mkString(", ")}")
  }

  test("ingestBatch writes keyed verdicts and folds exactly the survivors into the store") {
    val url = "jdbc:derby:memory:graftincr;create=true"
    val props = new Properties()
    IngestJob.ingestBatch(spark, day2Docs, day2Vecs, env._3, url, props, "day-2")
    // verdict tables are the library queries, keyed by the task UUID
    val textViaJob = spark.read.jdbc(url, IngestJob.TextTable, props)
      .where(col("task_id") === "day-2").drop("task_id")
      .collect().map(_.toString).sorted.toSeq
    val textRows = LlmText.d30IncrementalDedup(spark, sf).collect()
    assert(textViaJob === textRows.map(_.toString).sorted.toSeq)
    val cellViaJob = spark.read.jdbc(url, IngestJob.EmbeddingTable, props)
      .where(col("task_id") === "day-2").drop("task_id")
      .collect().map(_.toString).sorted.toSeq
    val cellRows = Embeddings.e09IncrementalSemDedup(spark, sf).collect()
    assert(cellViaJob === cellRows.map(_.toString).sorted.toSeq)
    // store now holds day-1 entries ∪ exactly the day-2 survivors —
    // day 3 would see today's kept docs as corpus
    val day1DocIds = Tables.documents(spark, sf)
      .where(col("doc_id") % mod =!= 0).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val textSurvivors = textRows.filterNot(_.getAs[Boolean]("is_dup"))
      .map(_.getAs[Long]("doc_id")).toSet
    val storedDocIds = spark.read
      .parquet(s"${env._3}/${IncrementalIndex.TextShingles}")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(storedDocIds === day1DocIds ++ textSurvivors)
    val day1VecIds = Tables.embeddings(spark, sf)
      .where(col("vec_id") % mod =!= 0).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val keptVecIds = cellRows.filter(_.getAs[Boolean]("kept"))
      .map(_.getAs[Long]("vec_id")).toSet
    val storedVecIds = spark.read
      .parquet(s"${env._3}/${IncrementalIndex.CellMembers}")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(storedVecIds === day1VecIds ++ keptVecIds)
  }

  test("ingestBatch lands the batch postings: substr probe serves full-corpus spans") {
    // runs after the ingestBatch test (declaration order, like the rest
    // of this lifecycle file): the store now holds day-1's bootstrap
    // postings plus day-2's appended ones, so the persisted probe must
    // equal d44's spans over the WHOLE corpus — cross-day duplicated
    // spans surface exactly like in-corpus ones
    val persisted = IncrementalIndex.probeSubstrSpans(spark, env._3)
      .collect().map(_.toString).sorted.toSeq
    val direct = LlmText.d44CrossdocSpans(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(persisted === direct, "two-day substr store diverged from the batch spans")
  }

  test("stored tokenizer: encodeBpe under the frozen merges equals the canonical per-word tokenizer") {
    val rounds = 6
    val idx = Files.createTempDirectory("graft-bpe-idx-").toString
    val day1 = spark.read.parquet(env._1)
      .where(col("ingest_day") === 1).drop("ingest_day")
    IncrementalIndex.writeBpeIndex(spark, day1, idx, rounds)
    val stored = spark.read.parquet(s"$idx/${IncrementalIndex.BpeMerges}")
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    assert(stored.map(_._1).toSeq === (1 to rounds), "one stored merge per round")
    // encode day 2 against the stored tokenizer; the reference is the
    // canonical list-merge tokenizer applying the STORED merges in rank
    // order (the bpeTrainMerges-spec algorithm, apply side)
    def jvmToks(text: String): Array[String] =
      text.replaceAll("^ +| +$", "").toLowerCase(java.util.Locale.ROOT)
        .replaceAll("\\s+", " ").split(" ", -1)
    def encodeWord(w: String): Int = {
      var syms = w.map(_.toString).toList
      for ((_, a, b) <- stored) {
        def merge(l: List[String]): List[String] = l match {
          case `a` :: `b` :: rest => (a + b) :: merge(rest)
          case h :: rest => h :: merge(rest)
          case Nil => Nil
        }
        syms = merge(syms)
      }
      syms.length
    }
    val want = day2Docs.select("doc_id", "text").collect().map { r =>
      val toks = jvmToks(r.getString(1)).filter(_.nonEmpty)
      r.getLong(0) -> ((toks.length.toLong, toks.map(encodeWord(_).toLong).sum))
    }.toMap
    val got = IncrementalIndex.encodeBpe(spark, day2Docs, idx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length === want.size, "every day-2 document encoded once")
    got.foreach { case (id, nw, nt) =>
      assert((nw, nt) === want(id), s"doc $id stored-tokenizer encode mismatch")
    }
  }

  test("retrain swaps the frozen centroids via e11's Lloyd step and rebuilds the members") {
    val all = Tables.embeddings(spark, sf)
    val q = Embeddings.quantizedFrom(spark, all)
    val before = spark.read
      .parquet(s"${env._3}/${IncrementalIndex.CellCentroids}").localCheckpoint(true)
    val beforeRows = before.collect().map(_.toString).sorted.toSeq
    // expected = exactly two Lloyd rounds from the OLD stored table,
    // evaluated before the store mutates (lineage is fixture + checkpoint)
    val expect = Embeddings.lloydStep(spark, q, Embeddings.lloydStep(spark, q, before))
      .collect().map(_.toString).sorted.toSeq
    IncrementalIndex.retrain(spark, all, all, env._3, rounds = 2)
    val got = spark.read
      .parquet(s"${env._3}/${IncrementalIndex.CellCentroids}")
      .collect().map(_.toString).sorted.toSeq
    assert(got === expect, "stored centroids must be exactly 2 Lloyd rounds from the old table")
    assert(got !== beforeRows, "retrain must actually move the directions")
    // member table rebuilt for the full corpus under the NEW directions
    val members = spark.read.parquet(s"${env._3}/${IncrementalIndex.CellMembers}")
    assert(members.count() === all.count(), "member table rebuilt for the full corpus")
    val expectAsg = Embeddings.assignRanked(spark, q,
        spark.read.parquet(s"${env._3}/${IncrementalIndex.CellCentroids}"))
      .where(col("rn") === 1).select("cell", "vec_id")
      .collect().map(_.toString).sorted.toSeq
    assert(members.select("cell", "vec_id").collect().map(_.toString).sorted.toSeq
      === expectAsg, "members must be the primary-cell assignment under the new centroids")
  }

  test("compacting the stored text index collapses small files and keeps probe verdicts identical") {
    // the maintenance pass an append-only index accrues toward: after
    // enough ingest folds, rewrite each table to target-sized files.
    // Correctness contract: a probe is a pure function of the store's
    // ROWS, so compaction (row-preserving by SinksSpec) must leave
    // verdicts bit-identical.
    def files(table: String): Array[java.io.File] =
      new java.io.File(s"${env._3}/$table")
        .listFiles().filter(_.getName.endsWith(".parquet"))
    // fragment the store the way a run of small ingests would
    for (i <- 0 until 3) {
      IncrementalIndex.writeTextIndex(spark,
        day2Docs.where(col("doc_id") % 3 === i), env._3,
        org.apache.spark.sql.SaveMode.Append)
    }
    val probe = day2Docs.limit(40)
    val before = IncrementalIndex.probeText(spark, probe, env._3)
      .collect().map(_.toString).sorted.toSeq
    val nBefore = files(IncrementalIndex.TextBands).length
    assert(nBefore > 1, "fixture must actually be fragmented before compaction")
    Sinks.compact(spark, s"${env._3}/${IncrementalIndex.TextBands}")
    Sinks.compact(spark, s"${env._3}/${IncrementalIndex.TextShingles}")
    assert(files(IncrementalIndex.TextBands).length < nBefore,
      "compaction must reduce the band table's file count")
    val after = IncrementalIndex.probeText(spark, probe, env._3)
      .collect().map(_.toString).sorted.toSeq
    assert(after === before, "probe verdicts must be bit-identical across compaction")
  }

  /** bid partition directories under a batch-keyed store table. */
  private def bidDirs(root: String): Set[Long] = {
    val f = new java.io.File(root)
    if (!f.exists()) Set.empty
    else f.listFiles().filter(_.isDirectory).map(_.getName)
      .filter(_.startsWith("bid=")).map(_.stripPrefix("bid=").toLong).toSet
  }

  test("watermark compaction of the bid-keyed store: row-preserving, bounded, resumable, nestable") {
    import org.apache.spark.sql.SaveMode
    val idx = Files.createTempDirectory("graft-compact-").toString
    val docs = Tables.documents(spark, sf)
    // bootstrap (bid −1) + four committed micro-batches (bids 0..3),
    // the exactly-once ingest layout st13 accrues
    IncrementalIndex.writeTextIndexBatch(spark,
      docs.where(col("doc_id") % mod =!= 0), idx, batchId = -1L)
    val arrivals = docs.where(col("doc_id") % mod === 0)
    (0L to 3L).foreach(b =>
      IncrementalIndex.writeTextIndexBatch(spark,
        arrivals.where(col("doc_id") % 4 === b), idx, batchId = b))
    val bandsRoot = s"$idx/${IncrementalIndex.TextBands}"
    def rows(table: String): Seq[String] =
      spark.read.parquet(s"$idx/$table").drop("bid")
        .collect().map(_.toString).sorted.toSeq
    val bandsBefore = rows(IncrementalIndex.TextBands)
    val shBefore = rows(IncrementalIndex.TextShingles)
    assert(bidDirs(bandsRoot) === Set(-1L, 0L, 1L, 2L, 3L))
    // a probe pinned before/after: exceptBid(3) semantics must survive
    // (the crash-replay contract — batch 3 is above the watermark)
    val probeBatch = arrivals.where(col("doc_id") % 4 === 3)
    val vBefore = IncrementalIndex.probeText(spark, probeBatch, idx,
      exceptBid = Some(3L)).collect().map(_.toString).sorted.toSeq

    // compact bids ≤ 2: bootstrap + batches 0..2 collapse to ONE
    // segment; batch 3's directory is untouched
    IncrementalIndex.compactTextIndex(spark, idx, upToBid = 2L)
    assert(bidDirs(bandsRoot) === Set(IncrementalIndex.compactedBid(2L), 3L),
      "store must hold exactly the consolidated segment + newer batches")
    assert(rows(IncrementalIndex.TextBands) === bandsBefore,
      "compaction must preserve band rows exactly")
    assert(rows(IncrementalIndex.TextShingles) === shBefore,
      "compaction must preserve shingle rows exactly")
    val vAfter = IncrementalIndex.probeText(spark, probeBatch, idx,
      exceptBid = Some(3L)).collect().map(_.toString).sorted.toSeq
    assert(vAfter === vBefore,
      "exceptBid probe verdicts must be identical across compaction")

    // idempotent: re-running the same watermark is a no-op
    IncrementalIndex.compactTextIndex(spark, idx, upToBid = 2L)
    assert(rows(IncrementalIndex.TextBands) === bandsBefore)
    assert(bidDirs(bandsRoot) === Set(IncrementalIndex.compactedBid(2L), 3L))

    // watermarks are monotone: compacting below an existing segment's
    // coverage must refuse (its label would lie about its contents)
    val e = intercept[IllegalArgumentException] {
      IncrementalIndex.compactBatchStore(spark, idx,
        IncrementalIndex.TextBands, upToBid = 1L)
    }
    assert(e.getMessage.contains("watermark"))

    // nesting: a later watermark folds the earlier segment in
    IncrementalIndex.compactTextIndex(spark, idx, upToBid = 3L)
    assert(bidDirs(bandsRoot) === Set(IncrementalIndex.compactedBid(3L)),
      "the higher-watermark segment must subsume the earlier one")
    assert(rows(IncrementalIndex.TextBands) === bandsBefore)
    assert(rows(IncrementalIndex.TextShingles) === shBefore)

    // crash-resume: phase 1 only (consolidated segment committed, the
    // originals not yet deleted — the crash window), then the
    // documented recovery: re-run the SAME compaction to completion
    IncrementalIndex.writeTextIndexBatch(spark,
      arrivals.where(col("doc_id") % 4 === 0), idx, batchId = 4L)
    val withB4 = rows(IncrementalIndex.TextBands)
    val leftover = IncrementalIndex.compactWritePhase(spark, idx,
      IncrementalIndex.TextBands, upToBid = 4L)
    assert(leftover.nonEmpty, "phase 1 must have consolidated something")
    assert(bidDirs(bandsRoot) ===
      Set(IncrementalIndex.compactedBid(3L), 4L, IncrementalIndex.compactedBid(4L)),
      "the crash window holds originals beside the committed segment")
    IncrementalIndex.compactBatchStore(spark, idx,
      IncrementalIndex.TextBands, upToBid = 4L)
    assert(bidDirs(bandsRoot) === Set(IncrementalIndex.compactedBid(4L)))
    assert(rows(IncrementalIndex.TextBands) === withB4,
      "resumed compaction must land exactly the pre-crash rows")
  }
}
