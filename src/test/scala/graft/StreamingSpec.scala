package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import graft.etl.Upsert
import graft.streaming.{AdAnalytics, Streams}

/** Multi-batch streaming behavior that AvailableNow-over-one-file can't
  * exercise: batch-count invariance of the foreachBatch upsert folds and
  * cross-batch state in flatMapGroupsWithState (SURVEY ST4-ST6).
  */
class StreamingSpec extends GraftSuite {

  private def ckpt(): String =
    java.nio.file.Files.createTempDirectory("graft-test-ckpt-").toString

  test("accumulate-upsert over 3 micro-batches equals the batch aggregate") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    var store = Seq.empty[(Long, Long)].toDF("user_id", "n")
    val q = ms.toDF().toDF("user_id", "event_type")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val delta = batch.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
        val merged = Upsert.accumulate(store, delta, Seq("user_id"), "n").persist()
        merged.count()
        store = merged
        ()
      }
      .option("checkpointLocation", ckpt()).start()
    ms.addData((1L, "a"), (1L, "b"), (2L, "a"))
    q.processAllAvailable()
    ms.addData((1L, "c"))
    q.processAllAvailable()
    ms.addData((2L, "b"), (3L, "a"))
    q.processAllAvailable()
    q.stop()
    val got = store.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 2L -> 2L, 3L -> 1L))
  }

  test("st18: streaming KMV sketch is micro-batch-split invariant and equals the batch sketch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.functions.{KmvSketch, Portable}
    val rng = new scala.util.Random(11)
    val rows = Seq.fill(300)(("t" + rng.nextInt(3), rng.nextInt(90).toLong))
    val K = 8
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.select(col("k"), Portable.h64(col("u")).as("h"))
        .groupBy(col("k")).agg(KmvSketch.kmvValues(K)(col("h")).as("sk"))
    var n = 0
    def run(chunks: Seq[Seq[(String, Long)]]): Map[String, Seq[Long]] = {
      val ms = MemoryStream[(String, Long)]
      n += 1
      val qn = s"st18_split_$n"
      val q = agg(ms.toDF().toDF("k", "u"))
        .writeStream.outputMode("complete").format("memory").queryName(qn)
        .option("checkpointLocation", ckpt()).start()
      chunks.foreach { c => ms.addData(c: _*); q.processAllAvailable() }
      q.stop()
      val out = spark.table(qn).collect()
        .map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
      spark.catalog.dropTempView(qn)
      out
    }
    val oneBatch = run(Seq(rows))
    val manyBatches = run(rows.grouped(17).toSeq)
    assert(oneBatch === manyBatches,
      "streaming KMV state must not depend on the micro-batch split")
    // and the final streamed sketch IS the batch sketch over the same rows
    val batch = agg(rows.toDF("k", "u")).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(oneBatch === batch, "streamed sketch diverged from the batch sketch")
    // the retained set is bounded at K and sorted ascending (the state contract)
    oneBatch.values.foreach { sk =>
      assert(sk.length <= K)
      assert(sk === sk.sorted)
    }
  }

  test("st19: any micro-batch split in ANY order reproduces d44's batch spans") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.jobs.IncrementalIndex
    val arrivals = Tables.documents(spark, sf)
      .select("doc_id", "text", "lang", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq
    def run(chunks: Seq[Seq[(Long, String, String, String, Long)]]): Seq[String] = {
      val idx = java.nio.file.Files.createTempDirectory("graft-st19-test-").toString
      val ms = MemoryStream[(Long, String, String, String, Long)]
      val q = ms.toDF().toDF("doc_id", "text", "lang", "source", "n_chars")
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          IncrementalIndex.writeSubstrIndex(spark, batch, idx,
            org.apache.spark.sql.SaveMode.Append)
          ()
        }
        .option("checkpointLocation", ckpt()).start()
      chunks.foreach { c => ms.addData(c: _*); q.processAllAvailable() }
      q.stop()
      IncrementalIndex.probeSubstrSpans(spark, idx)
        .collect().map(_.toString).sorted.toSeq
    }
    val expected = graft.operators.LlmText.d44CrossdocSpans(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(expected.nonEmpty, "fixture plants cross-doc spans")
    assert(run(arrivals.grouped(13).toSeq) === expected,
      "ascending multi-batch split diverged from d44")
    // postings appends commute, so even a SHUFFLED arrival order lands
    // the identical span table — stronger than st13's ascending contract
    val shuffled = new scala.util.Random(5).shuffle(arrivals).grouped(7).toSeq
    assert(run(shuffled) === expected, "shuffled split diverged from d44")
  }

  test("multi-metric accumulate fold is batch-split invariant (st12 shape)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Seq(("a", 1.10), ("b", 2.25), ("a", 0.40), ("c", 5.00),
      ("b", 1.01), ("a", 3.33), ("c", 0.07), ("a", 0.99))
    def run(chunks: Seq[Seq[(String, Double)]]): Map[String, (Long, Double)] = {
      val ms = MemoryStream[(String, Double)]
      def rollup(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(col("k")).agg(
          count(lit(1)).as("n"),
          sum(col("v").cast("decimal(18,2)")).as("s"))
      var store = rollup(Seq.empty[(String, Double)].toDF("k", "v"))
      val q = ms.toDF().toDF("k", "v")
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val merged = graft.etl.Upsert
            .accumulateAll(store, rollup(batch), Seq("k"), Seq("n", "s")).persist()
          merged.count()
          store = merged
          ()
        }
        .option("checkpointLocation", ckpt()).start()
      chunks.foreach { c => ms.addData(c: _*); q.processAllAvailable() }
      q.stop()
      store.select(col("k"), col("n"), round(col("s"), 2).cast("double").as("s"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    }
    val oneBatch = run(Seq(rows))
    val manyBatches = run(rows.grouped(2).toSeq)
    assert(oneBatch === manyBatches, "fold must not depend on the batch split")
    assert(oneBatch("a") === ((4L, 5.82)))
  }

  test("flatMapGroupsWithState carries cumulative counts across batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Long]
    val updates = ms.toDS()
      .groupByKey(identity)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Long], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + it.size
          state.update(total)
          Iterator((uid, total))
      }.toDF("user_id", "total")
    var store = Seq.empty[(Long, Long)].toDF("user_id", "total")
    val q = updates.writeStream.outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val merged = Upsert.overwrite(store, batch, Seq("user_id")).persist()
        merged.count()
        store = merged
        ()
      }
      .option("checkpointLocation", ckpt()).start()
    ms.addData(1L, 1L, 2L)
    q.processAllAvailable()
    ms.addData(1L, 3L)
    q.processAllAvailable()
    q.stop()
    val got = store.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 2L -> 1L, 3L -> 1L))
  }

  test("st suite: AvailableNow final state equals batch aggregates (smoke at sf0.001)") {
    val total = Tables.events(spark, sf).count()
    val st01 = AdAnalytics.st01ParseCount(spark, sf)
    assert(st01.agg(sum("n")).collect()(0).getLong(0) === total)
    val st04 = AdAnalytics.st04CumulativeState(spark, sf)
    assert(st04.agg(sum("total")).collect()(0).getLong(0) === total)
  }

  test("st08: session_window boundary semantics — a gap of exactly the duration still merges") {
    import spark.implicits._
    // user 1: two events exactly 1800 s apart -> ONE session (touching
    // windows coalesce: Spark's merge condition is inclusive); user 2:
    // 1801 s apart -> TWO. This pins the `>`-on-the-gap contract
    // st08's oracle encodes — measured, not assumed (the oracle
    // originally said `>=`, which this test refuted) — so a Spark-side
    // semantics change in session_window surfaces as a test failure,
    // not as silent oracle drift.
    val base = 1700000000L
    val ev = Seq(
      (1L, base), (1L, base + 1800L),
      (2L, base), (2L, base + 1801L)).toDF("user_id", "sec")
      .withColumn("t", col("sec").cast("timestamp"))
    val sess = ev.groupBy(col("user_id"), session_window(col("t"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_sessions"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sess === Map(1L -> 1L, 2L -> 2L))
  }

  test("st08: streamed final state equals the batch session_window recompute") {
    val streamed = AdAnalytics.st08SessionWindow(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = Tables.events(spark, sf)
      .withColumn("t", expr("timestamp_micros(ts div 1000)"))
      .groupBy(col("user_id"), session_window(col("t"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").cast("long"),
        col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("st11: streaming CMS grid is bounded and conserves every increment") {
    import graft.operators.Misc.{CmsRows, CmsWidth}
    val cells = AdAnalytics.st11CmsCells(spark, sf).collect()
    // state bound: at most d·w cells no matter how many distinct users
    assert(cells.length <= CmsRows * CmsWidth)
    assert(cells.map(r => (r.getLong(0), r.getLong(1))).distinct.length === cells.length)
    // conservation: every event increments exactly one cell in each row
    val total = Tables.events(spark, sf).count()
    val perRow = cells.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(perRow.keySet === (0L until CmsRows).toSet)
    perRow.foreach { case (j, s) => assert(s === total, s"row $j loses increments") }
  }

  test("ST9: watermark drops late data in append-mode windows") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Long] // event time as epoch seconds
    val agg = ms.toDF().toDF("sec")
      .withColumn("t", expr("timestamp_seconds(sec)"))
      .withWatermark("t", "5 minutes")
      .groupBy(window(col("t"), "10 minutes"))
      .count()
      .select(col("window.start").cast("long").as("ws"), col("count"))
    val qn = "graft_wm_test"
    val q = agg.writeStream.format("memory").queryName(qn)
      .outputMode("append")
      .option("checkpointLocation", ckpt()).start()
    ms.addData(600L, 1800L)  // watermark advances to 1800s - 5min = 1500s
    q.processAllAvailable()
    ms.addData(0L)           // LATE: window [0,600) closed at watermark 1500
    ms.addData(3600L)        // advances watermark, finalizing earlier windows
    q.processAllAvailable()
    ms.addData(7200L)        // flush finalized windows through append mode
    q.processAllAvailable()
    q.stop()
    val out = spark.table(qn).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.get(600L).contains(1L), s"on-time window missing: $out")
    assert(!out.contains(0L), s"late event's window must be dropped: $out")
  }

  test("bounded dedup drops in-horizon duplicates and expires keys past the watermark") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Long)] // (event_id, event time as epoch seconds)
    val in = ms.toDF().toDF("event_id", "sec")
      .withColumn("t", expr("timestamp_seconds(sec)"))
    val deduped = AdAnalytics.boundedDedup(in, "t", Seq("event_id"), "10 seconds")
    val qn = "graft_bounded_dedup_test"
    val q = deduped.select(col("event_id"), col("sec")).writeStream
      .format("memory").queryName(qn).outputMode("append")
      .option("checkpointLocation", ckpt()).start()
    ms.addData((1L, 0L), (1L, 5L), (2L, 3L)) // id=1 dup inside the horizon
    q.processAllAvailable()
    ms.addData((3L, 200L))                   // watermark → 190s; ids 1,2 expire
    q.processAllAvailable()
    ms.addData((1L, 195L))                   // same key AFTER expiry
    q.processAllAvailable()
    q.stop()
    val rows = spark.table(qn).collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    // exactly ONE of the two in-horizon id=1 duplicates survives (which
    // one is not ordered within a batch), plus the post-expiry re-emit
    assert(rows.count { case (id, sec) => id == 1L && sec < 100L } === 1,
      s"in-horizon duplicate must be dropped: $rows")
    assert(rows.contains(1L -> 195L), s"key 1 must re-emit after state expiry: $rows")
    assert(rows.contains(2L -> 3L) && rows.contains(3L -> 200L), s"$rows")
    spark.catalog.dropTempView(qn)
  }

  test("cumulative state with event-time TTL expires idle keys and restarts their counts") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Long)] // (user_id, event time as epoch seconds)
    val in = ms.toDF().toDF("user_id", "sec")
      .withColumn("t", expr("timestamp_seconds(sec)"))
      .withWatermark("t", "0 seconds")
      .select(col("user_id"), col("t")) // unchanged column keeps the watermark tag
      .as[(Long, java.sql.Timestamp)]
    val updates = AdAnalytics.cumulativeCountsWithTtl(in, ttlMillis = 10000L)
    val qn = "graft_ttl_state_test"
    val q = updates.writeStream.format("memory").queryName(qn)
      .outputMode("update")
      .option("checkpointLocation", ckpt()).start()
    ms.addData((1L, 100L), (1L, 102L), (2L, 101L)) // u1 count 2, u2 count 1
    q.processAllAvailable()
    ms.addData((2L, 1000L))  // u2 accumulates; watermark → 1000s after this batch
    q.processAllAvailable()
    ms.addData((3L, 2000L))  // timeout pass: u1 (last seen 102s) is idle > ttl → expires
    q.processAllAvailable()
    ms.addData((1L, 2001L))  // u1 returns AFTER expiry
    q.processAllAvailable()
    q.stop()
    val updatesSeen = spark.table(qn).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq
    // u1 reached 2, expired, then RESTARTED at 1 — never 3
    assert(updatesSeen.contains(1L -> 2L) && updatesSeen.contains(1L -> 1L),
      s"expected u1 to restart after TTL expiry: $updatesSeen")
    assert(!updatesSeen.contains(1L -> 3L), s"u1 state must not survive the TTL: $updatesSeen")
    // u2 stayed active across its two batches → cumulative 2
    assert(updatesSeen.contains(2L -> 2L), s"active key must accumulate: $updatesSeen")
    spark.catalog.dropTempView(qn)
  }

  test("TTL state: a group arriving entirely behind the watermark does not kill the query") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Long)] // (user_id, event time as epoch seconds)
    val in = ms.toDF().toDF("user_id", "sec")
      .withColumn("t", expr("timestamp_seconds(sec)"))
      .withWatermark("t", "0 seconds")
      .select(col("user_id"), col("t"))
      .as[(Long, java.sql.Timestamp)]
    val updates = AdAnalytics.cumulativeCountsWithTtl(in, ttlMillis = 10000L)
    val qn = "graft_ttl_late_group_test"
    val q = updates.writeStream.format("memory").queryName(qn)
      .outputMode("update")
      .option("checkpointLocation", ckpt()).start()
    ms.addData((1L, 2000L)) // watermark → 2000s
    q.processAllAvailable()
    // u9's only event is 1900s behind the watermark, so its natural
    // timeout (100s + ttl) would sit below the watermark —
    // setTimeoutTimestamp rejects that, which unclamped would kill the
    // query. Spark 4 drops the fully-late row before the state function
    // (observed; the clamp stays as defense-in-depth for the
    // mixed-batch case), so the pinned contract is: the query SURVIVES
    // and the late group simply produces no output.
    ms.addData((9L, 100L))
    q.processAllAvailable() // throws if the state function died
    ms.addData((1L, 2001L)) // query still live and accumulating
    q.processAllAvailable()
    q.stop()
    val seen = spark.table(qn).collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(!seen.exists(_._1 == 9L), s"fully-late group must be dropped: $seen")
    assert(seen.contains(1L -> 2L), s"query must survive the late batch: $seen")
    spark.catalog.dropTempView(qn)
  }

  test("sliding window: each event lands in exactly 4 window instances") {
    val total = Tables.events(spark, sf).count()
    val windowed = AdAnalytics.st02SlidingWindow(spark, sf)
    assert(windowed.agg(sum("n")).collect()(0).getLong(0) === total * 4)
  }

  test("ST2 depth: a NEW query resumes cumulative state from the same checkpoint") {
    // the reference's operational story is a restartable checkpointed
    // job (AdverStat.scala:71-73): stop the query, start a fresh one on
    // the SAME checkpoint, and keyed state must RESUME, not restart
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Long]
    val cp = ckpt()
    val latest = scala.collection.concurrent.TrieMap.empty[Long, Long]
    def cumulative = ms.toDS()
      .groupByKey(identity)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Long], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + it.size
          state.update(total)
          Iterator((uid, total))
      }.toDF("user_id", "total")
    // sink keeps the LATEST total per key — update-mode emissions are
    // cumulative snapshots, so a post-restart batch replay (offsets not
    // yet committed when the first query stopped) lands on the same value
    def start() = cumulative.writeStream.outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r => latest(r.getLong(0)) = r.getLong(1))
        ()
      }
      .option("checkpointLocation", cp).start()
    val q1 = start()
    ms.addData(1L, 1L, 2L)
    q1.processAllAvailable()
    ms.addData(1L)
    q1.processAllAvailable()
    q1.stop()
    val q2 = start() // NEW query object, same checkpoint
    ms.addData(1L, 2L)
    q2.processAllAvailable()
    ms.addData(3L)
    q2.processAllAvailable()
    q2.stop()
    // u1: 3 before the restart + 1 after = 4 — only if state resumed
    assert(latest.toMap === Map(1L -> 4L, 2L -> 2L, 3L -> 1L))
  }

  test("foreachBatch store lineage stays bounded across ~50 micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Long]
    val empty = Seq.empty[(Long, Long)].toDF("user_id", "n")
    val fold = new Streams.StoreFold(empty, (store, batch, _) => {
      val delta = batch.groupBy(col("value")).agg(count(lit(1)).as("n"))
        .toDF("user_id", "n")
      Upsert.accumulate(store, delta, Seq("user_id"), "n")
    })
    val q = ms.toDF().writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) => fold(batch, id) }
      .option("checkpointLocation", ckpt()).start()
    val nodeCounts = (1 to 50).map { i =>
      ms.addData(i.toLong % 7)
      q.processAllAvailable()
      fold.store.queryExecution.analyzed.collect { case n => n }.size
    }
    q.stop()
    // each merge stacks nodes on the previous store's plan (persist does
    // not truncate lineage); the periodic localCheckpoint resets it to a
    // leaf scan, so the count must CYCLE, not grow: the late window may
    // never exceed the first full cycle's peak
    val firstCyclePeak = nodeCounts.take(Streams.LineageCheckpointEvery * 2).max
    assert(nodeCounts.drop(30).max <= firstCyclePeak,
      s"store lineage grows without bound: $nodeCounts")
    // and the fold still computes the right totals
    val got = fold.store.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (1 to 50).map(_.toLong % 7).groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got === want)
  }

  test("persisted JDBC fold: a new run on the same checkpoint+store resumes; replays are skipped") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.operators.Misc
    val ms = MemoryStream[(String, Double)]
    val cp = ckpt()
    val url = "jdbc:derby:memory:graftst12db;create=true"
    val props = new java.util.Properties()
    val table = "st12_fold_store"
    def pinned(df: org.apache.spark.sql.DataFrame) =
      df.select(col("event_type"), col("n_events"),
        col("sum_value").cast("decimal(18,2)").as("sum_value"))
    val empty = pinned(Misc.eventRollup(
      Seq.empty[(String, Double)].toDF("event_type", "value")))
    def merge(store: org.apache.spark.sql.DataFrame,
              batch: org.apache.spark.sql.DataFrame) =
      pinned(Upsert.accumulateAll(store, Misc.eventRollup(batch),
        Seq("event_type"), Seq("n_events", "sum_value")))
    def run(src: MemoryStream[(String, Double)], checkpoint: String): Unit =
      Streams.runForeachBatchJdbc(spark, "append", empty, url, table, props, checkpoint)(
        _ => src.toDF().toDF("event_type", "value"))(merge)
    ms.addData(("click", 1.50), ("view", 2.25), ("click", 0.25))
    run(ms, cp) // run 1 folds the first chunk, store lands in Derby
    ms.addData(("click", 1.00), ("cart", 3.00))
    run(ms, cp) // run 2: NEW query, same checkpoint+store — must RESUME
    def readStore() = spark.read.jdbc(url, table, props).drop(Streams.BatchIdCol)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).toPlainString)).sorted.toSeq
    val afterResume = readStore()
    // equals the one-shot rollup over ALL events — a fold that restarted
    // from an empty store would read (click 1, cart 1) instead
    assert(afterResume ===
      Seq(("cart", 1L, "3.00"), ("click", 3L, "2.75"), ("view", 1L, "2.25")))
    // crash-replay simulation: a FRESH checkpoint re-delivers its data
    // as batch 0; the store's batch-id watermark marks 0 and 1 already
    // applied, so the replayed merges are skipped and nothing
    // double-counts (the foreachBatch batchId idempotence contract)
    val replay = MemoryStream[(String, Double)]
    replay.addData(("click", 99.0))
    run(replay, ckpt())
    assert(readStore() === afterResume, "replayed batch ids must not re-merge")
  }

  test("persisted JDBC fold: store-read failures abort the batch — only true table absence reads as first-batch") {
    val props = new java.util.Properties()
    val url = "jdbc:derby:memory:graftprobedb;create=true"
    // live connection + absent table → false (the legitimate first-batch case)
    assert(!Streams.jdbcTableExists(url, "no_such_table_probe", props))
    // connection-level failure (database not found — the transient-outage
    // analogue) must PROPAGATE, never read as absence: the old behavior
    // mapped it to existing=None and the overwrite then truncated the store
    intercept[java.sql.SQLException] {
      Streams.jdbcTableExists("jdbc:derby:memory:graftNoSuchDb", "t", props)
    }
    // and once the table exists, the probe sees it
    import spark.implicits._
    graft.etl.Sinks.jdbcOverwrite(
      Seq((1L, "a")).toDF("k", "v"), url, "probe_present", props)
    assert(Streams.jdbcTableExists(url, "probe_present", props))
  }

  test("retriedJdbc: transient SQLExceptions are retried with backoff, persistent ones propagate after the bound") {
    // fails twice then succeeds → the retry rides out the blip
    var calls = 0
    val got = Streams.retriedJdbc(attempts = 3, backoffMs = 1L) {
      calls += 1
      if (calls < 3) throw new java.sql.SQLTransientConnectionException("blip")
      42
    }
    assert(got === 42 && calls === 3)
    // never succeeds → the LAST failure propagates after `attempts` tries
    var always = 0
    val e = intercept[java.sql.SQLException] {
      Streams.retriedJdbc(attempts = 3, backoffMs = 1L) {
        always += 1
        throw new java.sql.SQLException(s"down $always")
      }
    }
    assert(always === 3 && e.getMessage === "down 3")
    // non-SQL failures are NOT retried — the bound is for the connection layer only
    var other = 0
    intercept[IllegalArgumentException] {
      Streams.retriedJdbc(attempts = 3, backoffMs = 1L) {
        other += 1; throw new IllegalArgumentException("bug")
      }
    }
    assert(other === 1)
  }

  test("st12's JDBC-persisted variant equals the in-memory fold over the same input") {
    val got = AdAnalytics.st12RunningRollupJdbc(spark, sf,
        "jdbc:derby:memory:graftst12fx;create=true", "st12_store_fx",
        new java.util.Properties(), ckpt())
      .collect().map(_.toString).sorted.toSeq
    val want = AdAnalytics.st12RunningRollup(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(got.nonEmpty && got === want)
  }

  test("statePartitions lever: identical results at 4 and 32, session conf restored") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    def rows() = AdAnalytics.st09StreamStreamJoin(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val atDefault = rows() // default lever = 4
    assert(spark.conf.get("spark.sql.shuffle.partitions") === before,
      "runner must restore the session shuffle-partition conf")
    spark.conf.set("spark.graft.streaming.statePartitions", "32")
    try assert(rows() === atDefault,
      "stream-stream join rows must not depend on the state-partition count")
    finally spark.conf.unset("spark.graft.streaming.statePartitions")
  }

  test("st13: every ascending micro-batch split reproduces d30's batch verdicts") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.jobs.IncrementalIndex
    val mod = graft.operators.LlmText.IncrementalBatchMod
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text", "lang", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    val corpusDf = docs.filter(_._1 % mod != 0).toSeq
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val arrivals = docs.filter(_._1 % mod == 0).sortBy(_._1).toSeq
    val expected = graft.operators.LlmText.d30IncrementalDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet

    def run(chunks: Seq[Seq[(Long, String, String, String, Long)]]): Set[(Long, Long, Boolean)] = {
      val indexDir = java.nio.file.Files.createTempDirectory("st13-spec-idx-").toString
      IncrementalIndex.writeTextIndex(spark, corpusDf, indexDir)
      val ms = MemoryStream[(Long, String, String, String, Long)]
      val got = scala.collection.mutable.Set.empty[(Long, Long, Boolean)]
      val q = ms.toDF().toDF("doc_id", "text", "lang", "source", "n_chars")
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          // probe BEFORE appending — the st13 ordering contract
          val v = IncrementalIndex.probeText(spark, batch, indexDir)
          IncrementalIndex.writeTextIndex(spark, batch, indexDir,
            org.apache.spark.sql.SaveMode.Append)
          got ++= v.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
          ()
        }
        .option("checkpointLocation", ckpt()).start()
      chunks.foreach { c => ms.addData(c: _*); q.processAllAvailable() }
      q.stop()
      got.toSet
    }

    assert(run(Seq(arrivals)) === expected, "single-batch stream diverged from d30")
    assert(run(arrivals.grouped(17).toSeq) === expected,
      "3-batch ascending split diverged from d30")
    assert(run(arrivals.grouped(7).toSeq) === expected,
      "8-batch ascending split diverged from d30")
  }

  test("st17: any micro-batch split in any order reproduces d18's batch verdicts") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.jobs.IncrementalIndex
    val mod = graft.operators.LlmText.ContaminationMod
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text", "lang", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    val benchDf = docs.filter(_._1 % mod == 0).toSeq
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val arrivals = docs.filter(_._1 % mod != 0).sortBy(_._1).toSeq
    val expected = graft.operators.LlmText.d18Contamination(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(expected.nonEmpty, "fixture must plant benchmark overlap")

    def run(chunks: Seq[Seq[(Long, String, String, String, Long)]]): Set[(Long, Long, Long)] = {
      val indexDir = java.nio.file.Files.createTempDirectory("st17-spec-idx-").toString
      IncrementalIndex.writeBenchIndex(spark, benchDf, indexDir)
      val ms = MemoryStream[(Long, String, String, String, Long)]
      val got = scala.collection.mutable.Set.empty[(Long, Long, Long)]
      val q = ms.toDF().toDF("doc_id", "text", "lang", "source", "n_chars")
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          got ++= IncrementalIndex.probeBench(spark, batch, indexDir).collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          ()
        }
        .option("checkpointLocation", ckpt()).start()
      chunks.foreach { c => ms.addData(c: _*); q.processAllAvailable() }
      q.stop()
      got.toSet
    }

    assert(run(Seq(arrivals)) === expected, "single-batch stream diverged from d18")
    assert(run(arrivals.grouped(31).toSeq) === expected,
      "multi-batch ascending split diverged from d18")
    // no cross-batch state ⇒ order must not matter — shuffle the chunks
    val shuffled = new scala.util.Random(7).shuffle(arrivals.grouped(23).toSeq)
    assert(run(shuffled) === expected, "shuffled split diverged from d18")
  }

  test("st23: the bloom-prefiltered probe keeps st17's any-split/any-order equivalence") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.functions.BloomFilter
    import graft.jobs.IncrementalIndex
    val mod = graft.operators.LlmText.ContaminationMod
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text", "lang", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    val benchDf = docs.filter(_._1 % mod == 0).toSeq
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val arrivals = docs.filter(_._1 % mod != 0).sortBy(_._1).toSeq
    val expected = graft.operators.LlmText.d18Contamination(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(expected.nonEmpty, "fixture must plant benchmark overlap")

    def run(chunks: Seq[Seq[(Long, String, String, String, Long)]]): Set[(Long, Long, Long)] = {
      val indexDir = java.nio.file.Files.createTempDirectory("st23-spec-idx-").toString
      IncrementalIndex.writeBenchIndex(spark, benchDf, indexDir)
      IncrementalIndex.writeBloomIndex(spark, benchDf, indexDir,
        BloomFilter.DefaultBits, BloomFilter.DefaultK)
      val ms = MemoryStream[(Long, String, String, String, Long)]
      val got = scala.collection.mutable.Set.empty[(Long, Long, Long)]
      val q = ms.toDF().toDF("doc_id", "text", "lang", "source", "n_chars")
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          got ++= IncrementalIndex.probeBenchBloom(spark, batch, indexDir).collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          ()
        }
        .option("checkpointLocation", ckpt()).start()
      chunks.foreach { c => ms.addData(c: _*); q.processAllAvailable() }
      q.stop()
      got.toSet
    }

    assert(run(arrivals.grouped(31).toSeq) === expected,
      "multi-batch ascending split diverged from d18")
    val shuffled = new scala.util.Random(11).shuffle(arrivals.grouped(23).toSeq)
    assert(run(shuffled) === expected, "shuffled split diverged from d18")
  }

  test("st16: every ascending micro-batch split reproduces the all-pairs phash verdicts") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.jobs.IncrementalIndex
    val mod = graft.operators.LlmText.IncrementalBatchMod
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text", "lang", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    val corpusDf = docs.filter(_._1 % mod != 0).toSeq
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val arrivals = docs.filter(_._1 % mod == 0).sortBy(_._1).toSeq
    // truth: all-pairs brute force over (history ∪ lower-id) partners —
    // exact because the banding is pigeonhole-complete at the radius
    def jvmPhash(t: String): Long = {
      val st = math.max(1, t.length / 64)
      var h = 0L
      for (j <- 0 until 64) {
        val pos = j * st
        if (pos < t.length && t.codePointAt(pos) % 2 == 1) h |= 1L << j
      }
      h
    }
    val hashes = docs.map(d => d._1 -> jvmPhash(d._2)).toMap
    val expected = arrivals.map { case (id, _, _, _, _) =>
      val n = docs.count { case (o, _, _, _, _) =>
        o != id && (o % mod != 0 || o < id) &&
          java.lang.Long.bitCount(hashes(o) ^ hashes(id)) <=
            graft.operators.Multimodal.PhashMaxHamming
      }
      (id, n.toLong, n > 0)
    }.toSet

    def run(chunks: Seq[Seq[(Long, String, String, String, Long)]]): Set[(Long, Long, Boolean)] = {
      val indexDir = java.nio.file.Files.createTempDirectory("st16-spec-idx-").toString
      IncrementalIndex.writeMediaIndex(spark, corpusDf, indexDir)
      val ms = MemoryStream[(Long, String, String, String, Long)]
      val got = scala.collection.mutable.Set.empty[(Long, Long, Boolean)]
      val q = ms.toDF().toDF("doc_id", "text", "lang", "source", "n_chars")
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val v = IncrementalIndex.probeMedia(spark, batch, indexDir)
          IncrementalIndex.writeMediaIndex(spark, batch, indexDir,
            org.apache.spark.sql.SaveMode.Append)
          got ++= v.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
          ()
        }
        .option("checkpointLocation", ckpt()).start()
      chunks.foreach { c => ms.addData(c: _*); q.processAllAvailable() }
      q.stop()
      got.toSet
    }

    assert(run(Seq(arrivals)) === expected, "single-batch stream diverged from brute force")
    assert(run(arrivals.grouped(13).toSeq) === expected,
      "4-batch ascending split diverged from brute force")
  }

  /** Non-hidden data files under a store dir → (path, size, mtime).
    * `_SUCCESS` markers are excluded: parquet append jobs rewrite them
    * at the root, which is metadata churn, not data rewrite. */
  private def storeFiles(dir: String): Map[String, (Long, Long)] = {
    val root = java.nio.file.Paths.get(dir)
    val it = java.nio.file.Files.walk(root)
    try it.iterator().asScala
      .filter(p => java.nio.file.Files.isRegularFile(p))
      .filterNot(p => p.getFileName.toString.startsWith("_") ||
        p.getFileName.toString.startsWith("."))
      .map(p => p.toString ->
        (java.nio.file.Files.size(p),
          java.nio.file.Files.getLastModifiedTime(p).toMillis))
      .toMap
    finally it.close()
  }

  test("st13: a restart on the same checkpoint + index dir resumes — no refold, no index rewrite") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.jobs.IncrementalIndex
    val mod = graft.operators.LlmText.IncrementalBatchMod
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text", "lang", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    val corpusDf = docs.filter(_._1 % mod != 0).toSeq
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val arrivals = docs.filter(_._1 % mod == 0).sortBy(_._1).toSeq
    val expected = graft.operators.LlmText.d30IncrementalDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val indexDir = java.nio.file.Files.createTempDirectory("st13-resume-idx-").toString
    IncrementalIndex.writeTextIndex(spark, corpusDf, indexDir)
    val cp = ckpt() // STABLE across both runs — the resume contract
    val ms = MemoryStream[(Long, String, String, String, Long)]
    def run(): Set[(Long, Long, Boolean)] = {
      val got = scala.collection.mutable.Set.empty[(Long, Long, Boolean)]
      val q = ms.toDF().toDF("doc_id", "text", "lang", "source", "n_chars")
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val v = IncrementalIndex.probeText(spark, batch, indexDir)
          IncrementalIndex.writeTextIndex(spark, batch, indexDir,
            org.apache.spark.sql.SaveMode.Append)
          got ++= v.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
          ()
        }
        .option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      got.toSet
    }
    // run 1: first chunk of arrivals lands in the store, then STOP
    val (chunkA, chunkB) = arrivals.splitAt(arrivals.length / 2)
    ms.addData(chunkA: _*)
    val gotA = run()
    assert(gotA.map(_._1) === chunkA.map(_._1).toSet,
      "run 1 must verdict exactly its own arrivals")
    val before = storeFiles(indexDir)
    // run 2: NEW query, same checkpoint + same (already-populated) index
    // dir — must process ONLY the remaining arrivals: nothing refolds,
    // nothing re-probes, and no already-written index file is touched
    ms.addData(chunkB: _*)
    val gotB = run()
    assert(gotB.map(_._1) === chunkB.map(_._1).toSet,
      "resume must probe only the un-processed arrivals")
    assert(gotA ++ gotB === expected,
      "the two runs' verdicts must equal the one-shot d30 recompute")
    val after = storeFiles(indexDir)
    before.foreach { case (path, stamp) =>
      assert(after.get(path).contains(stamp),
        s"resume rewrote an existing index file: $path")
    }
    assert(after.size > before.size, "run 2 must append its own index entries")
  }

  test("st21: any micro-batch split in ANY order reproduces e23's batch answers") {
    // the st17 contract class: the probe is a pure function of (batch,
    // frozen store) — no cross-batch state, no append-back — so any
    // split in any order must land the identical answer table
    import spark.implicits._
    import graft.jobs.IncrementalIndex
    val idx = java.nio.file.Files.createTempDirectory("st21-spec-idx-").toString
    val all = Tables.embeddings(spark, sf)
    IncrementalIndex.writeLshIndex(spark, all, idx)
    IncrementalIndex.writeGraphIndex(spark, all, idx)
    val queries = all.where(col("vec_id") % 5 === 0)
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2)))
    val shuffled = new scala.util.Random(13).shuffle(queries.toSeq)
    val chunks = shuffled.grouped(math.max(1, shuffled.length / 3 + 1)).toSeq
    val got = chunks.flatMap { chunk =>
      val batch = chunk.toDF("vec_id", "embedding", "label")
      IncrementalIndex.probeGraphServe(spark, batch, idx).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    }.toSet
    val expected = graft.operators.Embeddings.e23GraphServe(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(got === expected,
      "shuffled-split stored-store probes must equal the batch e23 answers")
  }

  /** Walks the cause chain for the poison marker — the streaming
    * wrapper buries the thrown exception a few levels deep. */
  private def hasPoison(t: Throwable): Boolean =
    t != null && (Option(t.getMessage).exists(_.contains("poison-after-append"))
      || hasPoison(t.getCause))

  test("st19: crash after an uncommitted append replays idempotently — store equals the one-shot build") {
    // the exactly-once-under-recovery property a deployment leans on:
    // foreachBatch commits offsets AFTER the callback, so a crash
    // between append and commit re-delivers the batch with the SAME id;
    // the bid-keyed partition overwrite absorbs the replay
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.jobs.IncrementalIndex
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text", "lang", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    val chunks = docs.grouped((docs.length + 2) / 3).toSeq
    val idx = java.nio.file.Files.createTempDirectory("st19-crash-idx-").toString
    val cp = ckpt() // STABLE across runs — recovery reads it
    val ms = MemoryStream[(Long, String, String, String, Long)]
    @volatile var poison = false
    def run(expectCrash: Boolean): Unit = {
      val q = ms.toDF().toDF("doc_id", "text", "lang", "source", "n_chars")
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
          IncrementalIndex.writeSubstrIndexBatch(spark, batch, idx, bid)
          // die AFTER the append, BEFORE the offset commit — the
          // crash window that makes naive appends duplicate
          if (poison && bid >= 1) throw new RuntimeException("poison-after-append")
          ()
        }
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      if (expectCrash) {
        val e = intercept[Exception] { q.awaitTermination() }
        assert(hasPoison(e), s"expected the poison crash, got $e")
        poison = false
      } else q.awaitTermination()
    }
    ms.addData(chunks(0): _*); run(expectCrash = false) // batch 0 commits
    poison = true
    ms.addData(chunks(1): _*); run(expectCrash = true) // batch 1 appended, then crash
    val crashed = storeFiles(idx).filter(_._1.contains("bid=1"))
    assert(crashed.nonEmpty, "the crashed run must have appended its partition")
    run(expectCrash = false) // recovery: batch 1 REPLAYED (same id)
    val replayed = storeFiles(idx).filter(_._1.contains("bid=1"))
    assert(replayed.nonEmpty && replayed != crashed,
      "recovery must rewrite the replayed batch's partition (offsets were uncommitted)")
    ms.addData(chunks(2): _*); run(expectCrash = false) // post-recovery ingest continues
    // the store equals the one-shot batch build: no duplicated postings
    // (a naive append would double batch 1's), none lost
    val oneShot = java.nio.file.Files.createTempDirectory("st19-crash-oneshot-").toString
    IncrementalIndex.writeSubstrIndex(spark, Tables.documents(spark, sf), oneShot)
    val pA = spark.read.parquet(s"$idx/${IncrementalIndex.RhPostings}").drop("bid")
    val pB = spark.read.parquet(s"$oneShot/${IncrementalIndex.RhPostings}")
    assert(pA.count() === pB.count(), "postings row count differs from the one-shot build")
    assert(pA.exceptAll(pB).isEmpty && pB.exceptAll(pA).isEmpty,
      "recovered store's postings differ from the one-shot build")
    // and the serving readout agrees with the memo-path query
    val spansGot = IncrementalIndex.probeSubstrSpans(spark, idx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val spansWant = graft.operators.LlmText.d44CrossdocSpans(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(spansGot === spansWant, "span readout diverged after crash recovery")
  }

  test("st13: crash-replayed batch re-probes the pre-crash store (exceptBid) and re-appends idempotently") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.jobs.IncrementalIndex
    val mod = graft.operators.LlmText.IncrementalBatchMod
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text", "lang", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    val corpusDf = docs.filter(_._1 % mod != 0).toSeq
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val arrivals = docs.filter(_._1 % mod == 0).sortBy(_._1).toSeq
    val chunks = arrivals.grouped((arrivals.length + 2) / 3).toSeq
    val expected = graft.operators.LlmText.d30IncrementalDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val idx = java.nio.file.Files.createTempDirectory("st13-crash-idx-").toString
    IncrementalIndex.writeTextIndexBatch(spark, corpusDf, idx, batchId = -1L)
    val cp = ckpt()
    val ms = MemoryStream[(Long, String, String, String, Long)]
    @volatile var poison = false
    val got = scala.collection.mutable.Set.empty[(Long, Long, Boolean)]
    var batch1Verdicts: Set[(Long, Long, Boolean)] = Set.empty
    var batch1Replayed: Set[(Long, Long, Boolean)] = Set.empty
    def run(expectCrash: Boolean): Unit = {
      val q = ms.toDF().toDF("doc_id", "text", "lang", "source", "n_chars")
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
          // exceptBid: on a replay the store ALREADY holds this batch's
          // crashed append — the probe must see the store as of the
          // last COMMITTED batch or every doc would self-match
          val v = IncrementalIndex.probeText(spark, batch, idx, exceptBid = Some(bid))
            .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
          IncrementalIndex.writeTextIndexBatch(spark, batch, idx, bid)
          if (bid == 1L) { if (poison) batch1Verdicts = v else batch1Replayed = v }
          got ++= v
          if (poison && bid >= 1) throw new RuntimeException("poison-after-append")
          ()
        }
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      if (expectCrash) {
        val e = intercept[Exception] { q.awaitTermination() }
        assert(hasPoison(e), s"expected the poison crash, got $e")
        poison = false
      } else q.awaitTermination()
    }
    ms.addData(chunks(0): _*); run(expectCrash = false)
    poison = true
    ms.addData(chunks(1): _*); run(expectCrash = true) // append landed, offsets did not
    run(expectCrash = false) // replay of batch 1
    ms.addData(chunks(2): _*); run(expectCrash = false)
    // the replayed probe must be VALUE-IDENTICAL to the crashed one —
    // at-least-once emission with identical values, which set-union
    // absorbs into exactly-once verdicts
    assert(batch1Verdicts.nonEmpty && batch1Replayed === batch1Verdicts,
      "replayed batch's verdicts diverged from the original probe")
    assert(got.toSet === expected,
      "post-recovery verdicts must equal the one-shot d30 recompute")
    // and the index store equals the one-shot build (bands/shingles are
    // per-doc pure functions, so one write over all docs is the batch-
    // composition-free reference)
    val oneShot = java.nio.file.Files.createTempDirectory("st13-crash-oneshot-").toString
    IncrementalIndex.writeTextIndex(spark, Tables.documents(spark, sf), oneShot)
    for (t <- Seq(IncrementalIndex.TextBands, IncrementalIndex.TextShingles)) {
      val a = spark.read.parquet(s"$idx/$t").drop("bid")
      val b = spark.read.parquet(s"$oneShot/$t")
      assert(a.count() === b.count(), s"$t row count differs from one-shot")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"$t rows differ from the one-shot build")
    }
  }

  test("st13: watermark compaction between batches keeps the ingest exactly-once and the store bounded") {
    // the small-files lifecycle under a LIVE ingest: compact committed
    // bid partitions at a watermark between micro-batches, then keep
    // ingesting — including a crash-replay AFTER the compaction, whose
    // exceptBid probe must still see exactly the pre-crash store (the
    // compacted segment's bid can never collide with a real batch id)
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.jobs.IncrementalIndex
    val mod = graft.operators.LlmText.IncrementalBatchMod
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text", "lang", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    val corpusDf = docs.filter(_._1 % mod != 0).toSeq
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val arrivals = docs.filter(_._1 % mod == 0).sortBy(_._1).toSeq
    val chunks = arrivals.grouped((arrivals.length + 2) / 3).toSeq
    val expected = graft.operators.LlmText.d30IncrementalDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val idx = java.nio.file.Files.createTempDirectory("st13-compact-idx-").toString
    IncrementalIndex.writeTextIndexBatch(spark, corpusDf, idx, batchId = -1L)
    val cp = ckpt()
    val ms = MemoryStream[(Long, String, String, String, Long)]
    @volatile var poison = false
    val got = scala.collection.mutable.Set.empty[(Long, Long, Boolean)]
    def run(expectCrash: Boolean): Unit = {
      val q = ms.toDF().toDF("doc_id", "text", "lang", "source", "n_chars")
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
          val v = IncrementalIndex.probeText(spark, batch, idx, exceptBid = Some(bid))
            .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
          IncrementalIndex.writeTextIndexBatch(spark, batch, idx, bid)
          got ++= v
          if (poison && bid >= 1) throw new RuntimeException("poison-after-append")
          ()
        }
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      if (expectCrash) {
        val e = intercept[Exception] { q.awaitTermination() }
        assert(hasPoison(e), s"expected the poison crash, got $e")
        poison = false
      } else q.awaitTermination()
    }
    def bidDirsOf(table: String): Set[Long] =
      new java.io.File(s"$idx/$table").listFiles().filter(_.isDirectory)
        .map(_.getName).filter(_.startsWith("bid="))
        .map(_.stripPrefix("bid=").toLong).toSet
    ms.addData(chunks(0): _*); run(expectCrash = false) // batch 0 commits
    // the maintenance event between batches: bootstrap + batch 0
    // collapse to one segment — the store's directory count is now
    // bounded by (1 + batches-since-watermark), not total batches ever
    IncrementalIndex.compactTextIndex(spark, idx, upToBid = 0L)
    assert(bidDirsOf(IncrementalIndex.TextBands) ===
      Set(IncrementalIndex.compactedBid(0L)),
      "after compaction the store must hold exactly the one segment")
    // crash-replay ACROSS the compaction boundary: batch 1 appends,
    // dies before its offsets commit, then replays with the same id —
    // its exceptBid probe reads the compacted segment + nothing of its
    // own crashed append
    poison = true
    ms.addData(chunks(1): _*); run(expectCrash = true)
    run(expectCrash = false) // replay of batch 1
    ms.addData(chunks(2): _*); run(expectCrash = false)
    assert(got.toSet === expected,
      "verdicts across a compaction + crash-replay must equal the one-shot d30 recompute")
    assert(bidDirsOf(IncrementalIndex.TextBands) ===
      Set(IncrementalIndex.compactedBid(0L), 1L, 2L))
    // and the store's ROWS are exactly the one-shot build's
    val oneShot = java.nio.file.Files.createTempDirectory("st13-compact-oneshot-").toString
    IncrementalIndex.writeTextIndex(spark, Tables.documents(spark, sf), oneShot)
    for (t <- Seq(IncrementalIndex.TextBands, IncrementalIndex.TextShingles)) {
      val a = spark.read.parquet(s"$idx/$t").drop("bid")
      val b = spark.read.parquet(s"$oneShot/$t")
      assert(a.count() === b.count(), s"$t row count differs from one-shot")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"$t rows differ from the one-shot build after compaction")
    }
  }

  test("st22: any ascending split + a crash-replay reproduces the one-shot insert edges") {
    // the online-insert contract: each arrival's edge list is a pure
    // function of (itself, the earlier-id set, the frozen bootstrap
    // graph), so the final edge table must equal the single-batch
    // recompute for ANY ascending split — including a batch that
    // appended, crashed before its offsets committed, and replayed
    // (exceptBid hides its own crashed bucket append)
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.jobs.IncrementalIndex
    val modE = graft.operators.Embeddings.IncrementalBatchModE
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2)))
    val corpusDf = vecs.filter(_._1 % modE != 0).toSeq
      .toDF("vec_id", "embedding", "label")
    val arrivals = vecs.filter(_._1 % modE == 0).sortBy(_._1).toSeq
    val chunks = arrivals.grouped((arrivals.length + 2) / 3).toSeq
    // one-shot reference: a fresh store, all arrivals in ONE probe
    val oneIdx = java.nio.file.Files.createTempDirectory("st22-oneshot-").toString
    IncrementalIndex.writeLshIndexBatch(spark, corpusDf, oneIdx, batchId = -1L)
    IncrementalIndex.writeGraphBootstrapBatch(spark, corpusDf, oneIdx)
    val expected = IncrementalIndex.probeGraphInsert(spark,
        arrivals.toDF("vec_id", "embedding", "label"), oneIdx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    // streamed: three batches, batch 1 crashes after its appends
    val idx = java.nio.file.Files.createTempDirectory("st22-crash-idx-").toString
    IncrementalIndex.writeLshIndexBatch(spark, corpusDf, idx, batchId = -1L)
    IncrementalIndex.writeGraphBootstrapBatch(spark, corpusDf, idx)
    val cp = ckpt()
    val ms = MemoryStream[(Long, Seq[Float], Int)]
    @volatile var poison = false
    val got = scala.collection.mutable.Set.empty[(Long, Long, Int)]
    def run(expectCrash: Boolean): Unit = {
      val q = ms.toDF().toDF("vec_id", "embedding", "label")
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
          val edges = IncrementalIndex.probeGraphInsert(spark, batch, idx,
            exceptBid = Some(bid))
          IncrementalIndex.writeLshIndexBatch(spark, batch, idx, bid)
          IncrementalIndex.writeGraphEdgesBatch(spark, edges, idx, bid)
          got ++= edges.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
          if (poison && bid >= 1) throw new RuntimeException("poison-after-append")
          ()
        }
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      if (expectCrash) {
        val e = intercept[Exception] { q.awaitTermination() }
        assert(hasPoison(e), s"expected the poison crash, got $e")
        poison = false
      } else q.awaitTermination()
    }
    ms.addData(chunks(0): _*); run(expectCrash = false)
    poison = true
    ms.addData(chunks(1): _*); run(expectCrash = true) // appends landed, offsets did not
    run(expectCrash = false) // replay of batch 1
    ms.addData(chunks(2): _*); run(expectCrash = false)
    assert(got.toSet === expected,
      "streamed insert edges diverged from the one-shot recompute")
    // and the stored edge table equals the emitted union (bootstrap
    // partition aside) — what later serving reads
    val storedEdges = spark.read.parquet(s"$idx/${IncrementalIndex.GraphEdges}")
      .where(col("bid") >= 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(storedEdges === expected, "stored edges diverged from the emitted union")
  }

  test("st24: any retraction split + a crash-replay reproduces the batch e24 serve") {
    // tombstones are a SET: the union of the bid partitions equals the
    // full retraction set for any split in any order, application is an
    // anti-join duplicates cannot perturb, and a crash-replayed batch
    // overwrites its own bid partition — so the drained readout must be
    // row-identical to the in-JVM batch form (e24) however the stream
    // delivered the deletes
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.jobs.IncrementalIndex
    import graft.operators.Embeddings
    val expected = Embeddings.e24TombstoneServe(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val idx = java.nio.file.Files.createTempDirectory("st24-crash-idx-").toString
    val vecs = Tables.embeddings(spark, sf)
    IncrementalIndex.writeLshIndex(spark, vecs, idx)
    IncrementalIndex.writeGraphIndex(spark, vecs, idx)
    val dels = vecs
      .where(col("vec_id") % Embeddings.VecTombMod === Embeddings.VecTombRem)
      .select("vec_id").collect().map(_.getLong(0)).sorted
    // deliver out of ascending order: retraction order must not matter
    val chunks = dels.reverse.grouped((dels.length + 2) / 3).toSeq
    val cp = ckpt()
    val ms = MemoryStream[Long]
    @volatile var poison = false
    def run(expectCrash: Boolean): Unit = {
      val q = ms.toDF().toDF("vec_id")
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
          IncrementalIndex.writeVecTombstonesBatch(spark, batch, idx, bid)
          if (poison && bid >= 1) throw new RuntimeException("poison-after-append")
          ()
        }
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      if (expectCrash) {
        val e = intercept[Exception] { q.awaitTermination() }
        assert(hasPoison(e), s"expected the poison crash, got $e")
        poison = false
      } else q.awaitTermination()
    }
    ms.addData(chunks(0): _*); run(expectCrash = false)
    poison = true
    ms.addData(chunks(1): _*); run(expectCrash = true) // append landed, offsets did not
    run(expectCrash = false) // replay of batch 1 overwrites bid=1
    ms.addData(chunks(2): _*); run(expectCrash = false)
    // stored retraction set = the delivered set, no replay duplicates
    val stored = spark.read
      .parquet(s"$idx/${IncrementalIndex.VecTombstones}")
    assert(stored.count() === dels.length.toLong,
      "crash-replay duplicated tombstone rows — bid overwrite failed")
    assert(stored.select("vec_id").collect().map(_.getLong(0)).sorted
      .sameElements(dels), "stored retraction ids differ from the delivered set")
    val got = IncrementalIndex.probeGraphServeLive(spark, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(got === expected,
      "streamed-retraction serve diverged from the batch e24 form")
  }

  test("st25: bridge + crash-replay reproduce the one-shot clusters; rebase folds the merge log") {
    // constructed corpus exercising every path of the union-find-as-log
    // design: P-family docs where arrival E (id 10) BRIDGES the
    // bootstrap component {3,11} with the bootstrap singleton 7 (the
    // merge event that appends a remap row), a second arrival wave
    // where 30 matches the PREVIOUS batch's unmatched arrival 20 (the
    // previously-singleton store-doc labeling path) and 40 re-attaches
    // to the merged component, plus an untouched corpus doc 13 that
    // must stay absent (d14's singleton exclusion)
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.jobs.IncrementalIndex
    val p = (0 until 18).map(i => s"w$i").mkString(" ")   // 16 word-trigrams
    val bTxt = s"$p bxa bxb bxc"                          // jacc(E,B)=16/19≈.84 ≥ .8
    val dTxt = s"$p dya dyb dyc"                          // jacc(B,D)=16/22≈.73 < .8
    val u2 = (0 until 18).map(i => s"u$i").mkString(" ")
    def row(id: Long, t: String) = (id, t, "en", "t", t.length.toLong)
    val corpus = Seq(row(3, bTxt), row(7, dTxt), row(11, bTxt), row(13,
      (0 until 18).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val arrivals = Seq(row(10, p), row(20, u2), row(30, u2), row(40, p))
    // one-shot reference: bootstrap over everything at once
    val oneIdx = java.nio.file.Files.createTempDirectory("st25-oneshot-").toString
    IncrementalIndex.writeClusterBootstrap(spark,
      corpus.unionByName(arrivals.toDF("doc_id", "text", "lang", "source", "n_chars")), oneIdx)
    val expected = IncrementalIndex.resolveClusterLabels(spark, oneIdx)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected === Set((3L, 3L), (7L, 3L), (10L, 3L), (11L, 3L), (40L, 3L),
      (20L, 20L), (30L, 20L)),
      "the constructed corpus must produce the designed components")
    // streamed: two ascending batches, batch 1 crashes after its appends
    val idx = java.nio.file.Files.createTempDirectory("st25-crash-idx-").toString
    IncrementalIndex.writeClusterBootstrap(spark, corpus, idx)
    val cp = ckpt()
    val ms = MemoryStream[(Long, String, String, String, Long)]
    @volatile var poison = false
    def run(expectCrash: Boolean): Unit = {
      val q = ms.toDF().toDF("doc_id", "text", "lang", "source", "n_chars")
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
          IncrementalIndex.applyClusterBatch(spark, batch, idx, bid)
          if (poison && bid >= 1) throw new RuntimeException("poison-after-append")
          ()
        }
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      if (expectCrash) {
        val e = intercept[Exception] { q.awaitTermination() }
        assert(hasPoison(e), s"expected the poison crash, got $e")
        poison = false
      } else q.awaitTermination()
    }
    ms.addData(arrivals.take(2): _*); run(expectCrash = false) // 10 bridges, 20 floats
    poison = true
    ms.addData(arrivals.drop(2): _*); run(expectCrash = true)  // appends landed, offsets did not
    run(expectCrash = false)                                   // replay of batch 1
    val got = IncrementalIndex.resolveClusterLabels(spark, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected, "streamed labels diverged from the one-shot clustering")
    // the bridge REALLY happened: label 7 lost to 3 via a merge-event row
    val remaps = spark.read.parquet(s"$idx/${IncrementalIndex.LabelRemaps}")
    assert(remaps.where(col("src") === 7 && col("dst") === 3).count() === 1L,
      "expected exactly one 7→3 merge event in the remap log")
    // rebase: readout unchanged, merge log reset, label partitions folded
    IncrementalIndex.rebaseClusterLabels(spark, idx, upToBid = 1L)
    val rebased = IncrementalIndex.resolveClusterLabels(spark, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rebased === expected, "rebase changed the readout")
    assert(spark.read.parquet(s"$idx/${IncrementalIndex.LabelRemaps}").isEmpty,
      "rebase must fold the merge log flat")
    def labDirs(): Set[String] = new java.io.File(s"$idx/${IncrementalIndex.ClusterLabels}")
      .listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(labDirs() === Set(s"bid=${IncrementalIndex.compactedBid(1L)}"),
      s"rebase must leave one consolidated label segment, got ${labDirs()}")
    // crash window: a rebase that committed its segment (_SUCCESS) but
    // died before the deletes leaves an original beside it; the
    // documented recovery is to RE-RUN the same rebase, which sees the
    // marker, skips the rewrite, and finishes the deletes
    val seg = s"$idx/${IncrementalIndex.ClusterLabels}/bid=${IncrementalIndex.compactedBid(1L)}"
    spark.read.parquet(seg).limit(2)
      .write.parquet(s"$idx/${IncrementalIndex.ClusterLabels}/bid=0")
    IncrementalIndex.rebaseClusterLabels(spark, idx, upToBid = 1L)
    assert(labDirs() === Set(s"bid=${IncrementalIndex.compactedBid(1L)}"),
      "re-running the rebase must finish the crashed deletes")
    val resumed = IncrementalIndex.resolveClusterLabels(spark, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(resumed === expected, "resumed rebase changed the readout")
  }

  test("st14: a restart on the same checkpoint + index dir resumes — no refold, no index rewrite") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.jobs.IncrementalIndex
    val mod = graft.operators.Embeddings.IncrementalBatchModE
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2)))
    val corpusDf = vecs.filter(_._1 % mod != 0).toSeq
      .toDF("vec_id", "embedding", "label")
    val arrivals = vecs.filter(_._1 % mod == 0).sortBy(_._1).toSeq
    val expected = graft.operators.Embeddings.e09IncrementalSemDedup(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    val indexDir = java.nio.file.Files.createTempDirectory("st14-resume-idx-").toString
    IncrementalIndex.writeCellIndex(spark, corpusDf, indexDir,
      centroidTrain = Some(Tables.embeddings(spark, sf)))
    val cp = ckpt()
    val ms = MemoryStream[(Long, Seq[Float], Int)]
    def run(): Set[(Int, Long, Long, Boolean)] = {
      val got = scala.collection.mutable.Set.empty[(Int, Long, Long, Boolean)]
      val q = ms.toDF().toDF("vec_id", "embedding", "label")
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val v = IncrementalIndex.probeCells(spark, batch, indexDir)
          IncrementalIndex.appendCellMembers(spark, batch, indexDir,
            org.apache.spark.sql.SaveMode.Append)
          got ++= v.collect().map(r =>
            (r.getInt(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
          ()
        }
        .option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      got.toSet
    }
    val (chunkA, chunkB) = arrivals.splitAt(arrivals.length / 2)
    ms.addData(chunkA: _*)
    val gotA = run()
    assert(gotA.map(_._2) === chunkA.map(_._1).toSet,
      "run 1 must verdict exactly its own arrivals")
    val before = storeFiles(indexDir)
    ms.addData(chunkB: _*)
    val gotB = run()
    assert(gotB.map(_._2) === chunkB.map(_._1).toSet,
      "resume must probe only the un-processed arrivals")
    assert(gotA ++ gotB === expected,
      "the two runs' verdicts must equal the one-shot e09 recompute")
    val after = storeFiles(indexDir)
    before.foreach { case (path, stamp) =>
      assert(after.get(path).contains(stamp),
        s"resume rewrote an existing index file: $path")
    }
    assert(after.size > before.size, "run 2 must append its own member rows")
  }

  test("st15: every micro-batch split lands the same frozen-quantizer codes as the batch encode") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.jobs.IncrementalIndex
    import graft.operators.Embeddings
    val mod = Embeddings.IncrementalBatchModE
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2)))
    val histDf = vecs.filter(_._1 % mod != 0).toSeq.toDF("vec_id", "embedding", "label")
    val arrivals = vecs.filter(_._1 % mod == 0).sortBy(_._1).toSeq
    // expected: one-shot encode of the arrivals against the history-trained quantizer
    def snapshot(indexDir: String): Map[Long, Seq[Long]] =
      spark.read.parquet(s"$indexDir/${IncrementalIndex.SqCodes}")
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap

    def run(chunks: Seq[Seq[(Long, Seq[Float], Int)]]): Map[Long, Seq[Long]] = {
      val indexDir = java.nio.file.Files.createTempDirectory("st15-spec-idx-").toString
      IncrementalIndex.writeSqIndex(spark, histDf, histDf, indexDir)
      val ms = MemoryStream[(Long, Seq[Float], Int)]
      val q = ms.toDF().toDF("vec_id", "embedding", "label")
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          IncrementalIndex.encodeSqMembers(spark, batch, indexDir); ()
        }
        .option("checkpointLocation", ckpt()).start()
      chunks.foreach { c => ms.addData(c: _*); q.processAllAvailable() }
      q.stop()
      snapshot(indexDir)
    }

    val single = run(Seq(arrivals))
    assert(single.size === vecs.length, "store = history + every arrival, each encoded once")
    val split = run(arrivals.grouped(13).toSeq)
    assert(split === single,
      "a 4-batch split must land byte-identical codes (per-row encode, frozen quantizer)")
    // frozen-quantizer contract: history rows keep the codes the build wrote
    val buildDir = java.nio.file.Files.createTempDirectory("st15-spec-build-").toString
    IncrementalIndex.writeSqIndex(spark, histDf, histDf, buildDir)
    val buildCodes = snapshot(buildDir)
    buildCodes.foreach { case (id, c) => assert(single(id) === c,
      s"history vec $id re-coded differently after ingest") }
  }

  test("st14: every ascending micro-batch split reproduces e09's batch verdicts") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.jobs.IncrementalIndex
    val mod = graft.operators.Embeddings.IncrementalBatchModE
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2)))
    val corpusDf = vecs.filter(_._1 % mod != 0).toSeq
      .toDF("vec_id", "embedding", "label")
    val arrivals = vecs.filter(_._1 % mod == 0).sortBy(_._1).toSeq
    val expected = graft.operators.Embeddings.e09IncrementalSemDedup(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet

    def run(chunks: Seq[Seq[(Long, Seq[Float], Int)]]): Set[(Int, Long, Long, Boolean)] = {
      val indexDir = java.nio.file.Files.createTempDirectory("st14-spec-idx-").toString
      IncrementalIndex.writeCellIndex(spark, corpusDf, indexDir,
        centroidTrain = Some(Tables.embeddings(spark, sf)))
      val ms = MemoryStream[(Long, Seq[Float], Int)]
      val got = scala.collection.mutable.Set.empty[(Int, Long, Long, Boolean)]
      val q = ms.toDF().toDF("vec_id", "embedding", "label")
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val v = IncrementalIndex.probeCells(spark, batch, indexDir)
          IncrementalIndex.appendCellMembers(spark, batch, indexDir,
            org.apache.spark.sql.SaveMode.Append)
          got ++= v.collect().map(r =>
            (r.getInt(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
          ()
        }
        .option("checkpointLocation", ckpt()).start()
      chunks.foreach { c => ms.addData(c: _*); q.processAllAvailable() }
      q.stop()
      got.toSet
    }

    assert(run(Seq(arrivals)) === expected, "single-batch stream diverged from e09")
    assert(run(arrivals.grouped(13).toSeq) === expected,
      "4-batch ascending split diverged from e09")
  }
}
