package graft.streaming

import java.nio.file.Files
import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Structured-Streaming plumbing shared by the ad-analytics suite
  * (SURVEY ST1–ST9). Streams are file-source reads over the driver
  * parquet fixtures run with `Trigger.AvailableNow` — deterministic and
  * offline, which is what makes streaming results oracle-checkable: the
  * final state of an AvailableNow run over a static input equals the
  * batch aggregate over the same input. Kafka would swap in via
  * `readStream.format("kafka")` with the identical downstream plan
  * (SURVEY S5); unit tests use MemoryStream for multi-batch behavior.
  */
object Streams {

  case class EventRow(event_id: Long, ts: Long, user_id: Long,
                      event_type: String, value: Double, props: String)

  /** Kafka source surface (SURVEY S5: AdverStat.scala:33-49 — the
    * reference's `commerce-consumer-group` direct stream of ad-log text
    * lines). Downstream plans are identical to the file-source path:
    * parse with `split` (st01) and aggregate. NOT exercisable in this
    * environment (no Kafka jars / broker, zero egress) — calling start()
    * would fail to load the provider; the method documents the swap-in. */
  def kafkaLines(s: SparkSession, brokers: String, topic: String): DataFrame =
    s.readStream.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topic)
      .option("startingOffsets", "latest")
      .load()
      .selectExpr("CAST(value AS STRING) AS value")

  /** Streaming read of a driver parquet table (schema inferred from a
    * batch read of the same file — file streams require explicit schema).
    * The file-stream source only accepts directories; the fixture is a
    * single parquet FILE, so it is exposed through a symlink in a temp
    * directory (no data copied). The symlink dir is cached per
    * (dir, name) — Bench runs every streaming query twice per
    * invocation, and un-cached this leaked a temp dir per call. */
  private val streamDirs =
    new java.util.concurrent.ConcurrentHashMap[String, java.nio.file.Path]()

  def tableStream(s: SparkSession, dir: String, name: String): DataFrame = {
    val src = java.nio.file.Paths.get(s"$dir/$name.parquet")
    val d = streamDirs.computeIfAbsent(s"$dir/$name", _ => {
      val t = Files.createTempDirectory(s"graft-stream-$name-")
      Files.createSymbolicLink(t.resolve(s"$name.parquet"), src)
      t
    })
    val schema = s.read.parquet(src.toString).schema
    // same ts contract as the batch reader: LongType epoch nanos,
    // whatever the fixture's physical timestamp type (Tables.normalizeTs
    // is a pure projection, legal on a streaming frame)
    graft.Tables.normalizeTs(s.readStream.schema(schema).parquet(d.toString))
  }

  private def ckpt(): String =
    Files.createTempDirectory("graft-ckpt-").toString

  /** Best-effort recursive delete of a finished query's checkpoint —
    * session-lifetime accumulation otherwise (one dir per run). */
  private def dropDir(path: String): Unit = {
    val root = java.nio.file.Paths.get(path)
    if (Files.exists(root)) {
      val it = Files.walk(root).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      try it.forEach(p => { Files.deleteIfExists(p); () })
      finally it.close()
    }
  }

  private def freshName(): String =
    "graft_mem_" + UUID.randomUUID().toString.replace("-", "")

  /** Stateful-partition lever shared by every streaming runner. A
    * stateful operator materializes one state store PER shuffle
    * partition per operator (a stream-stream join keeps four: two per
    * side), and each store pays a per-micro-batch delta-file commit
    * regardless of how many rows it holds. At local[32] with 32 shuffle
    * partitions that fixed toll dominates: st09 measured 8.0 s at 32
    * partitions vs 3.0 s at 4 on sf0.1 (floor ~2.9 s = scan + micro-batch
    * cost; 1 partition is NOT faster — the join work re-serializes).
    * Default 4 fits the single-node harness; on a real cluster set
    * `spark.graft.streaming.statePartitions` to a small multiple of the
    * executor count so state shards spread while stores stay coarse.
    * Results are partition-count independent (deterministic aggregates /
    * joins) — only the store count changes.
    *
    * The override is scoped to a PER-QUERY CHILD SESSION (`newSession`:
    * same SparkContext and shared state, isolated SQL conf + catalog)
    * instead of a set/restore window on the caller's session conf — a
    * concurrent batch query or second streaming runner on the shared
    * session raced on that window and could plan with (or restore to)
    * the wrong partition count. Runners therefore BUILD the streaming
    * frame against the child session (the builder-lambda signature):
    * the conf a streaming query reads at start is the one of the
    * session its frame was resolved on, so handing over an already-
    * built frame would re-smuggle the parent conf in. */
  private def streamSession(s: SparkSession): SparkSession = {
    val child = s.newSession()
    // newSession inherits builder-time options but NOT runtime-set conf
    // (tests and jobs set graft levers at runtime) — copy those over.
    // Static confs throw on set and are already shared via the context.
    s.conf.getAll.foreach { case (k, v) =>
      try child.conf.set(k, v) catch { case _: Exception => () }
    }
    child.conf.set("spark.sql.shuffle.partitions",
      s.conf.getOption("spark.graft.streaming.statePartitions").getOrElse("4"))
    child
  }

  /** Run an AvailableNow streaming aggregation to completion into a
    * complete-mode in-memory sink (ST1 trigger + ST2 checkpoint) and
    * return the final table. `build` receives the per-query child
    * session (see [[streamSession]]) and must construct the WHOLE
    * streaming frame — sources and any static join sides — against it.
    * The result is localCheckpoint-ed (final states are small
    * aggregates) so the memory-sink temp view and the checkpoint dir
    * can be dropped immediately instead of accumulating for the
    * session lifetime. */
  def runComplete(s: SparkSession)(build: SparkSession => DataFrame): DataFrame =
    runToMemorySink(s, "complete")(build)

  /** Append-mode twin of [[runComplete]] — for operators that only
    * support append output (stream-stream joins, watermark-finalized
    * aggregations). Same materialize-then-drop resource story. */
  def runAppend(s: SparkSession)(build: SparkSession => DataFrame): DataFrame =
    runToMemorySink(s, "append")(build)

  private def runToMemorySink(
      s: SparkSession, outputMode: String)(
      build: SparkSession => DataFrame): DataFrame = {
    val qn = freshName()
    val cp = ckpt()
    val child = streamSession(s)
    val q = build(child).writeStream
      .format("memory").queryName(qn)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", cp)
      .start()
    q.awaitTermination()
    // the memory sink registers its table on the session that started
    // the query — the child — so read it back from there
    val result = child.table(qn).localCheckpoint(eager = true)
    child.catalog.dropTempView(qn)
    dropDir(cp)
    result
  }

  /** Fold micro-batches into a running store with BOUNDED lineage.
    * Each batch's merge is materialized before the callback returns (a
    * batch frame must not escape its `foreachBatch` invocation
    * unmaterialized); every [[LineageCheckpointEvery]]-th batch swaps
    * the persist for a `localCheckpoint`, truncating the union/
    * anti-join chain the merges build up — persist alone does NOT cut
    * lineage, so a 24/7 deployment would otherwise pay analysis and
    * planning cost linear in the total batch count (the same fix
    * `starComponentsWithRounds` applies to its per-round edge frames;
    * a cluster deployment would use reliable checkpoints). Bounded-
    * plan-depth behavior is pinned in StreamingSpec over ~50 batches. */
  val LineageCheckpointEvery = 10

  private[graft] final class StoreFold(
      initialStore: DataFrame,
      merge: (DataFrame, DataFrame, Long) => DataFrame,
      checkpointEvery: Int = LineageCheckpointEvery) {
    private var batches = 0
    @volatile private[graft] var store: DataFrame = initialStore

    def apply(batch: DataFrame, id: Long): Unit = synchronized {
      batches += 1
      val mergedRaw = merge(store, batch, id)
      val merged =
        if (batches % checkpointEvery == 0) mergedRaw.localCheckpoint(eager = true)
        else { val m = mergedRaw.persist(); m.count(); m }
      // safe to release the previous store: the new one is fully
      // materialized above, so nothing recomputes through the old chain
      if (store ne initialStore) store.unpersist()
      store = merged
    }
  }

  /** Marker column the PERSISTED fold stamps on every store row: the id
    * of the last batch merged in. foreachBatch may re-deliver the final
    * uncommitted batch after a restart (offsets commit AFTER the batch
    * callback returns), and an accumulate merge is not idempotent — a
    * replayed batch with id ≤ the stored maximum is skipped wholesale,
    * which makes the merge effectively exactly-once across restarts. */
  val BatchIdCol = "__batch_id"

  /** Bounded retry with exponential backoff for transient JDBC
    * connection failures (round-8 verdict hardening): `attempts` tries
    * total, sleeping `backoffMs * 2^i` between them. Retries ONLY on
    * `SQLException` — the connection layer's failure type — and
    * rethrows the last failure once exhausted, preserving the
    * fail-fast contract ([[jdbcTableExists]]'s truncation safety)
    * while riding out a briefly-unavailable database. */
  private[graft] def retriedJdbc[T](
      attempts: Int = 3, backoffMs: Long = 200L)(op: => T): T = {
    var i = 0
    while (true) {
      try return op
      catch {
        case e: java.sql.SQLException =>
          i += 1
          if (i >= attempts) throw e
          Thread.sleep(backoffMs << (i - 1))
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Dialect-agnostic JDBC table-existence probe (the JdbcUtils
    * .tableExists shape): a zero-row SELECT against the table. ONLY a
    * failure of that statement reads as "absent" — a connection-level
    * failure (broken network, auth, timeout) throws out of
    * `getConnection` and propagates (after [[retriedJdbc]]'s bounded
    * backoff absorbs transient blips), which is what keeps
    * [[runForeachBatchJdbc]] from mistaking a real outage for a
    * first batch and truncating the accumulated store. */
  private[graft] def jdbcTableExists(
      url: String, table: String, props: java.util.Properties): Boolean = {
    val conn = retriedJdbc()(java.sql.DriverManager.getConnection(url, props))
    try {
      val stmt = conn.createStatement()
      try { stmt.executeQuery(s"SELECT 1 FROM $table WHERE 1=0"); true }
      catch { case _: java.sql.SQLException => false }
      finally stmt.close()
    } finally conn.close()
  }

  /** [[runForeachBatch]] with the running store PERSISTED to a JDBC
    * table instead of held in session memory — the reference's
    * operational contract (adversStat/src/main/scala/AdverStat.scala:
    * 262-284: every micro-batch's aggregate lands in MySQL), which is
    * what makes the fold RESTARTABLE: the store survives in the
    * database, the checkpoint replays only unprocessed source data, and
    * a new query on the same (checkpoint, store) pair resumes instead
    * of restarting (pinned in StreamingSpec). Each batch reads the
    * store table, merges via one of the [[graft.etl.Upsert]] semantics,
    * and overwrites the table with the materialized result — at scale
    * the same merge is a `MERGE INTO` against a transactional table;
    * the per-batch store read/write here is the plain-JDBC analogue,
    * costed at |store| + |delta| per batch, history never re-read.
    * `checkpoint` is caller-owned: it must be STABLE across restarts
    * (a fresh temp dir per run would replay the whole source). */
  def runForeachBatchJdbc(
      s: SparkSession,
      outputMode: String,
      emptyStore: DataFrame,
      url: String, table: String, props: java.util.Properties,
      checkpoint: String)(
      build: SparkSession => DataFrame)(
      merge: (DataFrame, DataFrame) => DataFrame): Unit = {
    import org.apache.spark.sql.functions.{col, lit, max}
    val child = streamSession(s)
    val q = build(child).writeStream
      .outputMode(outputMode)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // absence is detected SPECIFICALLY (metadata probe) — any other
        // failure, including on the read itself, aborts the batch so a
        // transient JDBC outage can never read as "first batch" and
        // wipe the store through the overwrite below
        val existing =
          if (jdbcTableExists(url, table, props))
            Some(child.read.jdbc(url, table, props))
          else None
        val lastApplied = existing.flatMap { df =>
          val r = df.agg(max(col(BatchIdCol))).collect()(0)
          if (r.isNullAt(0)) None else Some(r.getLong(0))
        }
        if (!lastApplied.exists(_ >= batchId)) {
          val store = existing.map(_.drop(BatchIdCol)).getOrElse(emptyStore)
          val merged = merge(store, batch)
            .withColumn(BatchIdCol, lit(batchId))
            .localCheckpoint(true) // the plan reads the table we overwrite
          graft.etl.Sinks.jdbcOverwrite(merged, url, table, props)
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .start()
    q.awaitTermination()
  }

  /** Run an AvailableNow stream through `foreachBatch`, folding each
    * micro-batch into a running store DataFrame via `merge` (one of the
    * [[graft.etl.Upsert]] semantics) with [[StoreFold]]'s bounded-
    * lineage materialization. Returns the final store. */
  def runForeachBatch(
      s: SparkSession,
      outputMode: String,
      initialStore: DataFrame)(
      build: SparkSession => DataFrame)(
      merge: (DataFrame, DataFrame) => DataFrame): DataFrame =
    runForeachBatchWithId(s, outputMode, initialStore)(build)(
      (store, batch, _) => merge(store, batch))

  /** [[runForeachBatch]] exposing the micro-batch id to the merge —
    * what a crash-safe parquet ingest keys its idempotent appends on
    * (offsets commit AFTER the callback, so a replayed batch arrives
    * with the SAME id and an id-keyed partition overwrite makes the
    * store exactly-once under recovery; [[graft.jobs.IncrementalIndex
    * .writeTextIndexBatch]] / `writeSubstrIndexBatch`, crash-resume
    * pinned in StreamingSpec). */
  def runForeachBatchWithId(
      s: SparkSession,
      outputMode: String,
      initialStore: DataFrame)(
      build: SparkSession => DataFrame)(
      merge: (DataFrame, DataFrame, Long) => DataFrame): DataFrame = {
    val fold = new StoreFold(initialStore, merge)
    val cp = ckpt()
    val child = streamSession(s)
    val q = build(child).writeStream
      .outputMode(outputMode)
      .foreachBatch { (batch: DataFrame, id: Long) => fold(batch, id) }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", cp)
      .start()
    q.awaitTermination()
    dropDir(cp)
    fold.store
  }
}
