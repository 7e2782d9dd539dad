package graft.etl

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Output surfaces (SURVEY S6/S7/S9/S11): JDBC append, managed-table
  * write, streaming file sink, console sink. The reference appends every
  * result to MySQL (6 call sites, e.g. SessionStat.scala:508-514) and
  * overwrites Hive tables from the mock loader (MockDataGenerate.scala:
  * 147-150); tests exercise these against embedded Derby / a temp
  * warehouse — the sink code is identical against any JDBC url or
  * catalog. Upsert-flavored sinks live in [[Upsert]] (composed inside
  * `foreachBatch`).
  */
object Sinks {

  /** Append rows to a JDBC table (S7). Partition-parallel: each task
    * opens one connection and writes its partition — the driver never
    * materializes the result. */
  def jdbcAppend(df: DataFrame, url: String, table: String,
                 props: Properties = new Properties()): Unit =
    df.write.mode(SaveMode.Append).jdbc(url, table, props)

  /** Overwrite a JDBC table wholesale — the store side of a persisted
    * foreachBatch fold ([[graft.streaming.Streams.runForeachBatchJdbc]]).
    * String columns are declared `VARCHAR(varcharWidth)` at creation
    * (Spark's default mapping makes them LOBs on several dialects — not
    * comparable, not indexable; same fix as the jobs layer's keyed
    * appends) UNLESS the caller already supplies
    * `createTableColumnTypes` in `props`, which always wins. CONTRACT:
    * string values longer than `varcharWidth` (default 1024) fail or
    * truncate dialect-dependently — widen the parameter or pass your
    * own column types for wide-text stores. `df` must be MATERIALIZED
    * (checkpointed/collected lineage) if its plan reads the same
    * table — overwrite truncates before writing, so an unmaterialized
    * self-referential plan would consume its own truncation. */
  def jdbcOverwrite(df: DataFrame, url: String, table: String,
                    props: Properties = new Properties(),
                    varcharWidth: Int = 1024): Unit = {
    val p2 = new Properties()
    p2.putAll(props)
    val varchars = df.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.StringType)
      .map(f => s"${f.name} VARCHAR($varcharWidth)").mkString(", ")
    if (varchars.nonEmpty && !p2.containsKey("createTableColumnTypes"))
      p2.setProperty("createTableColumnTypes", varchars)
    df.write.mode(SaveMode.Overwrite).jdbc(url, table, p2)
  }

  /** Drop `name` AND its managed-table location. Overwrite-mode
    * saveAsTable replaces a TABLE but refuses an orphaned LOCATION
    * (LOCATION_ALREADY_EXISTS) — with the in-memory catalog, a previous
    * JVM's warehouse directory survives while its catalog entry doesn't,
    * so a fresh session must clear both before re-creating. */
  private def dropTableAndLocation(df: DataFrame, name: String): Unit = {
    val s = df.sparkSession
    s.sql(s"DROP TABLE IF EXISTS $name")
    val loc = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"), name.toLowerCase)
    val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  /** Overwrite a managed catalog table (S9: DROP + saveAsTable). */
  def saveTable(df: DataFrame, name: String): Unit = {
    dropTableAndLocation(df, name)
    df.write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(name)
  }

  /** Streaming parquet file sink (S6 producer analog): append-mode
    * exactly-once file output with checkpointed offsets. */
  def streamToParquet(df: DataFrame, path: String, checkpoint: String): StreamingQuery =
    df.writeStream.format("parquet")
      .outputMode("append")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Date-partitioned parquet write — the 100 TB layout: every batch
    * table partitioned by its date key so date-range queries get
    * dynamic partition pruning for free (scans touch only matching
    * directories; `PartitionFilters` in the read plan, pinned by
    * SinksSpec). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)

  /** Small-file COMPACTION — the maintenance pass every streaming sink
    * and per-batch append layout eventually needs: micro-batches and
    * daily appends leave directories of tiny files, and at 100 TB the
    * scan cost becomes namenode listing + a task per file instead of
    * bytes. Rewrites `path` into ~`targetFileBytes` outputs:
    *
    *  - unpartitioned: file count from the LIVE byte size (ceil of
    *    bytes/target, never 0), laid out by round-robin `repartition(n)`
    *    — no keyed shuffle, no sort, no skew;
    *  - partitioned (`partitionCols` non-empty): rows shuffle on the
    *    partition key so each directory is rewritten by the tasks that
    *    hold its rows (normally ONE file per directory — the streaming-
    *    sink rescue), with `maxRecordsPerFile` bounding any oversized
    *    directory instead of emitting one giant file. Pruning survives
    *    because the directory layout is identical.
    *
    * The rewrite stages through a `.compact-tmp` sibling (Spark cannot
    * overwrite a path it reads) and swaps by renaming the ORIGINAL
    * aside first (`.compact-old`), renaming the rewrite into place,
    * then deleting the old copy — the no-data window is one rename, and
    * a crash mid-swap leaves a recoverable copy under one of the two
    * sibling names instead of silently losing the directory; a
    * lakehouse deployment would make the same swap a table-format
    * transaction (rewrite-data-files) instead. */
  def compact(s: SparkSession, path: String,
              targetFileBytes: Long = 128L << 20,
              partitionCols: Seq[String] = Nil,
              maxRecordsPerFile: Long = 0L): Unit = {
    require(targetFileBytes > 0, s"targetFileBytes must be positive: $targetFileBytes")
    val src = new org.apache.hadoop.fs.Path(path)
    val fs = src.getFileSystem(s.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(src).getLength
    val tmp = new org.apache.hadoop.fs.Path(path + ".compact-tmp")
    val df = s.read.parquet(path)
    val writer =
      if (partitionCols.isEmpty) {
        val n = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
        df.repartition(n).write
      } else {
        df.repartition(partitionCols.map(col): _*).write
          .option("maxRecordsPerFile", maxRecordsPerFile)
          .partitionBy(partitionCols: _*)
      }
    writer.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val old = new org.apache.hadoop.fs.Path(path + ".compact-old")
    if (fs.exists(old)) fs.delete(old, true) // leftover from a prior crash
    require(fs.rename(src, old), s"compaction could not move $path aside")
    require(fs.rename(tmp, src), s"compaction could not swap $tmp into $path")
    require(fs.delete(old, true), s"compaction could not remove $old")
  }

  /** Bucketed managed table (the co-located-join layout): rows are
    * hash-bucketed AND sorted by the join key at write time, so a join
    * of two tables bucketed the same way needs NO shuffle and NO sort at
    * read time — the 100 TB answer for a fact⋈fact join that runs every
    * day: pay the partitioning once at ingest, never per query
    * (SinksSpec pins the exchange-free join plan). */
  def writeBucketed(df: DataFrame, name: String, bucketCol: String, buckets: Int): Unit = {
    dropTableAndLocation(df, name)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(name)
  }

  /** Console sink (S11 — dev only, like the reference's foreachRDD
    * println at AdverStat.scala:88). */
  def streamToConsole(df: DataFrame, checkpoint: String): StreamingQuery =
    df.writeStream.format("console")
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}
