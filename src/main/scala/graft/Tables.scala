package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-provided parquet tables (TESTDATA.md).
  *
  * Every reader is a plain parquet scan so Catalyst predicate pushdown /
  * column pruning apply to whatever the caller chains on top — at 100 TB
  * these tables would be partitioned (lineitem by l_shipdate month, orders
  * by o_orderdate month, events by date) and the same code would get
  * dynamic partition pruning for free; nothing here assumes single-file
  * inputs.
  */
object Tables {
  private def p(dir: String, name: String): String = s"$dir/$name.parquet"

  def region(s: SparkSession, dir: String): DataFrame   = s.read.parquet(p(dir, "region"))
  def nation(s: SparkSession, dir: String): DataFrame   = s.read.parquet(p(dir, "nation"))
  def customer(s: SparkSession, dir: String): DataFrame = s.read.parquet(p(dir, "customer"))
  def supplier(s: SparkSession, dir: String): DataFrame = s.read.parquet(p(dir, "supplier"))
  def part(s: SparkSession, dir: String): DataFrame     = s.read.parquet(p(dir, "part"))
  def orders(s: SparkSession, dir: String): DataFrame   = s.read.parquet(p(dir, "orders"))
  def lineitem(s: SparkSession, dir: String): DataFrame = s.read.parquet(p(dir, "lineitem"))
  def documents(s: SparkSession, dir: String): DataFrame = s.read.parquet(p(dir, "documents"))
  def embeddings(s: SparkSession, dir: String): DataFrame = s.read.parquet(p(dir, "embeddings"))

  /** `events.ts` — engine-internal contract: LongType epoch NANOS.
    *
    * The fixture's physical type has shifted between driver generations
    * (TIMESTAMP(NANOS) through round 7, TIMESTAMP(MICROS) from round 8),
    * so this reader is the single choke point that normalizes whatever
    * is on disk back to the internal contract:
    *
    *  - physical INT64 / TIMESTAMP(NANOS) read under
    *    `spark.sql.legacy.parquet.nanosAsLong=true` → already LongType
    *    epoch nanos → pass through;
    *  - physical TIMESTAMP(MICROS/MILLIS) → TimestampType (sessions set
    *    `inferTimestampNTZ.enabled=false` + UTC via [[jobs.Jobs.configure]])
    *    → `unix_micros(ts) * 1000` = the stored micros ×1000, bit-exact
    *    with the DuckDB oracle's `epoch_ns(ts)` on the same file.
    *
    * Downstream code (sessionization, windows, the oracle SQL) is unaware
    * of the physical type. The conf trio is deliberately NOT set here:
    * mutating session conf from inside a reader is order-dependent global
    * state; entry points call `Jobs.configure` instead. Pinned for BOTH
    * physical variants in TablesSpec.
    */
  def events(s: SparkSession, dir: String): DataFrame =
    normalizeTs(s.read.parquet(p(dir, "events")))

  /** Normalize a `ts` column to LongType epoch nanos whatever the read
    * type was. A pure projection, so it composes with batch AND streaming
    * frames (Streams.tableStream routes through it too — the streaming
    * file source sees the same physical schema). No-op when `ts` is
    * absent or already Long. */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case None | Some(LongType) => df
      case Some(TimestampType) =>
        df.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      case Some(TimestampNTZType) =>
        // NTZ→TZ cast applies the session time zone; graft sessions pin
        // UTC, making the cast a micros-identity (the same wall-clock
        // DuckDB reads via epoch_ns on the tz-less file).
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case Some(other) =>
        throw new IllegalStateException(
          s"ts: unsupported physical type $other — expected LongType (nanos) or Timestamp(NTZ)Type")
    }
  }

  /** Catalog-table input surface (S1: the reference reads Hive-managed
    * tables — `session/src/main/scala/SessionStat.scala:701-710`; here
    * the same contract is an EXTERNAL parquet table registered in the
    * session catalog and read back via `spark.table`). The catalog scan
    * resolves to the same parquet relation as the path read, so
    * PushedFilters / ReadSchema / partition pruning are identical
    * (pinned in CatalogSpec). Drop-and-recreate keeps the registered
    * location current when one session switches fixture dirs — both are
    * metadata-only operations. At 100 TB this is the metastore entry a
    * warehouse would own; `etl/Sinks.saveAsTable` is the write side of
    * the same surface.
    */
  def catalogTable(s: SparkSession, dir: String, name: String): DataFrame = {
    val tbl = s"${name}_cat"
    s.sql(s"DROP TABLE IF EXISTS $tbl")
    s.catalog.createTable(tbl, p(dir, name), "parquet")
    s.table(tbl)
  }

  /** Round-robin repartition ONLY when the input yields fewer partitions
    * than the session parallelism. The per-row pipelines (LlmText hash
    * work, Embeddings pairwise stages) read single-file fixtures locally
    * — one input split would serialize every map stage — but at 100 TB
    * the scan already has thousands of splits and an unconditional
    * round-robin would be a full extra shuffle of the table for nothing.
    *
    * The partition count comes from the planned RDD (metadata only, no
    * job runs) — but building that plan costs ~0.2-0.5 s per call, a
    * measurable tax when every query in a suite re-reads the same
    * table. The keyed overload memoizes the narrow/wide DECISION per
    * (source, parallelism): sound because the fixture files are
    * immutable within a JVM; a mutated source would need the cache
    * cleared. */
  private val narrowCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  def spreadIfNarrow(df: DataFrame): DataFrame = spread(df, None)

  def spreadIfNarrow(df: DataFrame, cacheKey: String): DataFrame =
    spread(df, Some(cacheKey))

  private def spread(df: DataFrame, key: Option[String]): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    def probe: java.lang.Boolean = df.queryExecution.toRdd.getNumPartitions < target
    val narrow = key match {
      case Some(k) => narrowCache.computeIfAbsent(s"$k@$target", _ => probe)
      case None    => probe
    }
    if (narrow) df.repartition(target) else df
  }

  /** events + derived time columns shared by the session / ad suites.
    * All derivations are integer arithmetic on epoch nanos so they are
    * bit-identical to the oracle's `epoch_ns`-based expressions.
    */
  def eventsEnriched(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .withColumn("sec", expr("ts div 1000000000"))
      .withColumn("t", expr("timestamp_micros(ts div 1000)"))
      .withColumn("date", date_format(col("t"), "yyyy-MM-dd"))
      .withColumn("hour", hour(col("t")))
}
