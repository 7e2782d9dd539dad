package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates the per-module operator inventories; every entry has a
  * matching DuckDB oracle unless the operator is not SQL-expressible.
  */
object SparkEntry {
  private def modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (operators.Relational.queries, operators.Relational.oracleSql),
      (operators.Sessions.queries, operators.Sessions.oracleSql),
      (operators.Categories.queries, operators.Categories.oracleSql),
      (operators.LlmText.queries, operators.LlmText.oracleSql),
      (operators.Embeddings.queries, operators.Embeddings.oracleSql),
      (streaming.AdAnalytics.queries, streaming.AdAnalytics.oracleSql),
      (operators.Misc.queries, operators.Misc.oracleSql),
      (operators.Multimodal.queries, operators.Multimodal.oracleSql))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The AreaTop3 composite (需求6) exercises local-collection dim,
    * broadcast join, composite agg with distinct group-concat, ranking
    * window, and CASE tiering in one plan.
    *
    * `entry` receives a CALLER-built session, so the shared runtime conf
    * every graft entry point needs ([[jobs.Jobs.configure]] — single
    * source, per round-8 ADVICE) is applied here — runtime-settable SQL
    * confs, set once at the entry point (not hidden inside a reader). */
  def entry(spark: SparkSession): DataFrame = {
    jobs.Jobs.configure(spark)
    operators.Categories.c07AreaTop3(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.flatMap(_._1).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.iterator.flatMap(_._2).toMap
}
