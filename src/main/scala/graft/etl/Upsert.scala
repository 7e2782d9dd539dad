package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's three JDBC upsert semantics (SURVEY S8:
  * adversStat/src/main/scala/JdbcHelper.scala:124 accumulate, :230/:360
  * overwrite, :283-309 delete+insert), re-expressed as pure DataFrame
  * merges so they compose with `foreachBatch` against any store. The
  * semantics are the capability; MySQL was incidental. At scale each of
  * these is a `MERGE INTO` against a transactional table format — the
  * row-level semantics below are exactly what that MERGE would encode,
  * and the unit suite pins how the three diverge on the same input.
  */
object Upsert {

  /** Insert-or-accumulate (ad_user_click_count): new keys insert, existing
    * keys ADD the incoming value. Union + re-aggregate — one shuffle on
    * the key, no row-by-row lookups. Single-column case of
    * [[accumulateAll]] (one source of truth for the merge shape). */
  def accumulate(store: DataFrame, batch: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    accumulateAll(store, batch, keys, Seq(valueCol))

  /** [[accumulate]] over several value columns at once — the shape a
    * multi-metric rollup store (count + sum + ...) merges with. Same
    * one-shuffle union + re-aggregate; every column must be a mergeable
    * (associative, commutative) aggregate for store⊕delta ≡ recompute. */
  def accumulateAll(store: DataFrame, batch: DataFrame, keys: Seq[String],
      valueCols: Seq[String]): DataFrame = {
    val aggs = valueCols.map(c => sum(col(c)).as(c))
    store.unionByName(batch)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Insert-or-overwrite (ad_stat / ad_click_trend): incoming rows replace
    * same-key rows wholesale. Anti-join out the stale rows, append the
    * batch. */
  def overwrite(store: DataFrame, batch: DataFrame, keys: Seq[String]): DataFrame =
    store.join(batch.select(keys.map(col): _*).distinct(), keys, "left_anti")
      .unionByName(batch)

  /** Delete-then-insert (ad_province_top3): every PARTITION key present in
    * the batch is fully deleted first — rows of that partition absent from
    * the batch disappear (unlike [[overwrite]], which only replaces
    * matching full keys). */
  def deleteInsert(store: DataFrame, batch: DataFrame, partitionKeys: Seq[String]): DataFrame =
    store.join(batch.select(partitionKeys.map(col): _*).distinct(), partitionKeys, "left_anti")
      .unionByName(batch)
}
