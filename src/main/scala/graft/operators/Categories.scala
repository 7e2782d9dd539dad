package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Category-ranking spine + page-flow conversion (SURVEY 需求3/需求5):
  * the explode-CSV → per-key counts move (A3), the distinct-spine +
  * 3× left-join + coalesce-to-zero shape (J4), the secondary-sort top-10
  * (T1), and the lead()-paired conversion rate (T3) — reference:
  * session/src/main/scala/SessionStat.scala:164-312,
  * pageState/src/main/scala/PageOneStepConvertRate.scala:85-135.
  *
  * Scale notes: the spine and each count leg shuffle on the category key
  * once; the three left joins co-partition on that same key so AQE reuses
  * the exchange. The top-10 is TakeOrderedAndProject (k rows per partition
  * to the driver). The one-pass `sum(when(...))` alternative (half the
  * shuffles) is what a fresh design would use — the 3-join shape is kept
  * deliberately because it IS the reference operator under test.
  */
object Categories {

  /** Per-order CSV id-list (built from lineitem, mirroring the reference's
    * order_category_ids strings) — then explode(split(...)) back to rows
    * and count per key: the A3 CSV-explode operator, full round trip. */
  def c01ExplodeCsv(s: SparkSession, dir: String): DataFrame = {
    val csv = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(concat_ws(",", sort_array(collect_list(col("l_partkey").cast("string")))).as("partkey_csv"))
    csv
      .select(col("l_orderkey"), explode(split(col("partkey_csv"), ",")).as("pk"))
      .select(col("pk").cast("bigint").as("partkey"))
      .groupBy(col("partkey"))
      .agg(count(lit(1)).as("n_lines"))
  }

  val c01Sql: String =
    """WITH csv AS (
      |  SELECT l_orderkey,
      |    array_to_string(list_sort(list(CAST(l_partkey AS VARCHAR))), ',') AS partkey_csv
      |  FROM lineitem GROUP BY l_orderkey
      |)
      |SELECT CAST(pk AS BIGINT) AS partkey, count(*) AS n_lines
      |FROM (SELECT unnest(string_split(partkey_csv, ',')) AS pk FROM csv)
      |GROUP BY 1""".stripMargin

  /** The click/order/pay count spine on events: distinct key spine from
    * three event classes, per-class counts, 3× left join + coalesce(0).
    * Keys are the props.k JSON field (P6). */
  def spine(s: SparkSession, dir: String): DataFrame =
    spineFrom(Sessions.enriched(s, dir))

  /** [[spine]] over an arbitrary enriched frame (the job composition
    * point — the frame may already carry the task-param filter). */
  def spineFrom(ev0: DataFrame): DataFrame = {
    val ev = ev0.where(col("k").isNotNull)
    def leg(tpe: String, as: String): DataFrame =
      ev.where(col("event_type") === tpe)
        .groupBy(col("k")).agg(count(lit(1)).as(as))
    val keys = ev.where(col("event_type").isin("click", "view", "purchase"))
      .select(col("k")).distinct()
    keys
      .join(leg("click", "click_count"), Seq("k"), "left")
      .join(leg("view", "view_count"), Seq("k"), "left")
      .join(leg("purchase", "purchase_count"), Seq("k"), "left")
      .select(
        col("k"),
        coalesce(col("click_count"), lit(0L)).as("click_count"),
        coalesce(col("view_count"), lit(0L)).as("view_count"),
        coalesce(col("purchase_count"), lit(0L)).as("purchase_count"))
  }

  private val spineSql: String =
    """WITH ev AS (
      |  SELECT event_type, TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |  FROM events
      |  WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
      |), keys AS (
      |  SELECT DISTINCT k FROM ev WHERE event_type IN ('click','view','purchase')
      |), cl AS (SELECT k, count(*) AS c FROM ev WHERE event_type='click' GROUP BY k),
      |   vw AS (SELECT k, count(*) AS c FROM ev WHERE event_type='view' GROUP BY k),
      |   pu AS (SELECT k, count(*) AS c FROM ev WHERE event_type='purchase' GROUP BY k),
      |spine AS (
      |  SELECT keys.k,
      |    coalesce(cl.c, 0) AS click_count,
      |    coalesce(vw.c, 0) AS view_count,
      |    coalesce(pu.c, 0) AS purchase_count
      |  FROM keys LEFT JOIN cl ON keys.k = cl.k
      |            LEFT JOIN vw ON keys.k = vw.k
      |            LEFT JOIN pu ON keys.k = pu.k
      |)""".stripMargin

  def c02SpineCounts(s: SparkSession, dir: String): DataFrame = spine(s, dir)

  val c02Sql: String = s"$spineSql SELECT * FROM spine"

  /** Top-10 categories with the reference's multi-column secondary sort
    * (click desc, view desc, purchase desc) + unique tie-break — planned
    * as TakeOrderedAndProject, not a global sort. */
  def c03Top10(s: SparkSession, dir: String): DataFrame =
    top10From(Sessions.enriched(s, dir))

  def top10From(ev: DataFrame): DataFrame =
    spineFrom(ev)
      .orderBy(col("click_count").desc, col("view_count").desc,
        col("purchase_count").desc, col("k").asc)
      .limit(10)

  val c03Sql: String =
    s"""$spineSql
       |SELECT * FROM spine
       |ORDER BY click_count DESC, view_count DESC, purchase_count DESC, k ASC
       |LIMIT 10""".stripMargin

  /** Page-flow single-step conversion rate: pair each event with the next
    * event in its session (lead over the session timeline), count pairs,
    * divide by the count of the starting event type. The rate is a
    * division of two exact integers — IEEE-identical across engines. */
  def c04PageConvert(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("session_id")).orderBy(col("ts").asc, col("event_id").asc)
    val paired = Sessions.sessionized(s, dir)
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
    val pairs = paired.where(col("next_type").isNotNull)
      .groupBy(col("event_type"), col("next_type"))
      .agg(count(lit(1)).as("n_pairs"))
    val starts = paired
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_starts"))
    pairs.join(starts, Seq("event_type"))
      .select(
        concat(col("event_type"), lit("->"), col("next_type")).as("pair"),
        col("n_pairs"), col("n_starts"),
        (col("n_pairs").cast("double") / col("n_starts").cast("double")).as("rate"))
  }

  val c04Sql: String =
    s"""${sessPrefix}, paired AS (
       |  SELECT event_type,
       |    lead(event_type, 1) OVER (PARTITION BY session_id ORDER BY ns, event_id) AS next_type
       |  FROM sess
       |), pairs AS (
       |  SELECT event_type, next_type, count(*) AS n_pairs
       |  FROM paired WHERE next_type IS NOT NULL GROUP BY 1, 2
       |), starts AS (
       |  SELECT event_type, count(*) AS n_starts FROM paired GROUP BY 1
       |)
       |SELECT pairs.event_type || '->' || next_type AS pair, n_pairs, n_starts,
       |  CAST(n_pairs AS DOUBLE) / CAST(n_starts AS DOUBLE) AS rate
       |FROM pairs JOIN starts ON pairs.event_type = starts.event_type""".stripMargin

  /** The reference's packed-string output (PageSplitConvertRate:
    * "1_2=0.97|2_3=..."): rates rounded via round(n*100/m)/100 then
    * rendered through DECIMAL(10,2) so both engines format identically. */
  def c05ConvertPacked(s: SparkSession, dir: String): DataFrame =
    c04PageConvert(s, dir)
      .select(concat(
        col("pair"), lit("="),
        (round(col("n_pairs") * 100.0 / col("n_starts")) / 100.0)
          .cast("decimal(10,2)").cast("string")).as("kv"))
      .agg(concat_ws("|", array_sort(collect_list(col("kv")))).as("convert_rate"))

  val c05Sql: String =
    s"""WITH inner_q AS ($c04Sql)
       |SELECT coalesce(string_agg(kv, '|' ORDER BY kv), '') AS convert_rate
       |FROM (
       |  SELECT pair || '=' || CAST(CAST(round(n_pairs * 100.0 / n_starts) / 100.0 AS DECIMAL(10,2)) AS VARCHAR) AS kv
       |  FROM inner_q)""".stripMargin

  private def sessPrefix: String = Sessions.sessSql

  /** 需求5's PARAMETERIZED page-flow route — the reference's actual
    * parameterization (PageOneStepConvertRate.scala:85-94: the task
    * param `targetPageFlow` is an ORDERED page sequence "1,2,3,4,5,6,7",
    * converted pairwise along the configured route). c04/c05 cover
    * adjacent-pair rates over ALL type pairs and s09 a fixed 3-step
    * funnel; this operator converts along whatever route the task params
    * carry: rate_i = count(step_i pair) / count(step_{i-1} pair), with
    * the route head's raw event count as the step-0 denominator (the
    * reference's startPagePv).
    *
    * Shape at scale: one session-keyed window for the adjacent pairing
    * (shared with c04), then a broadcast join against the ROUTE-length
    * step dim — a route step is counted independently even when the
    * same (from, to) pair repeats at two positions, exactly as the
    * reference counts it. The rate chaining runs on a route-length
    * frame (a global-order window over ≤ #steps rows — driver-scale by
    * construction, not a data-scale sort). */
  val FlowParam = "targetPageFlow"
  val DefaultFlow = "view,click,view,purchase"

  def c08FlowConvert(s: SparkSession, dir: String): DataFrame =
    flowConvertFrom(s, Sessions.sessionized(s, dir),
      graft.functions.TaskParams(Map(FlowParam -> DefaultFlow)))

  def flowConvertFrom(s: SparkSession, sess: DataFrame,
                      p: graft.functions.TaskParams): DataFrame = {
    import s.implicits._
    val route = p.getSeq(FlowParam).getOrElse(DefaultFlow.split(",").toSeq)
    require(route.size >= 2, s"$FlowParam must list at least two steps, got $route")
    val steps = route.init.zip(route.tail).zipWithIndex
      .map { case ((from, to), i) => (i + 1, from, to) }
    val stepDim = steps.toDF("step", "from_type", "to_type")
    val w = Window.partitionBy(col("session_id")).orderBy(col("ts").asc, col("event_id").asc)
    val paired = sess.withColumn("next_type", lead(col("event_type"), 1).over(w))
    val stepCounts = paired.where(col("next_type").isNotNull)
      .join(broadcast(stepDim),
        col("event_type") === col("from_type") && col("next_type") === col("to_type"))
      .groupBy(col("step"), col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_pairs"))
    // spine from the route dim: a step no session ever walked reads 0
    val spine = broadcast(stepDim).join(stepCounts, Seq("step", "from_type", "to_type"), "left")
      .select(col("step"), col("from_type"), col("to_type"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"))
    // step 0 = the route head's raw visit count (the startPagePv
    // denominator), unioned in so one lag() chains every rate
    val start = sess.where(col("event_type") === route.head)
      .agg(count(lit(1)).as("n_pairs"))
      .select(lit(0).as("step"), lit("_start").as("from_type"),
        lit(route.head).as("to_type"), col("n_pairs"))
    val wo = Window.orderBy(col("step")) // ≤ route-length rows: driver-scale
    spine.unionByName(start)
      .withColumn("n_prev", lag(col("n_pairs"), 1).over(wo))
      .where(col("step") >= 1)
      .select(col("step"),
        concat(col("from_type"), lit("->"), col("to_type")).as("pair"),
        col("n_pairs"), col("n_prev"),
        when(col("n_prev") > 0,
          col("n_pairs").cast("double") / col("n_prev").cast("double"))
          .otherwise(lit(0.0)).as("rate"))
  }

  val c08Sql: String = {
    val route = DefaultFlow.split(",").toSeq
    val stepValues = route.init.zip(route.tail).zipWithIndex
      .map { case ((from, to), i) => s"(${i + 1}, '$from', '$to')" }.mkString(", ")
    s"""$sessPrefix, paired AS (
       |  SELECT event_type,
       |    lead(event_type, 1) OVER (PARTITION BY session_id ORDER BY ns, event_id) AS next_type
       |  FROM sess
       |), steps(step, from_type, to_type) AS (VALUES $stepValues),
       |counts AS (
       |  SELECT step, from_type, to_type, count(*) AS c
       |  FROM paired JOIN steps ON event_type = from_type AND next_type = to_type
       |  GROUP BY 1, 2, 3
       |), spine AS (
       |  SELECT s.step, s.from_type, s.to_type, coalesce(c.c, 0) AS n_pairs
       |  FROM steps s LEFT JOIN counts c
       |    ON s.step = c.step AND s.from_type = c.from_type AND s.to_type = c.to_type
       |  UNION ALL
       |  SELECT 0 AS step, '_start' AS from_type, '${route.head}' AS to_type, count(*) AS n_pairs
       |  FROM sess WHERE event_type = '${route.head}'
       |), chained AS (
       |  SELECT step, from_type || '->' || to_type AS pair,
       |    CAST(n_pairs AS BIGINT) AS n_pairs,
       |    CAST(lag(n_pairs, 1) OVER (ORDER BY step) AS BIGINT) AS n_prev
       |  FROM spine
       |)
       |SELECT step, pair, n_pairs, n_prev,
       |  CASE WHEN n_prev > 0 THEN CAST(n_pairs AS DOUBLE) / CAST(n_prev AS DOUBLE)
       |       ELSE 0.0 END AS rate
       |FROM chained WHERE step >= 1""".stripMargin
  }

  /** 需求4 composite: top-10 sessions (by click count) within each of the
    * top-10 categories (SessionStat.scala:95-161 — two groupByKey
    * shuffles and an in-memory sortWith there; a semi-join + one window
    * here). */
  def c06Top10Sessions(s: SparkSession, dir: String): DataFrame =
    top10SessionsFrom(Sessions.enriched(s, dir), Sessions.sessionized(s, dir))

  def top10SessionsFrom(ev: DataFrame, sess: DataFrame): DataFrame = {
    val top10 = top10From(ev).select(col("k"))
    val perSession = sess
      .where(col("event_type") === "click" && col("k").isNotNull)
      .join(broadcast(top10), Seq("k"), "left_semi")
      .groupBy(col("k"), col("session_id"))
      .agg(count(lit(1)).as("n_clicks"))
    val w = Window.partitionBy(col("k")).orderBy(col("n_clicks").desc, col("session_id").asc)
    perSession.withColumn("rnk", row_number().over(w)).where(col("rnk") <= 10)
  }

  val c06Sql: String =
    s"""$sessPrefix, counts AS (
       |  SELECT k,
       |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS click_count,
       |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS view_count,
       |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchase_count
       |  FROM sess WHERE k IS NOT NULL AND event_type IN ('click','view','purchase')
       |  GROUP BY k
       |), top10 AS (
       |  SELECT k FROM counts
       |  ORDER BY click_count DESC, view_count DESC, purchase_count DESC, k ASC LIMIT 10
       |), per_session AS (
       |  SELECT k, session_id, count(*) AS n_clicks
       |  FROM sess WHERE event_type = 'click' AND k IN (SELECT k FROM top10)
       |  GROUP BY 1, 2
       |)
       |SELECT k, session_id, n_clicks, rnk FROM (
       |  SELECT *, row_number() OVER (PARTITION BY k ORDER BY n_clicks DESC, session_id ASC) AS rnk
       |  FROM per_session) t
       |WHERE rnk <= 10""".stripMargin

  /** 需求6 composite — the reference's AreaTop3 flagship
    * (AreaTop3Stat.scala:15-125) in ONE declarative plan: local city dim
    * (S4) broadcast-joined (J3), per-(area,category) counts + distinct
    * city group-concat (A7/A8), product-type decode (F4), top-3 ranking
    * window per area (W1), area-level CASE (F3). City = user_id mod 10,
    * category = props.k — the fixture's analogues of the reference's
    * city_id / click_category_id. */
  private val cityDim: Seq[(Long, String, String)] = Seq(
    (0L, "city_0", "North"), (1L, "city_1", "North"), (2L, "city_2", "East"),
    (3L, "city_3", "East"), (4L, "city_4", "South"), (5L, "city_5", "South"),
    (6L, "city_6", "West"), (7L, "city_7", "West"), (8L, "city_8", "Central"),
    (9L, "city_9", "Central"))

  def c07AreaTop3(s: SparkSession, dir: String): DataFrame =
    areaTop3From(s, Sessions.enriched(s, dir))

  def areaTop3From(s: SparkSession, ev: DataFrame): DataFrame = {
    import s.implicits._
    val dim = cityDim.toDF("city_id", "city_name", "area")
    val clicks = ev
      .where(col("event_type") === "click" && col("k").isNotNull)
      .withColumn("city_id", col("user_id") % 10)
    val counted = clicks
      .join(broadcast(dim), Seq("city_id"))
      .groupBy(col("area"), col("k"))
      .agg(
        count(lit(1)).as("click_count"),
        concat_ws(",", sort_array(collect_set(
          concat(col("city_id"), lit(":"), col("city_name"))))).as("city_infos"))
    val w = Window.partitionBy(col("area")).orderBy(col("click_count").desc, col("k").asc)
    counted
      .withColumn("rnk", row_number().over(w)).where(col("rnk") <= 3)
      .select(
        col("area"),
        when(col("area").isin("North", "East"), "A Level")
          .when(col("area") === "South", "B Level")
          .otherwise("C Level").as("area_level"),
        col("k").as("product_id"),
        when(col("k") % 2 === 0, "Self").otherwise("Third").as("product_type"),
        col("city_infos"), col("click_count"), col("rnk"))
  }

  val c07Sql: String = {
    val dimValues = cityDim.map { case (i, n, a) => s"($i, '$n', '$a')" }.mkString(", ")
    s"""WITH clicks AS (
       |  SELECT user_id % 10 AS city_id,
       |    TRY_CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k
       |  FROM events
       |  WHERE event_type = 'click'
       |    AND TRY_CAST(json_extract_string(props, '$$.k') AS BIGINT) IS NOT NULL
       |), dim(city_id, city_name, area) AS (VALUES $dimValues),
       |counted AS (
       |  SELECT area, k, count(*) AS click_count,
       |    string_agg(DISTINCT CAST(clicks.city_id AS VARCHAR) || ':' || city_name, ','
       |               ORDER BY CAST(clicks.city_id AS VARCHAR) || ':' || city_name) AS city_infos
       |  FROM clicks JOIN dim ON clicks.city_id = dim.city_id
       |  GROUP BY area, k
       |)
       |SELECT area,
       |  CASE WHEN area IN ('North','East') THEN 'A Level'
       |       WHEN area = 'South' THEN 'B Level'
       |       ELSE 'C Level' END AS area_level,
       |  k AS product_id,
       |  CASE WHEN k % 2 = 0 THEN 'Self' ELSE 'Third' END AS product_type,
       |  city_infos, click_count, rnk
       |FROM (
       |  SELECT *, row_number() OVER (PARTITION BY area ORDER BY click_count DESC, k ASC) AS rnk
       |  FROM counted) t
       |WHERE rnk <= 3""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c01_explode_csv" -> (c01ExplodeCsv _),
    "c02_spine_counts" -> (c02SpineCounts _),
    "c03_top10_categories" -> (c03Top10 _),
    "c04_page_convert" -> (c04PageConvert _),
    "c05_convert_packed" -> (c05ConvertPacked _),
    "c06_top10_sessions" -> (c06Top10Sessions _),
    "c07_area_top3" -> (c07AreaTop3 _),
    "c08_flow_convert" -> (c08FlowConvert _))

  val oracleSql: Map[String, String] = Map(
    "c01_explode_csv" -> c01Sql,
    "c02_spine_counts" -> c02Sql,
    "c03_top10_categories" -> c03Sql,
    "c04_page_convert" -> c04Sql,
    "c05_convert_packed" -> c05Sql,
    "c06_top10_sessions" -> c06Sql,
    "c07_area_top3" -> c07Sql,
    "c08_flow_convert" -> c08Sql)
}
