package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Relational operator core — the scan/filter/join/agg/window/sort/set-op
  * inventory of SURVEY.md §2.1–2.8, each re-expressed as a declarative
  * DataFrame plan over the driver testdata so Catalyst supplies pushdown,
  * pruning, partial aggregation, broadcast selection, and whole-stage
  * codegen. Each query has a DuckDB oracle with identical column names.
  *
  * Cross-engine determinism rules used throughout (Spark vs DuckDB must
  * hash-match bit-for-bit):
  *  - money sums go through DECIMAL(18,2): exact, association-free; the
  *    final cast to double is correctly rounded in both engines.
  *  - top-k orderings always carry a unique tie-break key.
  *  - double division of exact integers/decimals is IEEE-identical.
  */
object Relational {

  /** Exact money arithmetic: cast to decimal before summing so the result
    * is independent of partitioning / evaluation order (a double sum over
    * a shuffled 100 TB table is nondeterministic in its last ulps).
    */
  private def dec(c: Column): Column = c.cast("decimal(18,2)")
  private def money(c: Column): Column = round(c, 2).cast("double")

  /** Q01 — pricing summary (SURVEY A8/A6 analog; TPC-H Q1 shape).
    * Hash aggregate with partial (map-side) combine; no shuffle beyond the
    * single group-by exchange on (l_returnflag, l_linestatus) — at 100 TB
    * the 6-group cardinality means partial aggregation does ~all the work.
    * Reference: session/src/main/scala/SessionStat.scala:164-239 does the
    * same multi-metric per-key aggregation by hand with reduceByKey chains.
    */
  def q01Agg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        money(sum(dec(col("l_quantity")))).as("sum_qty"),
        money(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
        money(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))).as("sum_disc_price"),
        count(lit(1)).as("count_order"))

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_disc_price,
      |  count(*) AS count_order
      |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** Q02 — filter + projection pushdown (SURVEY S1/S2/P2).
    * The shipdate range and quantity predicate reach the parquet scan as
    * PushedFilters; ReadSchema carries only the 5 referenced columns.
    */
  def q02FilterPushdown(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .where(col("l_shipdate") >= lit("1995-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1996-01-01").cast("timestamp")
        && col("l_quantity") < 5)
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        money(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount")))).as("disc_price"))

  val q02Sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity,
      |  CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE) AS disc_price
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01' AND l_quantity < 5""".stripMargin

  /** Q03 — multi-way join + aggregate (SURVEY J2/J3).
    * nation (25 rows) is explicitly broadcast — the 100 TB-scale rule is
    * that dimension tables ride along with every executor instead of
    * forcing a shuffle of the fact side; customer⋈orders shuffles on the
    * join key once and AQE handles skew.
    */
  def q03JoinAgg(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        money(sum(dec(col("o_totalprice")))).as("total_revenue"),
        count(lit(1)).as("n_orders"))

  val q03Sql: String =
    """SELECT n_name,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_revenue,
      |  count(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name""".stripMargin

  /** Q04 — ranking window, top-3 per partition (SURVEY W1:
    * areaStat/src/main/scala/AreaTop3Stat.scala:81-105). Unique tie-break
    * on p_partkey keeps the result deterministic across engines.
    */
  def q04WindowTopk(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand")).orderBy(col("p_retailprice").desc, col("p_partkey").asc)
    Tables.part(s, dir)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("p_brand"), col("p_partkey"), col("p_name"), col("p_retailprice"), col("rn"))
  }

  val q04Sql: String =
    """SELECT p_brand, p_partkey, p_name, p_retailprice, rn FROM (
      |  SELECT p_brand, p_partkey, p_name, p_retailprice,
      |    row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
      |  FROM part) t WHERE rn <= 3""".stripMargin

  /** Q05 — global top-k (SURVEY T1: session/.../SortKey.scala secondary
    * sort + take(10)). Catalyst plans TakeOrderedAndProject: each partition
    * keeps its local top-10, only k rows per partition reach the driver —
    * the pattern that survives 100 TB, unlike the reference's sortByKey
    * full shuffle.
    */
  def q05TopkOrder(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  val q05Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin

  /** Q06 — left outer join + coalesce-to-zero (SURVEY J4:
    * SessionStat.scala:241-267 leftOuterJoin chain). One shuffle on the
    * join key; count/sum absorb the null-extension.
    */
  def q06LeftJoin(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        coalesce(money(sum(dec(col("o_totalprice")))), lit(0.0)).as("spend"))

  val q06Sql: String =
    """SELECT c_custkey, count(o_orderkey) AS n_orders,
      |  coalesce(CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE), 0.0) AS spend
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey""".stripMargin

  /** Q07 — semi join / EXISTS (SURVEY J6: isin-over-driver-array replaced
    * by a distributed left_semi, which stays executor-side at any scale).
    */
  def q07SemiJoin(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .where(col("c_mktsegment") === "AUTOMOBILE")
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))

  val q07Sql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_mktsegment = 'AUTOMOBILE'
      |  AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin

  /** Q08 — anti join / NOT EXISTS (SURVEY J7: the streaming blacklist
    * filter, batch shape): customers with no completed ('F') order. */
  def q08AntiJoin(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(
        Tables.orders(s, dir).where(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))

  val q08Sql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""".stripMargin

  /** Q09 — distinct (SURVEY A4). */
  def q09Distinct(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(col("c_mktsegment"), col("c_nationkey")).distinct()

  val q09Sql: String =
    "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer"

  /** Q10 — union + distinct spine (SURVEY §2.7: the top-10-categories
    * spine that SessionStat.scala:164-184 builds with flatMap branching).
    */
  def q10Union(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(col("c_nationkey").as("nationkey"))
      .unionByName(Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey")))
      .distinct()

  val q10Sql: String =
    """SELECT DISTINCT nationkey FROM (
      |  SELECT c_nationkey AS nationkey FROM customer
      |  UNION ALL SELECT s_nationkey AS nationkey FROM supplier) t""".stripMargin

  /** Q11 — JSON field extraction (SURVEY F2: UDF get_json_field replaced
    * by the codegen'd built-in get_json_object). */
  def q11JsonExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(get_json_object(col("props"), "$.k").cast("bigint").as("k"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"))

  val q11Sql: String =
    """SELECT TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, count(*) AS n
      |FROM events GROUP BY 1""".stripMargin

  /** Q12 — CASE WHEN tiering (SURVEY F3: area → area_level). */
  def q12CaseWhen(s: SparkSession, dir: String): DataFrame =
    Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .select(
        col("n_name"), col("r_name"),
        when(col("r_name").isin("EUROPE", "ASIA"), "A Level")
          .when(col("r_name") === "AMERICA", "B Level")
          .when(col("r_name") === "AFRICA", "C Level")
          .otherwise("D Level").as("area_level"))

  val q12Sql: String =
    """SELECT n_name, r_name,
      |  CASE WHEN r_name IN ('EUROPE','ASIA') THEN 'A Level'
      |       WHEN r_name = 'AMERICA' THEN 'B Level'
      |       WHEN r_name = 'AFRICA' THEN 'C Level'
      |       ELSE 'D Level' END AS area_level
      |FROM nation JOIN region ON n_regionkey = r_regionkey""".stripMargin

  /** Q13 — distinct group-concat (SURVEY A7: GroupConcatDistinct UDAF →
    * built-in collect_set + sort_array; canonical ascending order makes
    * the packed string deterministic, unlike the reference's
    * merge-without-dedup UDAF, GroupConcatDistinct.scala:38-51).
    */
  def q13GroupConcat(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .groupBy(col("c_nationkey"))
      .agg(concat_ws(",", sort_array(collect_set(col("c_mktsegment")))).as("segments"))

  val q13Sql: String =
    """SELECT c_nationkey, string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments
      |FROM customer GROUP BY c_nationkey""".stripMargin

  /** Q14 — running aggregate window (SURVEY T3 frame analog). The frame
    * sum runs in DECIMAL so the running value is exact and
    * association-free (a double running sum differs between engines'
    * window implementations).
    */
  def q14RunningWindow(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        money(sum(dec(col("o_totalprice"))).over(w)).as("running_spend"))
  }

  val q14Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_spend
      |FROM orders""".stripMargin

  /** Q15 — rollup (engine-completeness extension; the reference has no
    * grouping sets, SURVEY §2.4 note). */
  def q15Rollup(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"))

  val q15Sql: String =
    """SELECT r_name, n_name, count(*) AS n_customers
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)""".stripMargin

  /** Q16 — lead/lag analytic window (SURVEY T3: the page-flow pairing).
    * Day difference computed on DATE-truncated values so both engines
    * count calendar days.
    */
  def q16LeadLag(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.orders(s, dir)
      .withColumn("next_date", lead(col("o_orderdate"), 1).over(w))
      .where(col("next_date").isNotNull)
      .select(
        col("o_custkey"), col("o_orderkey"),
        datediff(to_date(col("next_date")), to_date(col("o_orderdate"))).as("days_to_next"))
  }

  val q16Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  date_diff('day', CAST(o_orderdate AS DATE), CAST(next_date AS DATE)) AS days_to_next
      |FROM (
      |  SELECT o_custkey, o_orderkey, o_orderdate,
      |    lead(o_orderdate, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS next_date
      |  FROM orders) t
      |WHERE next_date IS NOT NULL""".stripMargin

  /** Q17 — cube (engine completeness alongside q15's rollup: all 2^n
    * grouping-set combinations in one pass). */
  def q17Cube(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))

  val q17Sql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin

  /** Q18 — correlated scalar subqueries: orders above 1.5× their
    * customer's own average. Catalyst decorrelates into aggregate +
    * join — the plan a hand-written self-join would produce, for free.
    * The comparison is price·count·2 > sum·3 in DECIMAL so it is exact:
    * a double `avg` is summation-order-dependent in its last ulp, which
    * an all-or-nothing hash gate cannot tolerate at a boundary. */
  def q18CorrelatedSubquery(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders_q18")
    s.sql("""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders_q18 o
      WHERE CAST(o_totalprice AS DECIMAL(18,2)) *
              (SELECT count(*) FROM orders_q18 o2 WHERE o2.o_custkey = o.o_custkey) * 2 >
            (SELECT sum(CAST(o2.o_totalprice AS DECIMAL(18,2)))
             FROM orders_q18 o2 WHERE o2.o_custkey = o.o_custkey) * 3
    """)
  }

  val q18Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders o
      |WHERE CAST(o_totalprice AS DECIMAL(18,2)) *
      |        (SELECT count(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey) * 2 >
      |      (SELECT sum(CAST(o2.o_totalprice AS DECIMAL(18,2)))
      |       FROM orders o2 WHERE o2.o_custkey = o.o_custkey) * 3""".stripMargin

  /** Q19 — pivot: wide per-status counts. Pivot values are given
    * explicitly so the output schema is static (a discovery pivot would
    * need an extra pass AND make the schema data-dependent). */
  def q19Pivot(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .withColumnsRenamed(Map("F" -> "n_f", "O" -> "n_o", "P" -> "n_p"))

  val q19Sql: String =
    """SELECT o_orderpriority,
      |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
      |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
      |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
      |FROM orders GROUP BY o_orderpriority""".stripMargin

  /** Q20 — RANGE window frame (time-based): per customer, total spend in
    * the trailing 7 days (q14's ROWS frame counts rows; RANGE bounds by
    * VALUE distance). Both engines see the frame as epoch-second
    * distance, decimal-exact sums. */
  def q20RangeFrame(s: SparkSession, dir: String): DataFrame = {
    // o_orderdate reads as TIMESTAMP_NTZ, which has no direct long cast;
    // via TIMESTAMP (session tz pinned UTC) to epoch seconds
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").cast("timestamp").cast("long"))
      .rangeBetween(-7L * 86400, 0)
    Tables.orders(s, dir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        money(sum(dec(col("o_totalprice"))).over(w)).as("spend_7d"))
  }

  val q20Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
      |    RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS spend_7d
      |FROM orders""".stripMargin

  /** Q21 — intersect / except (completing the set-op family next to
    * q10's union+distinct): nations having customers but no suppliers,
    * and nations having both. Both plan as aggregates + semi/anti joins. */
  def q21SetOps(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select(col("c_nationkey").as("nationkey"))
    val su = Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey"))
    c.except(su).withColumn("relation", lit("customers_only"))
      .unionByName(c.intersect(su).withColumn("relation", lit("both")))
  }

  val q21Sql: String =
    """SELECT nationkey, 'customers_only' AS relation FROM (
      |  SELECT DISTINCT c_nationkey AS nationkey FROM customer
      |  EXCEPT
      |  SELECT s_nationkey AS nationkey FROM supplier)
      |UNION ALL
      |SELECT nationkey, 'both' AS relation FROM (
      |  SELECT c_nationkey AS nationkey FROM customer
      |  INTERSECT
      |  SELECT s_nationkey AS nationkey FROM supplier)""".stripMargin

  /** Q22 — explicit GROUPING SETS + grouping_id (the general form under
    * q15's rollup / q17's cube): status-only and priority-only totals in
    * one pass, disambiguated by the grouping id. */
  def q22GroupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders_q22")
    s.sql("""
      SELECT o_orderstatus, o_orderpriority,
             grouping(o_orderstatus) AS g_status,
             grouping(o_orderpriority) AS g_priority,
             count(*) AS n
      FROM orders_q22
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """)
  }

  val q22Sql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  grouping(o_orderstatus) AS g_status,
      |  grouping(o_orderpriority) AS g_priority,
      |  count(*) AS n
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))""".stripMargin

  // ---------------------------------------------------------------- q23
  /** Relative-rank window family (percent_rank / cume_dist / ntile) —
    * the remaining analytic-window kit beyond ranking (q04), running
    * (q14), lead/lag (q16) and RANGE frames (q20). All three are
    * cross-engine exact: percent_rank = (rank−1)/(n−1) and cume_dist =
    * rows_preceding_or_peer/n are divisions of exact integers (one
    * correctly-rounded IEEE op), and ntile's bucket arithmetic is pure
    * integer math — PROVIDED the ordering is total, so the order key
    * carries the unique (l_orderkey, l_linenumber) tie-break. One
    * shuffle on the partition key, like every window here. */
  val NtileBuckets = 4

  def q23RelativeRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice").asc, col("l_orderkey").asc, col("l_linenumber").asc)
    Tables.lineitem(s, dir).select(
      col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
      percent_rank().over(w).as("pct_rank"),
      cume_dist().over(w).as("cume"),
      ntile(NtileBuckets).over(w).as("quartile"))
  }

  val q23Sql: String =
    s"""SELECT l_returnflag, l_orderkey, l_linenumber,
       |  percent_rank() OVER w AS pct_rank,
       |  cume_dist() OVER w AS cume,
       |  ntile($NtileBuckets) OVER w AS quartile
       |FROM lineitem
       |WINDOW w AS (PARTITION BY l_returnflag
       |             ORDER BY l_extendedprice ASC, l_orderkey ASC, l_linenumber ASC)""".stripMargin

  // ---------------------------------------------------------------- q24
  /** FILTER-clause aggregates — the standard-SQL form of conditional
    * aggregation (`agg(x) FILTER (WHERE p)`), the declarative twin of
    * the `sum(when(...))` idiom used throughout (s03/s04): each
    * aggregate carries its own predicate in ONE pass over the data, and
    * Catalyst plans it as the same single hash aggregate. Money columns
    * route through DECIMAL so the filtered sums hash-match. */
  def q24FilterAgg(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders_q24")
    s.sql("""
      SELECT o_orderpriority,
             count(*) AS n_orders,
             count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
             count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                  FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS finished_revenue
      FROM orders_q24
      GROUP BY o_orderpriority
    """)
  }

  val q24Sql: String =
    """SELECT o_orderpriority,
      |  count(*) AS n_orders,
      |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
      |  count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
      |       FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS finished_revenue
      |FROM orders
      |GROUP BY o_orderpriority""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q24_filter_agg" -> (q24FilterAgg _),
    "q23_relative_rank" -> (q23RelativeRank _),
    "q22_grouping_sets" -> (q22GroupingSets _),
    "q21_set_ops" -> (q21SetOps _),
    "q20_range_frame" -> (q20RangeFrame _),
    "q17_cube" -> (q17Cube _),
    "q18_correlated_subquery" -> (q18CorrelatedSubquery _),
    "q19_pivot" -> (q19Pivot _),
    "q01_agg" -> (q01Agg _),
    "q02_filter_pushdown" -> (q02FilterPushdown _),
    "q03_join_agg" -> (q03JoinAgg _),
    "q04_window_topk" -> (q04WindowTopk _),
    "q05_topk_order" -> (q05TopkOrder _),
    "q06_left_join" -> (q06LeftJoin _),
    "q07_semi_join" -> (q07SemiJoin _),
    "q08_anti_join" -> (q08AntiJoin _),
    "q09_distinct" -> (q09Distinct _),
    "q10_union" -> (q10Union _),
    "q11_json_extract" -> (q11JsonExtract _),
    "q12_case_when" -> (q12CaseWhen _),
    "q13_group_concat" -> (q13GroupConcat _),
    "q14_running_window" -> (q14RunningWindow _),
    "q15_rollup" -> (q15Rollup _),
    "q16_lead_lag" -> (q16LeadLag _))

  val oracleSql: Map[String, String] = Map(
    "q24_filter_agg" -> q24Sql,
    "q23_relative_rank" -> q23Sql,
    "q22_grouping_sets" -> q22Sql,
    "q21_set_ops" -> q21Sql,
    "q20_range_frame" -> q20Sql,
    "q17_cube" -> q17Sql,
    "q18_correlated_subquery" -> q18Sql,
    "q19_pivot" -> q19Sql,
    "q01_agg" -> q01Sql,
    "q02_filter_pushdown" -> q02Sql,
    "q03_join_agg" -> q03Sql,
    "q04_window_topk" -> q04Sql,
    "q05_topk_order" -> q05Sql,
    "q06_left_join" -> q06Sql,
    "q07_semi_join" -> q07Sql,
    "q08_anti_join" -> q08Sql,
    "q09_distinct" -> q09Sql,
    "q10_union" -> q10Sql,
    "q11_json_extract" -> q11Sql,
    "q12_case_when" -> q12Sql,
    "q13_group_concat" -> q13Sql,
    "q14_running_window" -> q14Sql,
    "q15_rollup" -> q15Sql,
    "q16_lead_lag" -> q16Sql)
}
