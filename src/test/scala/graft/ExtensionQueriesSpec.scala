package graft

import org.apache.spark.sql.functions._
import graft.operators.{LlmText, Misc, Relational}
import graft.streaming.AdAnalytics

/** Invariants for the engine-extension and latest queries (all also
  * oracle-checked; these pin the semantic relationships between them). */
class ExtensionQueriesSpec extends GraftSuite {

  test("q20: trailing-7d spend positive and bounded by the customer total") {
    // NOTE deliberately not compared to q14's running sum: a RANGE frame
    // includes all same-date PEERS of the current row, a ROWS frame only
    // rows up to the current one — the exact semantic q20 exists to show
    val totals = Tables.orders(spark, sf).groupBy("o_custkey")
      .agg(round(sum(col("o_totalprice").cast("decimal(18,2)")), 2).cast("double").as("t"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    Relational.q20RangeFrame(spark, sf).collect().foreach { r =>
      val spend = r.getDouble(2)
      assert(spend > 0 && spend <= totals(r.getLong(0)) + 1e-6,
        s"7d spend out of bounds for customer ${r.getLong(0)}")
    }
  }

  test("q21: relations partition the nation keys") {
    val rows = Relational.q21SetOps(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getString(1))
    val only = rows.filter(_._2 == "customers_only").map(_._1).toSet
    val both = rows.filter(_._2 == "both").map(_._1).toSet
    assert((only & both).isEmpty)
    val custKeys = Tables.customer(spark, sf).select("c_nationkey")
      .distinct().collect().map(_.getInt(0)).toSet
    assert((only ++ both) === custKeys)
  }

  test("q22: grouping flags identify exactly one active dimension per row") {
    Relational.q22GroupingSets(spark, sf).collect().foreach { r =>
      val gs = r.getByte(r.fieldIndex("g_status"))
      val gp = r.getByte(r.fieldIndex("g_priority"))
      assert(gs + gp === 1, s"expected exactly one grouped dim, got ($gs,$gp)")
    }
  }

  test("d12/d13: quality-signal ranges and ordered percentiles") {
    LlmText.d12Repetition(spark, sf).collect().foreach { r =>
      val ratio = r.getDouble(r.fieldIndex("dup_ratio"))
      assert(ratio >= 0.0 && ratio <= 1.0)
      assert(r.getInt(r.fieldIndex("n_distinct")) <= r.getInt(r.fieldIndex("n_shingles")))
    }
    LlmText.d13CorpusStats(spark, sf).collect().foreach { r =>
      val (mn, p50, p90, mx) = (
        r.getInt(r.fieldIndex("min_tokens")), r.getInt(r.fieldIndex("p50_tokens")),
        r.getInt(r.fieldIndex("p90_tokens")), r.getInt(r.fieldIndex("max_tokens")))
      assert(mn <= p50 && p50 <= p90 && p90 <= mx, s"percentiles out of order: $mn $p50 $p90 $mx")
    }
  }

  test("m07: string-date range keeps only in-range dates, predicate pushed") {
    val df = Misc.m07DateRangeStrings(spark, sf)
    df.collect().foreach { r =>
      val d = r.getString(0)
      assert(d >= "2024-01-05" && d <= "2024-01-15")
    }
    assert(df.count() === 11) // inclusive day range
  }

  test("st07 streaming dedup equals the batch distinct counts") {
    val dedup = AdAnalytics.st07StreamDedup(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = Tables.events(spark, sf).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dedup === batch)
  }
}
