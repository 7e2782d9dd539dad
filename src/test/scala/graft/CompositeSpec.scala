package graft

import org.apache.spark.sql.functions._
import graft.operators.{Categories, Embeddings, LlmText, Misc, Relational}

/** Invariant checks for the composite/engine-extension queries. */
class CompositeSpec extends GraftSuite {

  test("c06: at most 10 sessions per category, all categories from the top-10") {
    val rows = Categories.c06Top10Sessions(spark, sf).collect()
    assert(rows.nonEmpty)
    val top10 = Categories.c03Top10(spark, sf).collect().map(_.getLong(0)).toSet
    rows.groupBy(_.getLong(0)).foreach { case (k, g) =>
      assert(top10.contains(k))
      assert(g.length <= 10)
      assert(g.map(_.getInt(3)).sorted.toSeq === (1 to g.length))
    }
  }

  test("c07: three per area max, levels match the tier rule") {
    val rows = Categories.c07AreaTop3(spark, sf).collect()
    rows.groupBy(_.getString(0)).foreach { case (_, g) => assert(g.length <= 3) }
    rows.foreach { r =>
      val expected = r.getString(0) match {
        case "North" | "East" => "A Level"
        case "South" => "B Level"
        case _ => "C Level"
      }
      assert(r.getString(1) === expected)
    }
  }

  test("q19 pivot: wide counts sum to the per-priority totals") {
    val wide = Relational.q19Pivot(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1) + r.getLong(2) + r.getLong(3))).toMap
    val tall = Tables.orders(spark, sf).groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wide === tall)
  }

  test("m06: salted aggregation equals the direct aggregation") {
    val salted = Misc.m06SaltedAgg(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val direct = graft.operators.Sessions.enriched(spark, sf)
      .where(col("k").isNotNull)
      .groupBy("k").agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("u"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(salted === direct)
  }

  test("e05: probes stay inside the assigned cell, at most 3 per query") {
    val rows = Embeddings.e05IvfAnn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(1)).foreach { case (_, g) =>
      assert(g.length <= 3)
      assert(g.map(_.getInt(4)).sorted.toSeq === (1 to g.length))
      assert(g.map(_.getInt(0)).distinct.length === 1) // one cell per query
    }
  }

  test("d11: curated corpus is a subset of quality docs minus near-dups") {
    val stats = LlmText.d11CuratedCorpus(spark, sf).collect()
    val totalCurated = stats.map(_.getLong(1)).sum
    val totalQuality = LlmText.d06TextStats(spark, sf).where(col("is_quality")).count()
    assert(totalCurated > 0 && totalCurated <= totalQuality)
    // langs in output must exist in the corpus
    val langs = Tables.documents(spark, sf).select("lang").distinct()
      .collect().map(_.getString(0)).toSet
    stats.foreach(r => assert(langs.contains(r.getString(0))))
  }

  test("typed Aggregator groupConcatDistinct agrees with the built-in expression form") {
    import graft.functions.Aggregators
    val viaAggregator = Tables.customer(spark, sf)
      .groupBy(col("c_nationkey"))
      .agg(Aggregators.groupConcatDistinct(col("c_mktsegment")).as("segments"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    val viaBuiltins = Relational.q13GroupConcat(spark, sf)
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(viaAggregator === viaBuiltins)
  }

  test("approximate distinct counting stays within HLL error bounds") {
    val exact = Tables.events(spark, sf).select(countDistinct(col("user_id"))).collect()(0).getLong(0)
    val approx = Tables.events(spark, sf)
      .select(approx_count_distinct(col("user_id"), 0.02)).collect()(0).getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx $approx vs exact $exact")
  }

  test("st08: streaming session_window count equals batch session count") {
    val streamSessions = graft.streaming.AdAnalytics.st08SessionWindow(spark, sf).count()
    val batchSessions = graft.operators.Sessions.s02SessionAgg(spark, sf).count()
    assert(streamSessions === batchSessions)
  }
}
