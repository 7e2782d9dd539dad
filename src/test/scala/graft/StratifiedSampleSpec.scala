package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Aggregators
import graft.operators.Sessions

/** Laws for the bounded stratified-sample aggregate (s05's draw):
  * [[Aggregators.quotaSample]] must select EXACTLY the rows the window
  * form `row_number over (partitionBy stratum orderBy rnd, id) <= quota`
  * selects — the top-quota of a total order is one set however it is
  * folded — and the fold must be partition-invariant (top-k of a total
  * order is associative/commutative under merge). The aggregate exists
  * because its map-side combine caps every partition's exchange
  * contribution at quota rows; the window form shuffles the full table.
  */
class StratifiedSampleSpec extends GraftSuite {

  /** Synthetic strata with a deterministic (non-rand) draw key so both
    * forms see bit-identical inputs regardless of plan shape. */
  private def fixture = {
    import spark.implicits._
    val rows = (1L to 997L).map { id =>
      val stratum = (id % 7L).toInt
      // xorshift-ish spread mapped to [0, 1): a stand-in for rand(42)
      val h = (id * 0x9E3779B97F4A7C15L) ^ (id << 13)
      val rnd = math.abs(h.toDouble / Long.MaxValue.toDouble)
      (stratum, rnd, id)
    }
    rows.toDF("stratum", "rnd", "id")
  }

  private def quotas = {
    import spark.implicits._
    Seq((0, 1L), (1, 3L), (2, 5L), (3, 2L), (4, 8L), (5, 1L), (6, 4L))
      .toDF("stratum", "quota")
  }

  private def sampleSet(df: org.apache.spark.sql.DataFrame): Set[(Int, Long)] =
    df.collect().flatMap { r =>
      val st = r.getInt(0)
      r.getSeq[Long](1).map(st -> _)
    }.toSet

  test("quotaSample selects exactly the window form's top-quota rows") {
    val in = fixture.join(broadcast(quotas), Seq("stratum"))
    val agg = in.groupBy(col("stratum"))
      .agg(Aggregators.quotaSample(col("quota"), col("rnd"), col("id")).as("sample"))
      .select(col("stratum"), col("sample"))
    val w = Window.partitionBy(col("stratum")).orderBy(col("rnd"), col("id"))
    val win = in.withColumn("rn", row_number().over(w))
      .where(col("rn") <= col("quota"))
      .groupBy(col("stratum"))
      .agg(sort_array(collect_list(col("id"))).as("sample"))
      .select(col("stratum"), col("sample"))
    val got = sampleSet(agg)
    assert(got === sampleSet(win))
    assert(got.nonEmpty)
  }

  test("the fold is partition-invariant (merge is a total-order top-k)") {
    val in = fixture.join(broadcast(quotas), Seq("stratum"))
    def run(df: org.apache.spark.sql.DataFrame) =
      sampleSet(df.groupBy(col("stratum"))
        .agg(Aggregators.quotaSample(col("quota"), col("rnd"), col("id")).as("sample"))
        .select(col("stratum"), col("sample")))
    val base = run(in)
    assert(run(in.repartition(1)) === base)
    assert(run(in.repartition(13, col("id"))) === base)
    assert(run(in.repartition(4, col("stratum"))) === base)
  }

  test("draw-order finish: ids come back ascending by (rnd, id)") {
    val in = fixture.join(broadcast(quotas), Seq("stratum"))
    val rows = in.groupBy(col("stratum"))
      .agg(Aggregators.quotaSample(col("quota"), col("rnd"), col("id")).as("sample"))
      .collect()
    val rndOf = fixture.collect().map(r => r.getLong(2) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val ids = r.getSeq[Long](1)
      val keys = ids.map(id => (rndOf(id), id))
      assert(keys === keys.sortBy(identity), s"stratum ${r.getInt(0)} not in draw order")
    }
  }

  test("s05 keeps the quota formula under the aggregate draw") {
    // the operator-level law (SessionsSpec pins it too): n_sampled =
    // min(max(1, cnt*target/total), cnt) per (date, hour)
    val ev = Sessions.enriched(spark, sf)
    val total = ev.count()
    val expected = ev.groupBy("date", "hour").count().collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        math.min(math.max(1L, r.getLong(2) * Sessions.SampleTarget / total), r.getLong(2)))
      .toMap
    val got = Sessions.s05StratifiedSample(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got === expected)
  }

  test("the exchange after the draw is stratum-sized, not event-sized") {
    // the plan property the aggregate buys: the final aggregate's
    // shuffle reads partial (ObjectHashAggregate partial_quotasample)
    // outputs — assert the partial-aggregation stage exists, i.e. the
    // plan is agg→exchange→agg, NOT window-sort over the full table
    val (plan, cache) = Sessions.s05PlanWithCache(spark, sf)
    try {
      val p = plan.queryExecution.executedPlan.toString
      assert(!p.toLowerCase.contains("window"), s"s05 must not window-sort:\n$p")
      assert(p.toLowerCase.contains("objecthashaggregate") &&
        p.contains("partial_quotasample"),
        s"s05 draw must partial-aggregate:\n$p")
    } finally { cache.unpersist(); () }
  }
}
