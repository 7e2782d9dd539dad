package graft

import org.apache.spark.sql.functions._

/** Pins [[graft.plans.TsPushdown]]: range predicates on the NORMALIZED
  * epoch-nanos ts must reach the parquet scan as pushed filters on the
  * raw timestamp column, and the rewrite must be row-exact against the
  * un-rewritten evaluation for bounds on and off the 1000-ns boundary.
  * (Only meaningful when the fixture's physical ts is a timestamp — on
  * an int64 fixture the predicate pushes natively and the rule no-ops.)
  */
class TsPushdownSpec extends GraftSuite {

  private def physicalIsTimestamp: Boolean =
    spark.read.parquet(s"$sf/events.parquet").schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType

  private def ev = Tables.events(spark, sf)

  test("range predicate on normalized ts pushes to the parquet scan") {
    assume(physicalIsTimestamp, "int64 fixture: predicate pushes natively")
    val bounds = ev.agg(min("ts"), max("ts")).collect()(0)
    val mid = (bounds.getLong(0) + bounds.getLong(1)) / 2
    val plan = ev.where(col("ts") >= mid).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThanOrEqual(ts"),
      s"normalized-ts bound must reach the scan:\n$plan")
  }

  test("rewrite is row-exact for bounds on and off the micros boundary") {
    val bounds = ev.agg(min("ts"), max("ts")).collect()(0)
    val mid = (bounds.getLong(0) + bounds.getLong(1)) / 2
    // off-boundary bounds exercise the floor/ceil inverses; the
    // un-rewritten truth comes from evaluating the SAME predicate on a
    // frame the rule cannot touch (normalized ts materialized first)
    val frozen = ev.localCheckpoint(true)
    for (delta <- Seq(0L, 1L, 499L, 999L, 1000L, 1001L)) {
      val b = mid + delta
      assert(ev.where(col("ts") >= b).count() == frozen.where(col("ts") >= b).count(), s">= $b")
      assert(ev.where(col("ts") > b).count() == frozen.where(col("ts") > b).count(), s"> $b")
      assert(ev.where(col("ts") <= b).count() == frozen.where(col("ts") <= b).count(), s"<= $b")
      assert(ev.where(col("ts") < b).count() == frozen.where(col("ts") < b).count(), s"< $b")
    }
    // equality: a real nanos value (multiple of 1000 — rewritten) and a
    // non-multiple (left alone, matches nothing on a micros fixture)
    val someTs = frozen.select("ts").limit(1).collect()(0).getLong(0)
    assert(ev.where(col("ts") === someTs).count() == frozen.where(col("ts") === someTs).count())
    assert(ev.where(col("ts") === (someTs + 1)).count() == frozen.where(col("ts") === (someTs + 1)).count())
  }
}
