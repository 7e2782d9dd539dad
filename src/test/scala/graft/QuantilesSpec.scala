package graft

import org.apache.spark.sql.functions._
import graft.operators.Misc

/** m17 — distributed exact quantiles by rank selection. */
class QuantilesSpec extends GraftSuite {

  test("m17: selected values equal the naive global-sort quantiles") {
    val got = Misc.m17GlobalQuantiles(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(got.keySet === Misc.M17Percents.toSet)
    val sorted = Tables.lineitem(spark, sf)
      .select(col("l_extendedprice")).orderBy(col("l_extendedprice"))
      .collect().map(_.getDouble(0))
    val n = sorted.length.toLong
    Misc.M17Percents.foreach { p =>
      val rank = (n * p + 99) / 100 // ceil(n*p/100), exact integer math
      assert(got(p) === sorted((rank - 1).toInt),
        s"pct $p: expected rank-$rank value of $n rows")
    }
  }

  test("m17: selected values are invariant to the partition count (re-size safe)") {
    // partition count only changes WHERE each rank lives, never which
    // value it selects — the total order is unique (tie-broken)
    def at(parts: Int) = Misc.m17GlobalQuantilesP(spark, sf, parts).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val at32 = at(32)
    assert(at(3) === at32)
    assert(at(7) === at32)
  }

  test("m17: the selection pass emits only the target rows (no ranked materialization)") {
    val df = Misc.m17GlobalQuantiles(spark, sf)
    assert(df.count() === Misc.M17Percents.size.toLong)
    // the result frame is checkpoint-backed (the two-pass cache is
    // released eagerly) — scanning it must not re-run the selection
    assert(df.queryExecution.executedPlan.toString.contains("Scan ExistingRDD"))
  }
}
