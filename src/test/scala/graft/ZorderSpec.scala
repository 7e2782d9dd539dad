package graft

import org.apache.spark.sql.functions._
import graft.operators.Misc

/** Pins both halves of the m15 z-order + file-skipping claim:
  * value-neutrality (the skipped result is bit-equal to the plain
  * scan) and pruning power (the 2-D box reads a small fraction of the
  * files, and the z layout keeps strictly fewer files than a
  * single-dim linear layout on a part-only box — the query shape a
  * day-sorted table cannot skip for at all).
  */
class ZorderSpec extends GraftSuite {

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  test("m15: zorder key interleaves bits (locality sanity)") {
    // interleave(1,0)=1, interleave(0,1)=2, interleave(3,3)=15,
    // interleave(2^16,0) = 2^32 — spread moves bit k to bit 2k.
    val rows = spark.range(1).select(
      Misc.zorderKey(lit(1), lit(0)).as("a"),
      Misc.zorderKey(lit(0), lit(1)).as("b"),
      Misc.zorderKey(lit(3), lit(3)).as("c"),
      Misc.zorderKey(lit(65536), lit(0)).as("d")).first()
    assert(rows.getLong(0) === 1L)
    assert(rows.getLong(1) === 2L)
    assert(rows.getLong(2) === 15L)
    assert(rows.getLong(3) === 4294967296L)
  }

  test("m15: zorder key is non-negative and bit-exact across the full 31-bit range") {
    // the 31-bit-per-dim contract (round-10 advisor fix): spread bits
    // land on 0..60, y's shift tops out at 61 — never the sign bit —
    // so the Morton order stays monotone at any input; inputs >= 2^31
    // alias (mask) rather than corrupt the order. Checked against a
    // reference interleave on driver-side longs across the range.
    def refSpread(v: Long): Long = {
      val c = v & 0x7FFFFFFFL
      (0 until 31).foldLeft(0L)((acc, i) => acc | (((c >> i) & 1L) << (2 * i)))
    }
    val rnd = new scala.util.Random(42)
    val samples = Seq(0L, 1L, 2L, (1L << 31) - 1, 1L << 31, (1L << 32) + 7) ++
      Seq.fill(40)(rnd.nextLong().abs % (1L << 33))
    import spark.implicits._
    val got = samples.toDF("v")
      .select(Misc.zorderKey(col("v"), col("v") + 1).as("k"), col("v"))
      .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    samples.foreach { v =>
      val expect = refSpread(v) | (refSpread(v + 1) << 1)
      assert(got(v) === expect, s"v=$v")
      assert(got(v) >= 0L, s"negative key for v=$v")
    }
  }

  test("m15: skipped-scan result equals the plain full-scan aggregate") {
    val (pLo, pHi) = Misc.m15PartBounds(spark, sf)
    val direct = Tables.lineitem(spark, sf)
      .where(col("l_shipdate") >= lit("1995-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1995-07-01").cast("timestamp")
        && col("l_partkey") >= pLo && col("l_partkey") < pHi)
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("month"))
      .agg(
        count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice").cast("decimal(18,2)")), 2)
          .cast("double").as("revenue"))
    val got = Misc.m15ZorderSkip(spark, sf)
    assert(canon(got) === canon(direct))
    assert(got.count() > 0, "box predicate should select rows at every SF")
  }

  test("m15: 2-D box keeps a small fraction of z-clustered files") {
    val (pLo, pHi) = Misc.m15PartBounds(spark, sf)
    val path = Misc.m15WriteClustered(spark, sf, "graft_m15_lineitem_z",
      Misc.zorderKey(col("ship_day"), col("l_partkey")))
    val idx = Misc.m15FileIndex(spark, path).cache()
    try {
      val total = idx.count()
      assert(total >= Misc.M15Files - 4, s"expected ~${Misc.M15Files} files, got $total")
      val kept = Misc.m15PruneFiles(idx,
        Some((Misc.M15DayLo, Misc.M15DayHi)), Some((pLo, pHi))).length
      // simulated across sf0.001/0.01/0.1: 2-4 of 32
      assert(kept * 3 <= total, s"2-D box kept $kept of $total files — no pruning")
    } finally idx.unpersist()
  }

  test("m15: part-only box — z layout skips where the day-linear layout cannot") {
    val (pLo, pHi) = Misc.m15PartBounds(spark, sf)
    val zPath = Misc.m15WriteClustered(spark, sf, "graft_m15_lineitem_z",
      Misc.zorderKey(col("ship_day"), col("l_partkey")))
    val linPath = Misc.m15WriteClustered(spark, sf, "graft_m15_lineitem_lin",
      col("ship_day"))
    val zIdx = Misc.m15FileIndex(spark, zPath)
    val linIdx = Misc.m15FileIndex(spark, linPath)
    val zKept = Misc.m15PruneFiles(zIdx, None, Some((pLo, pHi))).length
    val linKept = Misc.m15PruneFiles(linIdx, None, Some((pLo, pHi))).length
    val linTotal = linIdx.count()
    // day-sorted files each span ~the full part range: nothing skips
    assert(linKept >= (linTotal * 9 / 10).toInt,
      s"linear layout unexpectedly pruned a part-only box ($linKept/$linTotal)")
    assert(zKept < linKept,
      s"z layout should keep fewer files than linear on a part-only box ($zKept vs $linKept)")
    // and a day-only box still prunes on the z layout too
    val zDayKept = Misc.m15PruneFiles(zIdx, Some((Misc.M15DayLo, Misc.M15DayHi)), None).length
    val zTotal = zIdx.count()
    assert(zDayKept < zTotal, s"day-only box kept every z file ($zDayKept/$zTotal)")
  }
}
