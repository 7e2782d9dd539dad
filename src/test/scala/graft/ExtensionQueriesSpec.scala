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

  test("s07: as-of match is the most recent click at or before each purchase") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), expr("ts div 1000").as("us"), col("value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val clicksByUser = ev.filter(_._2 == "click").groupBy(_._1)
    graft.operators.Sessions.s07AsofJoin(spark, sf).collect().foreach { r =>
      val (uid, pUs) = (r.getLong(0), r.getLong(2))
      val expected = clicksByUser.getOrElse(uid, Array.empty).filter(_._3 <= pUs)
      if (expected.isEmpty) {
        assert(r.isNullAt(r.fieldIndex("click_ts")), s"phantom match for user $uid")
      } else {
        val bestTs = expected.map(_._3).max
        assert(r.getLong(r.fieldIndex("click_ts")) === bestTs,
          s"wrong as-of timestamp for user $uid")
        val bestVal = expected.filter(_._3 == bestTs).map(_._4).max
        assert(r.getDouble(r.fieldIndex("click_val")) === bestVal)
      }
    }
  }

  test("d15: boilerplate doc-frequency never exceeds the corpus size") {
    val n = Tables.documents(spark, sf).count()
    val rows = LlmText.d15Boilerplate(spark, sf).collect()
    rows.foreach { r =>
      val dfreq = r.getLong(r.fieldIndex("doc_freq"))
      assert(dfreq >= LlmText.BoilerplateMinDocs && dfreq <= n)
      assert(r.getDouble(r.fieldIndex("doc_share")) === dfreq.toDouble / n)
    }
  }

  test("d16: exactly top-k ranked terms per doc, scores non-increasing") {
    val byDoc = LlmText.d16TfidfTop(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(r.fieldIndex("rnk")),
        r.getDouble(r.fieldIndex("score"))))
      .groupBy(_._1)
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (doc, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1 to sorted.length),
        s"ranks not contiguous for doc $doc")
      assert(sorted.length <= LlmText.TfidfTopK)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 >= b._3, s"score order broken for doc $doc")
        case _ =>
      }
    }
  }

  test("m12: day-by-day accumulate fold equals the one-shot merge and the full recompute") {
    val ev = Tables.events(spark, sf)
      .withColumn("date", date_format(expr("timestamp_micros(ts div 1000)"), "yyyy-MM-dd"))
    def rollup(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("event_type")).agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("sum_value"))
    val dates = ev.select("date").distinct().collect().map(_.getString(0)).sorted
    assert(dates.length > 2, "fixture should span several days")
    // replay the production lifecycle: one accumulate merge per day
    val folded = dates.drop(1).foldLeft(rollup(ev.where(col("date") === dates.head))) {
      (store, d) =>
        graft.etl.Upsert.accumulateAll(
          store, rollup(ev.where(col("date") === d)), Seq("event_type"), Seq("n_events", "sum_value"))
    }.select(col("event_type"), col("n_events"),
      round(col("sum_value"), 2).cast("double").as("sum_value"))
    val full = rollup(ev).select(col("event_type"), col("n_events"),
      round(col("sum_value"), 2).cast("double").as("sum_value"))
    val canon = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(canon(folded) === canon(full), "incremental fold must equal full recompute")
    assert(canon(Misc.m12IncrementalRollup(spark, sf)) === canon(full))
  }

  test("m14: masking removes every identifier run; pseudo keys preserve identity") {
    val rows = Misc.m14PiiScrub(spark, sf).collect()
    val names = Tables.customer(spark, sf).select("c_name").collect().map(_.getString(0))
    assert(rows.length === names.length)
    val idRun = "[0-9]{6,}".r
    rows.foreach { r =>
      val masked = r.getString(r.fieldIndex("masked_name"))
      assert(idRun.findFirstIn(masked).isEmpty, s"unmasked identifier survives in '$masked'")
      assert(r.getBoolean(r.fieldIndex("has_pii")) ===
        (r.getInt(r.fieldIndex("id_runs")) > 0))
    }
    // the fixture names are ID-bearing throughout: detection must fire on
    // every row, masking collapses the name space, and the pseudo key —
    // not the masked text — is what still distinguishes customers
    assert(rows.forall(_.getBoolean(4)), "fixture rows all carry an ID run")
    assert(rows.map(_.getString(1)).distinct.length === 1, "masked names collapse")
    assert(rows.map(_.getLong(3)).distinct.length === names.distinct.length,
      "pseudo keys stay 1:1 with raw names")
  }

  test("m13: bucketed range join equals the naive inequality join, no nested-loop in the plan") {
    val got = Misc.m13RangeJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(p => (p._1, p._2)).distinct.length === got.length,
      "each (error, click) pair must meet exactly once")
    // naive reference: all-pairs in test code over the collected arrays
    val ev = Tables.events(spark, sf).withColumn("us", expr("ts div 1000"))
    val errs = ev.where(col("event_type") === "error")
      .select("event_id", "us").collect().map(r => (r.getLong(0), r.getLong(1)))
    val clks = ev.where(col("event_type") === "click")
      .select("event_id", "us").collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = for {
      (eid, eus) <- errs; (cid, cus) <- clks
      if cus >= eus - Misc.M13ToleranceUs && cus <= eus + Misc.M13ToleranceUs
    } yield (eid, cid, cus - eus)
    assert(got.sorted.toSeq === want.sorted.toSeq)
    val plan = Misc.m13RangeJoin(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      s"range join must stay an equi-join:\n$plan")
  }

  test("RangeJoin: bucketing is exact beyond the double-precision domain (±2^62 keys)") {
    // floor(a / w) via double division would misbucket these; the
    // integer floor-div path must reproduce the naive join exactly
    import spark.implicits._
    val big = (1L << 62) - 3
    val ptsRaw = Seq(big, big - 1, big - 7919, -big, -big + 4231, 0L, 7L, -7L,
      Long.MinValue, Long.MinValue + 4231, Long.MaxValue, Long.MaxValue - 7919)
    val ivsRaw = Seq(
      (1L, big - 8000, big),     // catches the three high points
      (2L, -big, -big + 5000),   // catches the two low points
      (3L, -10L, 10L),           // catches 0, 7, -7
      // the overflow region: a - pmod(a, w) would wrap below MinValue
      (4L, Long.MinValue, Long.MinValue + 5000),
      (5L, Long.MaxValue - 8000, Long.MaxValue))
    val pts = ptsRaw.toDF("p")
    val ivs = ivsRaw.toDF("iid", "lo", "hi")
    val got = graft.operators.RangeJoin
      .bucketed(pts, ivs, "p", "lo", "hi", 60000000L)
      .select("iid", "p").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val want = (for {
      (iid, lo, hi) <- ivsRaw; p <- ptsRaw if p >= lo && p <= hi
    } yield (iid, p)).sorted
    assert(got === want)
  }

  test("st07 streaming dedup equals the batch distinct counts") {
    val dedup = AdAnalytics.st07StreamDedup(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = Tables.events(spark, sf).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dedup === batch)
  }
}
