package graft

import org.apache.spark.sql.functions._
import graft.operators.Sessions
import graft.functions.{Predicates, TaskParams}

class SessionsSpec extends GraftSuite {

  test("s01: gap rule holds — intra-session gaps <= 1800s, new session after larger gap") {
    val rows = Sessions.sessionized(spark, sf)
      .select("user_id", "session_id", "sec")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._1, t._3))
    rows.sliding(2).foreach {
      case Array((u1, s1, t1), (u2, s2, t2)) if u1 == u2 =>
        val gap = t2 - t1
        if (s1 == s2) assert(gap <= Sessions.GapSeconds, s"gap $gap inside session $s1")
        else assert(gap > Sessions.GapSeconds, s"gap $gap across sessions $s1 -> $s2")
      case _ => ()
    }
  }

  test("s02: step lengths sum to total event count") {
    val total = Tables.events(spark, sf).count()
    val stepSum = Sessions.s02SessionAgg(spark, sf)
      .agg(sum("step_length")).collect()(0).getLong(0)
    assert(stepSum === total)
  }

  test("s03: one-row output, ratios in [0,1], step buckets partition all sessions") {
    val df = Sessions.s03BucketStats(spark, sf)
    val row = df.collect()(0)
    assert(df.count() === 1)
    val ratios = df.columns.zipWithIndex.filter(_._1.startsWith("ratio_"))
    ratios.foreach { case (c, i) =>
      val v = row.getDouble(i)
      assert(v >= 0.0 && v <= 1.0, s"$c = $v out of range")
    }
    // every session has >=1 step so the step buckets are exhaustive:
    // rounded ratios must sum to ~1
    val stepSum = df.columns.zipWithIndex
      .filter(_._1.startsWith("ratio_step_")).map(p => row.getDouble(p._2)).sum
    assert(math.abs(stepSum - 1.0) < 0.05, s"step ratios sum $stepSum")
  }

  test("predicate builder: missing params mean no constraint (F9)") {
    import spark.implicits._
    val df = Seq((1L, "a"), (25L, "b"), (99L, "c")).toDF("v", "s")
    // all params absent -> everything passes
    val open = df.where(Predicates.all(
      Predicates.between(col("v"), None, None),
      Predicates.in(col("s"), None),
      Predicates.equalTo(col("s"), None)))
    assert(open.count() === 3)
    // constrained
    assert(df.where(Predicates.between(col("v"), Some(2L), Some(50L))).count() === 1)
    assert(df.where(Predicates.in(col("s"), Some(Seq("a", "c")))).count() === 2)
    // absent clauses are constant-folded out of the plan entirely
    assert(open.queryExecution.optimizedPlan.toString.toLowerCase.indexOf("filter") === -1)
  }

  test("task params: flat json parse + typed getters") {
    val p = TaskParams.fromJson("""{"startAge": "20", "cities": "sh,bj", "ratio": 0.5, "empty": ""}""")
    assert(p.getLong("startAge").contains(20L))
    assert(p.getSeq("cities").contains(Seq("sh", "bj")))
    assert(p.getDouble("ratio").contains(0.5))
    assert(p.get("empty").isEmpty)   // empty string = absent
    assert(p.get("missing").isEmpty)
  }

  test("s05: per-stratum sample counts satisfy the quota formula") {
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

  test("date-range params filter whole days, push to the scan, and fold when absent") {
    val ev = Sessions.enriched(spark, sf)
    val dates = ev.select("date").distinct().collect().map(_.getString(0)).sorted
    assert(dates.length >= 3, s"fixture should span days: ${dates.toSeq}")
    val (lo, hi) = (dates(1), dates(1)) // a single middle day
    val p = TaskParams(Map("startDate" -> lo, "endDate" -> hi))
    val got = Sessions.filteredEvents(spark, sf, p).count()
    val expected = ev.where(col("date") >= lo && col("date") <= hi).count()
    assert(got === expected && got > 0)
    // the bound reaches the parquet scan as a pushed filter on raw ts
    val plan = Sessions.filteredEvents(spark, sf, p)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThanOrEqual(ts"),
      s"ts range must push down:\n$plan")
    // absent params leave no filter at all
    val open = Sessions.filteredEvents(spark, sf, TaskParams.empty)
    assert(open.count() === ev.count())
  }

  test("s09: funnel narrows strictly, rates exact, window binds") {
    val r = Sessions.s09Funnel(spark, sf).collect()(0)
    val (n, v, vc, full) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(n >= v && v > vc && vc > full, s"funnel must narrow strictly: $n $v $vc $full")
    assert(full > 0, "fixture should have full conversions at the day window")
    assert(r.getDouble(4) === vc.toDouble / v && r.getDouble(5) === full.toDouble / vc)
    // the time bound binds: without it, every user with the three types
    // in order converts — the windowed count must be strictly smaller
    val unbounded = {
      val ev = Tables.events(spark, sf).select(col("user_id"), col("event_type"), col("ts"))
      val t1 = ev.where(col("event_type") === "view")
        .groupBy(col("user_id")).agg(org.apache.spark.sql.functions.min("ts").as("t1"))
      val t2 = ev.join(t1, Seq("user_id"))
        .where(col("event_type") === "click" && col("ts") >= col("t1"))
        .groupBy(col("user_id")).agg(org.apache.spark.sql.functions.min("ts").as("t2"))
      ev.join(t2, Seq("user_id"))
        .where(col("event_type") === "purchase" && col("ts") >= col("t2"))
        .select("user_id").distinct().count()
    }
    assert(full < unbounded, s"window must bind: $full vs unbounded $unbounded")
  }

  test("s10: retention triangle is consistent (offset-0 = cohort size, actives bounded)") {
    val rows = Sessions.s10CohortRetention(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows.nonEmpty)
    assert(rows.keys.forall(_._2 >= 0), "offsets are non-negative by construction")
    val cohortSize = rows.collect { case ((c, 0L), n) => c -> n }
    assert(cohortSize.nonEmpty, "every cohort is active on its own first day")
    for (((c, off), n) <- rows if off > 0)
      cohortSize.get(c).foreach(size =>
        assert(n <= size, s"cohort $c offset $off: $n actives > size $size"))
    // total users = sum of cohort sizes
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(cohortSize.values.sum === users)
  }

  test("s08: extraction is deterministic, quota-sized, and re-run-stable") {
    val rows = Sessions.s08DeterministicExtract(spark, sf).collect()
    // per-stratum sizes obey the same quota formula s05 pins
    val sess = Sessions.sessionized(spark, sf)
      .groupBy("session_id").agg(org.apache.spark.sql.functions.min("ts").as("ts0"))
      .selectExpr("date_format(timestamp_micros(ts0 div 1000), 'yyyy-MM-dd') AS date",
        "hour(timestamp_micros(ts0 div 1000)) AS hour")
    val total = sess.count()
    val expected = sess.groupBy("date", "hour").count().collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        math.min(math.max(1L, r.getLong(2) * Sessions.SampleTarget / total), r.getLong(2)))
      .toMap
    val gotSizes = rows.groupBy(r => (r.getString(0), r.getInt(1)))
      .view.mapValues(_.length.toLong).toMap
    assert(gotSizes === expected)
    // identical row set on a re-run — the h64 key is partition- and
    // retry-stable, unlike rand(seed)
    val again = Sessions.s08DeterministicExtract(spark, sf).collect()
    assert(rows.map(_.toString).sorted.toSeq === again.map(_.toString).sorted.toSeq)
  }
}
