package graft

import graft.etl.Upsert

/** Pins how the three reference upsert semantics (SURVEY S8) diverge on
  * the same input sequence — the reason they are three operators, not one.
  */
class UpsertSpec extends GraftSuite {
  import org.apache.spark.sql.DataFrame

  private def kv(rows: (String, Long)*): DataFrame = {
    import spark.implicits._
    rows.toDF("k", "n")
  }

  private def asMap(df: DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("accumulate adds, overwrite replaces — same input, different results") {
    val store = kv("a" -> 1L, "b" -> 2L)
    val batch = kv("b" -> 10L, "c" -> 5L)
    assert(asMap(Upsert.accumulate(store, batch, Seq("k"), "n")) ===
      Map("a" -> 1L, "b" -> 12L, "c" -> 5L))
    assert(asMap(Upsert.overwrite(store, batch, Seq("k"))) ===
      Map("a" -> 1L, "b" -> 10L, "c" -> 5L))
  }

  test("deleteInsert clears the whole partition, overwrite only matching keys") {
    import spark.implicits._
    val store = Seq(("d1", "x", 1L), ("d1", "y", 2L), ("d2", "z", 3L)).toDF("p", "k", "n")
    val batch = Seq(("d1", "x", 9L)).toDF("p", "k", "n")
    val di = Upsert.deleteInsert(store, batch, Seq("p")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // d1's y row is GONE (partition replaced); d2 untouched
    assert(di === Set(("d1", "x", 9L), ("d2", "z", 3L)))
    val ow = Upsert.overwrite(store, batch, Seq("p", "k")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // overwrite keeps d1/y — only the exact key was replaced
    assert(ow === Set(("d1", "x", 9L), ("d1", "y", 2L), ("d2", "z", 3L)))
  }

  test("repeated accumulate batches sum; repeated overwrite batches keep last") {
    val store0 = kv()
    val batches = Seq(kv("a" -> 1L), kv("a" -> 2L), kv("a" -> 3L))
    val acc = batches.foldLeft(store0)((s, b) => Upsert.accumulate(s, b, Seq("k"), "n"))
    val ow = batches.foldLeft(store0)((s, b) => Upsert.overwrite(s, b, Seq("k")))
    assert(asMap(acc) === Map("a" -> 6L))
    assert(asMap(ow) === Map("a" -> 3L))
  }
}
