package graft

import org.scalatest.funsuite.AnyFunSuite

/** The stored-index memo overflow guard: under the bound the map is
  * untouched; over it, the guard clears (bounded memory over a silent
  * leak) — the failure mode it defends against is a caller keying a
  * memo on one-shot frames (the r9 e19 regression class).
  */
class StoredMemoSpec extends AnyFunSuite {

  private def mapOf(n: Int) = {
    val m = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    (1 to n).foreach(i => m.put(i, s"v$i"))
    m
  }

  test("guard leaves a within-bound memo untouched") {
    val m = mapOf(16)
    StoredMemo.guard(m, "t", bound = 16)
    assert(m.size === 16)
  }

  test("guard clears a flooded memo instead of letting it grow") {
    val m = mapOf(17)
    StoredMemo.guard(m, "t", bound = 16)
    assert(m.isEmpty, "over-bound memo must be cleared")
    // and the next computeIfAbsent simply rebuilds
    m.computeIfAbsent(1, _ => "rebuilt")
    assert(m.get(1) === "rebuilt")
  }

  test("stored-index serving paths return the SAME artifact across calls") {
    // identity (eq), not equality: a regression that silently rebuilds
    // the stored table per call is value-neutral and invisible to the
    // oracle gate — only the memo identity catches it
    val spark = SparkTestBase.spark
    val sf = SparkTestBase.sf
    assert(graft.operators.LlmText.d03LshNeardup(spark, sf)
      eq graft.operators.LlmText.d03LshNeardup(spark, sf))
    assert(graft.operators.Embeddings.bucketedOf(spark, sf)
      eq graft.operators.Embeddings.bucketedOf(spark, sf))
  }

  test("d03 memo keys on the result-changing levers (A/B recomputes)") {
    val spark = SparkTestBase.spark
    val sf = SparkTestBase.sf
    val base = graft.operators.LlmText.d03LshNeardup(spark, sf)
    spark.conf.set(graft.operators.LlmText.BandRowsConf, "2")
    try {
      val r2 = graft.operators.LlmText.d03LshNeardup(spark, sf)
      assert(!(r2 eq base), "a changed lever must not serve the stale artifact")
    } finally spark.conf.unset(graft.operators.LlmText.BandRowsConf)
  }
}
