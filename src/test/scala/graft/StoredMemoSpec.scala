package graft

import org.scalatest.funsuite.AnyFunSuite

/** The stored-index memo machinery: overflow guard (bounded memory,
  * partial eviction so hot serving keys usually survive a one-shot-key
  * flood — the r9 e19 regression class), cold bypass
  * ([[StoredMemo.DisableConf]] — the measured-cold-bench switch),
  * session-scoped keys, and collision-proof dir tags.
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

  test("guard evicts only the overflow, not the whole memo") {
    val m = mapOf(20)
    StoredMemo.guard(m, "t", bound = 16)
    assert(m.size === 16,
      "guard must evict down to the bound, not clear every hot key")
    // and the next computeIfAbsent simply rebuilds an evicted entry
    m.computeIfAbsent(999, _ => "rebuilt")
    assert(m.get(999) === "rebuilt")
  }

  test("eviction prefers foreign-session keys — for plain dirKey strings AND tuple keys") {
    // the round-11 advisory gap: composite tuple keys (codebook/lever
    // memos lead with appId or a dirKey in position 0) must get the
    // same live-session protection as plain string keys
    val app = "app-live"
    val m = new java.util.concurrent.ConcurrentHashMap[Any, String]()
    // 10 live string keys, 4 live tuple keys, 6 foreign keys of both shapes
    (1 to 10).foreach(i => m.put(s"$app|dir$i", "live"))
    (1 to 4).foreach(i => m.put((s"$app|dir$i", i), "live-tuple"))
    (1 to 3).foreach(i => m.put(s"app-dead|dir$i", "foreign"))
    (1 to 3).foreach(i => m.put(("app-dead", i), "foreign-tuple"))
    assert(m.size === 20)
    StoredMemo.guard(m, "t", bound = 14, liveApp = Some(app))
    assert(m.size === 14)
    import scala.jdk.CollectionConverters._
    val survivors = m.asScala.values.toSeq
    assert(!survivors.contains("foreign") && !survivors.contains("foreign-tuple"),
      s"foreign keys must be the preferred victims, kept: ${m.keySet()}")
    assert(survivors.count(_ == "live") === 10 && survivors.count(_ == "live-tuple") === 4,
      "every live-session key (both shapes) must survive when evicting foreigners suffices")
  }

  test("stored() guards AFTER the insert: the cache steady-states at the bound") {
    val spark = SparkTestBase.spark
    val m = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val app = spark.sparkContext.applicationId
    (1 to 20).foreach(i => StoredMemo.stored(spark, m, "t", s"$app|k$i", bound = 8)(s"v$i"))
    assert(m.size <= 8, s"cache must steady-state at the bound, got ${m.size}")
  }

  test("dirTag is filesystem/table-safe and collision-resistant") {
    val a = StoredMemo.dirTag("/root/testdata/sf0.01")
    val b = StoredMemo.dirTag("/root/testdata/sf0.1")
    assert(a.matches("[A-Za-z0-9_]+"), s"tag must be identifier-safe: $a")
    assert(a !== b)
    // dirs that sanitize identically still get distinct tags (the MD5
    // suffix disambiguates — the math.abs(hashCode) scheme could not)
    assert(StoredMemo.dirTag("a/b") !== StoredMemo.dirTag("a_b"))
  }

  test("stored() bypasses the memo when the cold conf is set") {
    val spark = SparkTestBase.spark
    val m = new java.util.concurrent.ConcurrentHashMap[String, String]()
    var builds = 0
    def build(): String = { builds += 1; s"b$builds" }
    assert(StoredMemo.stored(spark, m, "t", "k")(build()) === "b1")
    assert(StoredMemo.stored(spark, m, "t", "k")(build()) === "b1", "warm: memo hit")
    spark.conf.set(StoredMemo.DisableConf, "true")
    try {
      assert(StoredMemo.stored(spark, m, "t", "k")(build()) === "b2", "cold: fresh build")
      assert(StoredMemo.stored(spark, m, "t", "k")(build()) === "b3", "cold: every call builds")
      assert(m.size === 1, "cold builds must not pollute the memo")
    } finally spark.conf.unset(StoredMemo.DisableConf)
    assert(StoredMemo.stored(spark, m, "t", "k")(build()) === "b1", "warm again: memo intact")
  }

  test("dirKey is session-scoped (applicationId rides in the key)") {
    val spark = SparkTestBase.spark
    val k = StoredMemo.dirKey(spark, "/some/dir")
    assert(k.contains(spark.sparkContext.applicationId))
    assert(k.endsWith("|/some/dir"))
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

  test("cold conf makes a serving path rebuild (and warm serves the stored one)") {
    val spark = SparkTestBase.spark
    val sf = SparkTestBase.sf
    val warm = graft.operators.Embeddings.bucketedOf(spark, sf)
    spark.conf.set(StoredMemo.DisableConf, "true")
    try {
      val cold = graft.operators.Embeddings.bucketedOf(spark, sf)
      assert(!(cold eq warm), "cold mode must build fresh")
    } finally spark.conf.unset(StoredMemo.DisableConf)
    assert(graft.operators.Embeddings.bucketedOf(spark, sf) eq warm,
      "warm path must still serve the stored artifact after a cold probe")
  }
}
