package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.jobs.IncrementalIndex
import graft.operators.Embeddings

/** Fixture-bootstrap writers ≡ explicit batch writers over the same
  * subset — the parity the r13 streaming bootstraps lean on (their
  * scaladocs cite this spec): `writeTextIndexFixtureBootstrap`,
  * `writeGraphBootstrapFixture`, and `writeCellIndexFixture` derive
  * their bid=-1 partitions from in-JVM memos, and each must be
  * row-identical to the explicit writer fed the same document/vector
  * subset (r13 advisory item 1 — the equivalence was previously only
  * covered indirectly via StreamingSpec and the oracle gate). */
class FixtureParitySpec extends GraftSuite {

  private def assertSameRows(a: DataFrame, b: DataFrame, what: String): Unit = {
    val cols = a.columns.sorted.toIndexedSeq.map(col)
    val (x, y) = (a.select(cols: _*), b.select(cols: _*))
    assert(x.count() === y.count(), s"$what: row counts differ")
    assert(x.exceptAll(y).isEmpty, s"$what: fixture rows missing from explicit form")
    assert(y.exceptAll(x).isEmpty, s"$what: explicit rows missing from fixture form")
  }

  test("text bootstrap fixture ≡ explicit writeTextIndexBatch over the same docs") {
    val mod = operators.LlmText.IncrementalBatchMod
    val pred = col("doc_id") % mod =!= 0
    val fixDir = Files.createTempDirectory("graft-fixpar-text-f-").toString
    val expDir = Files.createTempDirectory("graft-fixpar-text-e-").toString
    IncrementalIndex.writeTextIndexFixtureBootstrap(spark, sf, fixDir, pred)
    IncrementalIndex.writeTextIndexBatch(spark,
      Tables.documents(spark, sf).where(pred), expDir, batchId = -1L)
    assertSameRows(
      spark.read.parquet(s"$fixDir/${IncrementalIndex.TextBands}/bid=-1"),
      spark.read.parquet(s"$expDir/${IncrementalIndex.TextBands}/bid=-1"),
      "text bands")
    assertSameRows(
      spark.read.parquet(s"$fixDir/${IncrementalIndex.TextShingles}/bid=-1"),
      spark.read.parquet(s"$expDir/${IncrementalIndex.TextShingles}/bid=-1"),
      "text shingles")
  }

  test("graph bootstrap fixture ≡ explicit LSH + descent writers over the same vecs") {
    val modE = Embeddings.IncrementalBatchModE
    val subset = Tables.embeddings(spark, sf).where(col("vec_id") % modE =!= 0)
    val fixDir = Files.createTempDirectory("graft-fixpar-graph-f-").toString
    val expDir = Files.createTempDirectory("graft-fixpar-graph-e-").toString
    IncrementalIndex.writeGraphBootstrapFixture(spark, sf, fixDir)
    IncrementalIndex.writeLshIndexBatch(spark, subset, expDir, batchId = -1L)
    IncrementalIndex.writeGraphBootstrapBatch(spark, subset, expDir)
    assertSameRows(
      spark.read.parquet(s"$fixDir/${IncrementalIndex.LshBuckets}/bid=-1"),
      spark.read.parquet(s"$expDir/${IncrementalIndex.LshBuckets}/bid=-1"),
      "lsh buckets")
    assertSameRows(
      spark.read.parquet(s"$fixDir/${IncrementalIndex.GraphEdges}/bid=-1"),
      spark.read.parquet(s"$expDir/${IncrementalIndex.GraphEdges}/bid=-1"),
      "bootstrap graph edges")
  }

  test("cell index fixture ≡ explicit writeCellIndex over the same vecs") {
    val modE = Embeddings.IncrementalBatchModE
    val all = Tables.embeddings(spark, sf)
    val subset = all.where(col("vec_id") % modE =!= 0)
    val fixDir = Files.createTempDirectory("graft-fixpar-cell-f-").toString
    val expDir = Files.createTempDirectory("graft-fixpar-cell-e-").toString
    IncrementalIndex.writeCellIndexFixture(spark, sf, fixDir)
    IncrementalIndex.writeCellIndex(spark, subset, expDir, centroidTrain = Some(all))
    assertSameRows(
      spark.read.parquet(s"$fixDir/${IncrementalIndex.CellCentroids}"),
      spark.read.parquet(s"$expDir/${IncrementalIndex.CellCentroids}"),
      "cell centroids")
    assertSameRows(
      spark.read.parquet(s"$fixDir/${IncrementalIndex.CellMembers}"),
      spark.read.parquet(s"$expDir/${IncrementalIndex.CellMembers}"),
      "cell members")
  }
}
