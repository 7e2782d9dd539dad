package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.jobs.IncrementalIndex
import graft.operators.Embeddings

/** The persisted PQ half of the incremental index: trained codebook +
  * 4-byte code rows stored beside cell_members, and the explicit
  * codebook-retrain event. The stored tables must be byte-identical to
  * the in-query e12 machinery (one shared definition), or a served ADC
  * scan and the oracle-pinned query could rank differently.
  */
class PqIndexSpec extends GraftSuite {

  test("stored PQ codebook and codes equal the in-query e12 quantizer") {
    val tmp = Files.createTempDirectory("graft-pq-").toString
    val all = Tables.embeddings(spark, sf)
    IncrementalIndex.writeCellIndex(spark, all, tmp)
    IncrementalIndex.writePqIndex(spark, all, all, tmp)
    val v = Embeddings.quantizedFrom(spark, all)
    val expectCb = Embeddings.pqCodebookOf(spark, v, "q")
      .collect().map(_.toString).sorted.toSeq
    val gotCb = spark.read.parquet(s"$tmp/${IncrementalIndex.PqCodebook}")
      .collect().map(_.toString).sorted.toSeq
    assert(gotCb.nonEmpty && gotCb === expectCb)
    val members = Embeddings.assignRanked(spark, v,
        spark.read.parquet(s"$tmp/${IncrementalIndex.CellCentroids}"))
      .where(col("rn") === 1).select(col("cell"), col("vec_id"), col("q"))
    val expectCodes = Embeddings.pqEncode(spark, members, "q",
        spark.read.parquet(s"$tmp/${IncrementalIndex.PqCodebook}"))
      .withColumnRenamed("neighbor_id", "vec_id")
      .collect().map(_.toString).sorted.toSeq
    val gotCodes = spark.read.parquet(s"$tmp/${IncrementalIndex.PqCodes}")
      .collect().map(_.toString).sorted.toSeq
    assert(gotCodes.length === all.count() && gotCodes === expectCodes)
  }

  test("stored SQ quantizer and codes equal the in-query e14 encode") {
    val tmp = Files.createTempDirectory("graft-sq-").toString
    val all = Tables.embeddings(spark, sf)
    IncrementalIndex.writeSqIndex(spark, all, all, tmp)
    val v = Embeddings.quantizedFrom(spark, all)
    val expectLohi = Embeddings.sqLohiOf(v)
      .collect().map(_.toString).toSeq
    val gotLohi = spark.read.parquet(s"$tmp/${IncrementalIndex.SqQuantizer}")
      .collect().map(_.toString).toSeq
    assert(gotLohi.length === 1 && gotLohi === expectLohi)
    val expectCodes = Embeddings.sqEncode(v.select(col("vec_id"), col("q")),
        spark.read.parquet(s"$tmp/${IncrementalIndex.SqQuantizer}"))
      .select(col("vec_id"), col("codes"))
      .collect().map(_.toString).sorted.toSeq
    val gotCodes = spark.read.parquet(s"$tmp/${IncrementalIndex.SqCodes}")
      .select(col("vec_id"), col("codes"))
      .collect().map(_.toString).sorted.toSeq
    assert(gotCodes.length === all.count() && gotCodes === expectCodes)
    // every stored code is an 8-bit level — the byte-packable contract
    val levels = spark.read.parquet(s"$tmp/${IncrementalIndex.SqCodes}")
      .select(explode(col("codes")).as("c"))
      .agg(min(col("c")), max(col("c"))).collect()(0)
    assert(levels.getLong(0) >= 0L && levels.getLong(1) <= 255L)
    // an APPEND ingest folds a new batch's codes into the store
    val day2 = all.where(col("vec_id") % 7 === 0)
    IncrementalIndex.encodeSqMembers(spark, day2, tmp)
    val n = spark.read.parquet(s"$tmp/${IncrementalIndex.SqCodes}").count()
    assert(n === all.count() + day2.count())
  }

  test("retrainPq swaps the frozen codebook and re-encodes the corpus wholesale") {
    val tmp = Files.createTempDirectory("graft-pq-retrain-").toString
    val all = Tables.embeddings(spark, sf)
    val day1 = all.where(col("vec_id") % 3 =!= 0)
    IncrementalIndex.writeCellIndex(spark, all, tmp)
    // day-1 codebook trains on the day-1 slice only
    IncrementalIndex.writePqIndex(spark, day1, day1, tmp)
    val cbBefore = spark.read.parquet(s"$tmp/${IncrementalIndex.PqCodebook}")
      .collect().map(_.toString).sorted.toSeq
    val codesBefore = spark.read.parquet(s"$tmp/${IncrementalIndex.PqCodes}")
    assert(codesBefore.count() === day1.count())
    // the retrain event: train on the grown corpus, re-encode everything
    IncrementalIndex.retrainPq(spark, all, all, tmp)
    val cbAfter = spark.read.parquet(s"$tmp/${IncrementalIndex.PqCodebook}")
      .collect().map(_.toString).sorted.toSeq
    assert(cbAfter !== cbBefore, "retraining on a grown corpus must move the codebook")
    assert(cbAfter.length === cbBefore.length, "codebook stays PqM x PqK")
    val codesAfter = spark.read.parquet(s"$tmp/${IncrementalIndex.PqCodes}")
    assert(codesAfter.count() === all.count(), "codes rebuilt for the full corpus")
    // re-encode is consistent: stored codes equal a fresh encode of the
    // corpus against the NEW stored codebook
    val v = Embeddings.quantizedFrom(spark, all)
    val members = Embeddings.assignRanked(spark, v,
        spark.read.parquet(s"$tmp/${IncrementalIndex.CellCentroids}"))
      .where(col("rn") === 1).select(col("cell"), col("vec_id"), col("q"))
    val expect = Embeddings.pqEncode(spark, members, "q",
        spark.read.parquet(s"$tmp/${IncrementalIndex.PqCodebook}"))
      .withColumnRenamed("neighbor_id", "vec_id")
      .collect().map(_.toString).sorted.toSeq
    assert(codesAfter.collect().map(_.toString).sorted.toSeq === expect)
  }

  test("ADC recall with the trained codebook is non-decreasing vs the r7 seed codebook") {
    // r7's untrained (PqK-smallest-id) codebook recorded 69/300 for
    // ivf_pq_adc and 70/300 for residual_pq on this fixture; training
    // must never pay recall for compression (the whole point of Lloyd)
    val hits = Embeddings.e07bRecallQuantized(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(hits("ivf_pq_adc") >= 69L,
      s"trained PQ ADC recall regressed below the r7 seed record: ${hits("ivf_pq_adc")}")
    assert(hits("residual_pq") >= 70L,
      s"trained residual PQ recall regressed below the r7 seed record: ${hits("residual_pq")}")
  }
}
