package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off r13 A/B: do the streaming probes/builds run single-task
  * because their batch inputs are narrow (one parquet split)? Times
  * each heavy derivation with the raw input vs a spread input. */
object DiagSpread {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.jobs.Jobs.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[diag] $tag%-36s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    import graft.jobs.IncrementalIndex
    import graft.operators.{Embeddings, LlmText}
    val docs = graft.Tables.documents(spark, sfDir)
    val vecs = graft.Tables.embeddings(spark, sfDir)
    println(s"[diag] documents scan parts = ${docs.rdd.getNumPartitions}")
    println(s"[diag] embeddings scan parts = ${vecs.rdd.getNumPartitions}")

    val modE = Embeddings.IncrementalBatchModE
    val corpusRaw = vecs.where(col("vec_id") % modE =!= 0)
    val corpusSpread = corpusRaw.repartition(32)
    // JIT warm-up pass, discarded
    noop(Embeddings.quantizedFrom(spark, corpusSpread))
    locally {
      val idx = java.nio.file.Files.createTempDirectory("diag-ab1-").toString
      time("st22.bootstrap RAW (1)") { IncrementalIndex.writeGraphBootstrapBatch(spark, corpusRaw, idx) }
      time("st22.bootstrap RAW (2)") { IncrementalIndex.writeGraphBootstrapBatch(spark, corpusRaw, idx) }
    }
    locally {
      val idx = java.nio.file.Files.createTempDirectory("diag-ab2-").toString
      time("st22.bootstrap SPREAD (1)") { IncrementalIndex.writeGraphBootstrapBatch(spark, corpusSpread, idx) }
      time("st22.bootstrap SPREAD (2)") { IncrementalIndex.writeGraphBootstrapBatch(spark, corpusSpread, idx) }
    }
    val mod = LlmText.ContaminationMod
    val bench = docs.where(col("doc_id") % mod === 0)
    val batchRaw = docs.where(col("doc_id") % mod =!= 0)
    val batchSpread = batchRaw.repartition(32)
    locally {
      val idx = java.nio.file.Files.createTempDirectory("diag-ab3-").toString
      IncrementalIndex.writeBenchIndex(spark, bench, idx)
      IncrementalIndex.writeBloomIndex(spark, bench, idx,
        graft.functions.BloomFilter.DefaultBits, graft.functions.BloomFilter.DefaultK)
      time("st23.probe RAW (1)") { noop(IncrementalIndex.probeBenchBloom(spark, batchRaw, idx)) }
      time("st23.probe RAW (2)") { noop(IncrementalIndex.probeBenchBloom(spark, batchRaw, idx)) }
      time("st23.probe SPREAD (1)") { noop(IncrementalIndex.probeBenchBloom(spark, batchSpread, idx)) }
      time("st23.probe SPREAD (2)") { noop(IncrementalIndex.probeBenchBloom(spark, batchSpread, idx)) }
      time("st17.probe RAW") { noop(IncrementalIndex.probeBench(spark, batchRaw, idx)) }
      time("st17.probe SPREAD") { noop(IncrementalIndex.probeBench(spark, batchSpread, idx)) }
    }
    spark.stop()
  }
}
