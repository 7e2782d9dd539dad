package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off r13 diagnostic: phase timings for the heavy streaming
  * lifecycle harnesses (st22/st23/st25) — store build vs stream vs
  * readout. Not part of any query path. */
object DiagStream {
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
      val t0 = System.nanoTime()
      val r = f
      println(f"[diag] $tag%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    import graft.jobs.IncrementalIndex
    import graft.operators.{Embeddings, LlmText}
    import graft.streaming.AdAnalytics

    // warm the shared memos once so phase reads are warm-path
    time("warm shared memos") {
      noop(LlmText.d03LshNeardup(spark, sfDir))
      noop(Embeddings.bucketedOf(spark, sfDir))
      spark.range(1).count()
    }

    // full-query warm passes
    time("st22 full (warm1)") { noop(AdAnalytics.st22StreamingGraphIngest(spark, sfDir)) }
    time("st22 full (warm2)") { noop(AdAnalytics.st22StreamingGraphIngest(spark, sfDir)) }
    time("st23 full (warm1)") { noop(AdAnalytics.st23StreamingBloom(spark, sfDir)) }
    time("st23 full (warm2)") { noop(AdAnalytics.st23StreamingBloom(spark, sfDir)) }
    time("st25 full (warm1)") { noop(AdAnalytics.st25StreamingClusters(spark, sfDir)) }
    time("st25 full (warm2)") { noop(AdAnalytics.st25StreamingClusters(spark, sfDir)) }

    // ---- st22 phases
    {
      val modE = Embeddings.IncrementalBatchModE
      val indexDir = java.nio.file.Files.createTempDirectory("diag-st22-").toString
      val vecs = graft.Tables.embeddings(spark, sfDir)
      val corpus = vecs.where(col("vec_id") % modE =!= 0)
      time("st22.writeLshIndexBatch") { IncrementalIndex.writeLshIndexBatch(spark, corpus, indexDir, -1L) }
      time("st22.writeGraphBootstrap") { IncrementalIndex.writeGraphBootstrapBatch(spark, corpus, indexDir) }
      val batch = vecs.where(col("vec_id") % modE === 0)
      val edges = time("st22.probeGraphInsert") { IncrementalIndex.probeGraphInsert(spark, batch, indexDir, Some(0L)) }
      time("st22.appendBatch") {
        IncrementalIndex.writeLshIndexBatch(spark, batch, indexDir, 0L)
        IncrementalIndex.writeGraphEdgesBatch(spark, edges, indexDir, 0L)
      }
    }
    // ---- st23 phases
    {
      import graft.functions.BloomFilter
      val mod = LlmText.ContaminationMod
      val indexDir = java.nio.file.Files.createTempDirectory("diag-st23-").toString
      val docs = graft.Tables.documents(spark, sfDir)
      val bench = docs.where(col("doc_id") % mod === 0)
      time("st23.writeBenchIndex") { IncrementalIndex.writeBenchIndex(spark, bench, indexDir) }
      time("st23.writeBloomIndex") { IncrementalIndex.writeBloomIndex(spark, bench, indexDir, BloomFilter.DefaultBits, BloomFilter.DefaultK) }
      val batch = docs.where(col("doc_id") % mod =!= 0)
      time("st23.probeBenchBloom") { noop(IncrementalIndex.probeBenchBloom(spark, batch, indexDir)) }
    }
    // ---- st25 phases
    {
      val mod = LlmText.IncrementalBatchMod
      val indexDir = java.nio.file.Files.createTempDirectory("diag-st25-").toString
      time("st25.writeClusterBootstrapFix") { IncrementalIndex.writeClusterBootstrapFixture(spark, sfDir, indexDir) }
      val batch = graft.Tables.documents(spark, sfDir).where(col("doc_id") % mod === 0)
      time("st25.applyClusterBatch") { IncrementalIndex.applyClusterBatch(spark, batch, indexDir, 0L) }
      time("st25.resolveClusterLabels") { noop(IncrementalIndex.resolveClusterLabels(spark, indexDir)) }
    }
    spark.stop()
  }
}
