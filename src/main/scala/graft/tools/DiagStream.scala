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
    time("st13 full (warm1)") { noop(AdAnalytics.st13StreamingIngest(spark, sfDir)) }
    time("st13 full (warm2)") { noop(AdAnalytics.st13StreamingIngest(spark, sfDir)) }
    time("st19 full (warm1)") { noop(AdAnalytics.st19StreamingSubstrIngest(spark, sfDir)) }
    time("st19 full (warm2)") { noop(AdAnalytics.st19StreamingSubstrIngest(spark, sfDir)) }
    time("st25 full (warm1)") { noop(AdAnalytics.st25StreamingClusters(spark, sfDir)) }
    time("st25 full (warm2)") { noop(AdAnalytics.st25StreamingClusters(spark, sfDir)) }
    locally {
      val mod = LlmText.IncrementalBatchMod
      val indexDir = java.nio.file.Files.createTempDirectory("diag2-st25-").toString
      time("st25.bootstrapFixture") { IncrementalIndex.writeClusterBootstrapFixture(spark, sfDir, indexDir) }
      val batch = graft.Tables.documents(spark, sfDir).where(col("doc_id") % mod === 0)
      time("st25.probeTextPairs") { IncrementalIndex.probeTextPairs(spark, batch, indexDir, Some(0L)).count() }
      time("st25.applyClusterBatch") { IncrementalIndex.applyClusterBatch(spark, batch, indexDir, 0L) }
      time("st25.resolve") { noop(IncrementalIndex.resolveClusterLabels(spark, indexDir)) }
    }
    locally {
      val mod = LlmText.IncrementalBatchMod
      val indexDir = java.nio.file.Files.createTempDirectory("diag2-st13-").toString
      time("st13.bootstrapFixture") { IncrementalIndex.writeTextIndexFixtureBootstrap(spark, sfDir, indexDir, col("doc_id") % mod =!= 0) }
      val batch = graft.Tables.documents(spark, sfDir).where(col("doc_id") % mod === 0)
      time("st13.probeText") { noop(IncrementalIndex.probeText(spark, batch, indexDir, Some(0L))) }
      time("st13.appendBatch") { IncrementalIndex.writeTextIndexBatch(spark, batch, indexDir, 0L) }
    }
    locally {
      val indexDir = java.nio.file.Files.createTempDirectory("diag2-st19-").toString
      val docs = graft.Tables.documents(spark, sfDir)
      time("st19.writeSubstrBatch") { IncrementalIndex.writeSubstrIndexBatch(spark, docs, indexDir, 0L) }
      time("st19.probeSubstrSpans") { noop(IncrementalIndex.probeSubstrSpans(spark, indexDir)) }
    }

    spark.stop()
  }
}
