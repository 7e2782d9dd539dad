package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off r14 diagnostic: phase timings + SPARK JOB COUNTS for the
  * round's optimization targets — st25's per-batch contraction, the
  * e07b quantized audit's legs, and the d37/d40 BPE passes. Job counts
  * matter because the contraction class is dominated by fixed per-job
  * overhead (many tiny convergence actions), which wall-clock alone
  * cannot attribute. Not part of any query path. */
object DiagR14 {
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

    val jobCount = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobCount.incrementAndGet(); ()
      }
    })

    def time[T](tag: String)(f: => T): T = {
      val j0 = jobCount.get()
      val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[diag] $tag%-38s $dt%8.3f s  jobs=${jobCount.get() - j0}")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    import graft.jobs.IncrementalIndex
    import graft.operators.{Embeddings, LlmText}
    import graft.streaming.AdAnalytics

    time("warm shared memos") {
      noop(LlmText.d03LshNeardup(spark, sfDir))
      noop(Embeddings.bucketedOf(spark, sfDir))
      noop(Embeddings.cellRanked(spark, sfDir))
      spark.range(1).count()
    }

    // ---- st25 ---------------------------------------------------
    time("st25 full (warm1)") { noop(AdAnalytics.st25StreamingClusters(spark, sfDir)) }
    time("st25 full (warm2)") { noop(AdAnalytics.st25StreamingClusters(spark, sfDir)) }
    locally {
      val mod = LlmText.IncrementalBatchMod
      val indexDir = java.nio.file.Files.createTempDirectory("diag14-st25-").toString
      time("st25.bootstrapFixture") { IncrementalIndex.writeClusterBootstrapFixture(spark, sfDir, indexDir) }
      val batch = graft.Tables.documents(spark, sfDir).where(col("doc_id") % mod === 0)
      time("st25.probeTextPairs") { IncrementalIndex.probeTextPairs(spark, batch, indexDir, Some(0L)).count() }
      time("st25.applyClusterBatch") { IncrementalIndex.applyClusterBatch(spark, batch, indexDir, 0L) }
      time("st25.resolve") { noop(IncrementalIndex.resolveClusterLabels(spark, indexDir)) }
      time("st25.resolve (2nd)") { noop(IncrementalIndex.resolveClusterLabels(spark, indexDir)) }
    }

    // ---- e07b legs ----------------------------------------------
    time("e07b full (warm1)") { noop(Embeddings.e07bRecallQuantized(spark, sfDir)) }
    time("e07b full (warm2)") { noop(Embeddings.e07bRecallQuantized(spark, sfDir)) }
    time("e12 standalone") { noop(Embeddings.e12IvfPqAdc(spark, sfDir)) }
    time("e13 standalone") { noop(Embeddings.e13ResidualPq(spark, sfDir)) }
    time("e14 standalone") { noop(Embeddings.e14SqRerank(spark, sfDir)) }
    time("e15 standalone") { noop(Embeddings.e15IvfSqRerank(spark, sfDir)) }
    time("e01 truth (memo-served)") { noop(Embeddings.e01KnnBrute(spark, sfDir)) }
    locally {
      val v = Embeddings.quantized(spark, sfDir)
      val ranked = Embeddings.cellRanked(spark, sfDir)
      val cb = time("e12.codebook (memo)") { Embeddings.pqCodebookOf(spark, v, "q") }
      time("e12.pqEncode corpus") {
        noop(Embeddings.pqEncode(spark,
          ranked.where(col("rn") === 1).select(col("cell"), col("vec_id"), col("q")),
          "q", cb))
      }
      val lohi = time("e14.lohi (memo)") { Embeddings.sqLohiOf(v) }
      time("e14.sqEncode corpus") { noop(Embeddings.sqEncode(v, lohi)) }
    }

    // ---- d37/d40/d43 --------------------------------------------
    time("d37 full") { noop(LlmText.d37BpePairs(spark, sfDir)) }
    time("d40 full") { noop(LlmText.d40BpeEncode(spark, sfDir)) }
    time("d43 full") { noop(LlmText.d43SpanCoverage(spark, sfDir)) }
    time("d44 full (post-fix)") { noop(LlmText.d44CrossdocSpans(spark, sfDir)) }
    time("d46 full") { noop(LlmText.d46KeepFirstSpans(spark, sfDir)) }
    time("e16 full") { noop(Embeddings.e16MmrDiversify(spark, sfDir)) }

    spark.stop()
  }
}
