package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off r13 diagnostic for the d33/d48 sparse-retrieval pair: prints
  * the stored-postings partition count and times each phase against the
  * noop sink (guide §1.4). Not part of any query path. */
object DiagSparse {
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

    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[diag] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    import graft.operators.LlmText
    // build + warm the memo first so phase timings are warm-path
    time("postings build (cold)") {
      noop(LlmText.storedPostings(spark, sfDir))
    }
    val wts = LlmText.storedPostings(spark, sfDir)
    println(s"[diag] postings partitions = ${wts.rdd.getNumPartitions}, rows = ${wts.count()}")
    time("postings noop (warm)") { noop(wts) }
    time("norms") { noop(graft.operators.LlmText.sparseNormsOf(wts)) }
    time("d33 full (warm 1)") { noop(LlmText.d33SparseCosine(spark, sfDir)) }
    time("d33 full (warm 2)") { noop(LlmText.d33SparseCosine(spark, sfDir)) }
    time("d48 full (warm)") { noop(LlmText.d48TombstoneSparse(spark, sfDir)) }
    // dots-only probe: the ranking core minus the window
    import org.apache.spark.sql.functions._
    val qw = wts.where(col("doc_id") % LlmText.SparseQMod === 0)
      .select(col("term"), col("doc_id").as("query_id"), col("w").as("wq"))
    val cw = wts.select(col("term"), col("doc_id").as("cand_id"), col("w").as("wc"))
    val dots = graft.operators.SelfJoin.on(qw, cw, Seq("term"))
      .where(col("query_id") =!= col("cand_id"))
      .groupBy(col("query_id"), col("cand_id"))
      .agg(sum(col("wq") * col("wc")).as("dot"))
    time("dots only (warm 1)") { noop(dots) }
    time("dots only (warm 2)") { noop(dots) }
    spark.stop()
  }
}
