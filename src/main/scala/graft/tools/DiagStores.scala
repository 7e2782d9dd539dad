package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off r13 diagnostic: partition counts of every in-JVM stored
  * artifact that downstream queries fan out over — hunting the
  * AQE-coalesced single-partition checkpoint layout (see
  * [[graft.StoredMemo.storeParts]]). Not part of any query path. */
object DiagStores {
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

    def show(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit =
      try {
        val d = df
        println(f"[diag] $tag%-28s parts=${d.rdd.getNumPartitions}%4d rows=${d.count()}")
      } catch { case e: Throwable => println(s"[diag] $tag FAILED: ${e.getMessage}") }

    import graft.operators.{Embeddings, LlmText, Sessions}
    show("postings (d33)") { LlmText.storedPostings(spark, sfDir) }
    show("quantized (e-suite)") { Embeddings.quantized(spark, sfDir) }
    show("bucketedOf (e02)") { Embeddings.bucketedOf(spark, sfDir) }
    show("bruteRankedOf (e01)") { Embeddings.bruteRankedOf(spark, sfDir) }
    show("graphOf (e22/e23)") { Embeddings.graphOf(spark, sfDir, 1, Embeddings.DefaultNndRevCap) }
    show("cellRanked (e05 ivf)") { Embeddings.cellRanked(spark, sfDir) }
    show("d03 pairs") { LlmText.d03LshNeardup(spark, sfDir) }
    show("base docs") { LlmText.base(spark, sfDir) }
    show("sessionized") { Sessions.sessionized(spark, sfDir) }
    spark.stop()
  }
}
