package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Prints one JSON line the driver records as BENCH_r{N}.
  *
  * Measurement rules (per round-1 verdict):
  *  - Full evaluation is forced with a `noop`-format write, so every
  *    projection/window actually executes — a bare `count()` would let
  *    Catalyst prune all unused columns and benchmark a parquet row count.
  *  - Each query runs twice and the SECOND time is reported: the first run
  *    absorbs JVM/codegen/broadcast warm-up, which otherwise lands on
  *    whichever query happens to iterate first.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def once(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      once(name, fn)                       // warm-up, discarded
      name -> once(name, fn)               // measured
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
