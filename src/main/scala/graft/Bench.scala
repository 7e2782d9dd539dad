package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, shiftright, sum, xxhash64}

/** Benchmark main. Prints one JSON line the driver records as BENCH_r{N}.
  *
  * Measurement rules (per round-1 verdict):
  *  - Full evaluation is forced with a `noop`-format write, so every
  *    projection/window actually executes — a bare `count()` would let
  *    Catalyst prune all unused columns and benchmark a parquet row count.
  *  - Each query runs twice and the SECOND time is reported: the first run
  *    absorbs JVM/codegen/broadcast warm-up, which otherwise lands on
  *    whichever query happens to iterate first.
  *
  * Calibration (per round-2 verdict): the machine the driver benches on is
  * shared, and a concurrent compile has inflated whole runs 2-8× before.
  * `calibration` / `calibration_end` time the SAME fixed, data-independent
  * in-memory aggregate (200M-row xxhash64 sum, zero I/O) before and after
  * the query sweep. Any consumer can normalize against a known-idle
  * calibration value or reject the run when the two disagree — query
  * numbers from a run whose calibration is k× the idle anchor are
  * machine-load artifacts, not code regressions (see BASELINE.md).
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

    // Fixed-cost probe: 200M synthetic rows, hash + sum, no I/O, no shuffle
    // beyond the final 1-row reduce. Constant work regardless of sfDir.
    def calibrate(): Double = {
      def one() = once("calibration", (s, _) =>
        // shift keeps per-row magnitude < 2^31 so the 200M-row ANSI sum
        // cannot overflow long
        s.range(0, 200000000L, 1, cpus.toInt)
          .select(sum(shiftright(xxhash64(col("id")), 32)).as("h")))
      // min-of-3 strips scheduler jitter; an idle machine's floor is
      // stable, a loaded one can't fake a low floor
      Seq.fill(3)(one()).min
    }

    calibrate()                              // warm-up, discarded
    val calStart = calibrate()

    val names = SparkEntry.queries.keys.toSeq.sorted
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      once(name, fn)                         // warm-up, discarded
      val sec = once(name, fn)               // measured
      // incremental stderr record: a truncated stdout JSON loses nothing
      System.err.println(s"[bench] $name=$sec")
      name -> sec
    }
    val calEnd = calibrate()
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","calibration":$calStart,"calibration_end":$calEnd,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
