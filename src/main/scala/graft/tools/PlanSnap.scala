package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Per-query formatted-plan snapshots for the optimization rounds:
  * writes `<outDir>/<query>_<tag>.txt` (the `.explain("formatted")`
  * output) for each named query — the before/after plan evidence the
  * round's judge checks optimization claims against. Usage:
  * `sbt "runMain graft.tools.PlanSnap <tag> <q1,q2,...> [sfDir] [outDir]"`.
  *
  * Runs on the bench's session shape (local, shuffle.partitions=32,
  * graft extensions) so the dumped plan is the one the bench executes,
  * not ExplainDump's 4-core docs variant. */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanSnap <tag> <q1,q2,...> [sfDir] [outDir]")
    val tag = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(3).getOrElse("plans/r13")
    val spark = graft.jobs.Jobs.configure(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          val plan = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val f = Paths.get(outDir, s"${name}_$tag.txt")
          Files.writeString(f, plan)
          println(s"[plansnap] wrote $f")
        case None => System.err.println(s"[plansnap] unknown query: $name")
      }
    }
    spark.stop()
  }
}
