package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off r13 A/B: q01's single-row-group scan vs spread input. */
object DiagQ01 {
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
      println(f"[diag] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")
    def money(c: org.apache.spark.sql.Column) = round(c, 2).cast("double")
    def aggOf(in: org.apache.spark.sql.DataFrame) = in
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        money(sum(dec(col("l_quantity")))).as("sum_qty"),
        money(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
        money(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
    val raw = graft.Tables.lineitem(spark, sfDir)
    val spreadIn = raw.select(col("l_returnflag"), col("l_linestatus"),
      col("l_quantity"), col("l_extendedprice"), col("l_discount")).repartition(32)
    noop(aggOf(raw)) // warm
    for (i <- 1 to 3) time(s"q01 RAW ($i)") { noop(aggOf(raw)) }
    for (i <- 1 to 3) time(s"q01 SPREAD ($i)") { noop(aggOf(spreadIn)) }
    spark.stop()
  }
}
