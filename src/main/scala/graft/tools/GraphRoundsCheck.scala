package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Engaged-lever read for the stored kNN graph (`spark.graft.nnd
  * .rounds`): recall@3 of the round-R NN-Descent graph against the e01
  * brute-force truth, for R = 1, 2, 3, plus each build's wall time —
  * the d33 drift-watch discipline (BASELINE.md records the numbers per
  * round so the iterate's convergence story is measured, not claimed).
  * Rounds compose through [[graft.operators.Embeddings.graphOf]]'s
  * fresh builder (memo bypassed per R by keying on R), so each line
  * prices one full build of that depth. */
object GraphRoundsCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = graft.jobs.Jobs.configure(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    s.sparkContext.setLogLevel("WARN")
    val truth = graft.operators.Embeddings.e01KnnBrute(s, dir)
      .where(col("rank") <= 3)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val denom = truth.values.map(_.size).sum
    // warm the shared stored inputs (quantized column + LSH bucket
    // table) OUTSIDE the timers: round 1 would otherwise pay the
    // one-time memo builds that rounds 2/3 reuse, making the per-depth
    // build prices incomparable (round-12 review finding). The descent
    // itself is NOT memoized here (nnDescentRounds is the fresh
    // builder), so each timed line prices exactly one R-round iterate.
    graft.operators.Embeddings
      .nnDescentRounds(s, dir, 1, graft.operators.Embeddings.DefaultNndRevCap)
      .count()
    for (rounds <- 1 to 3) {
      val t0 = System.nanoTime()
      val edges = graft.operators.Embeddings
        .nnDescentRounds(s, dir, rounds, graft.operators.Embeddings.DefaultNndRevCap)
        .select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val secs = (System.nanoTime() - t0) / 1e9
      val by = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val hits = truth.toSeq.map { case (q, t) =>
        by.get(q).map(n => (n & t).size).getOrElse(0)
      }.sum
      println(f"[graph-rounds] rounds=$rounds recall@3 = $hits/$denom = ${hits.toDouble / denom}%.4f  build ${secs}%.1f s")
    }
    s.stop()
  }
}
