package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off r13 micro-bench of the Bloom membership probe expression:
  * where does the ~70 µs/row go? Times the probe over a synthetic
  * long-string column at several expression shapes. */
object DiagBloom {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.jobs.Jobs.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.BloomFilter
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[diag] $tag%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val bits = BloomFilter.DefaultBits
    val k = BloomFilter.DefaultK
    val n = 2000000L
    val df = spark.range(0, n, 1, 32)
      .select(concat(lit("shingle token text "), col("id")).as("shingle"))
    val keys = spark.range(0, 1000, 1, 4)
      .select(concat(lit("bench key "), col("id")).as("shingle"))
    val words = BloomFilter.buildWords(keys, "shingle", bits, k)

    noop(df) // warm
    time("baseline scan (no filter)") { noop(df) }
    time("xxhash64 filter only") { noop(df.where(pmod(xxhash64(col("shingle")), lit(1L << 60)) > 0)) }
    time("mightContain k=7 (1)") { noop(df.where(BloomFilter.mightContain(words, col("shingle"), bits, k))) }
    time("mightContain k=7 (2)") { noop(df.where(BloomFilter.mightContain(words, col("shingle"), bits, k))) }
    time("mightContain k=1") { noop(df.where(BloomFilter.mightContain(words, col("shingle"), bits, 1))) }
    // variant: no struct wrapper — h1/h2 inline per probe (optimizer
    // may be doing this anyway via SimplifyExtractValueOps)
    val w = typedLit(words)
    def h1(x: org.apache.spark.sql.Column) = pmod(xxhash64(x), lit(1L << 60))
    def h2(x: org.apache.spark.sql.Column) =
      pmod(xxhash64(lit("graft-bloom-h2"), x), lit(1L << 31)).bitwiseOR(lit(1L))
    val x = col("shingle")
    val inline = (0 until k).map { i =>
      val p = pmod(h1(x) + lit(i.toLong) * h2(x), lit(bits.toLong))
      element_at(w, shiftright(p, 6).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L), pmod(p, lit(64L)).cast("int"))) =!= lit(0L)
    }.reduce(_ && _)
    time("inline h1/h2 k=7") { noop(df.where(inline)) }
    // node isolation
    time("h2 only (2-arg xxhash)") {
      noop(df.where(h2(x) > 0))
    }
    time("element_at(w, const)") {
      noop(df.where(element_at(w, (pmod(xxhash64(x), lit(8192L))).cast("int") + 1) =!= lit(123L)))
    }
    time("shiftleft call") {
      noop(df.where(call_function("shiftleft", lit(1L),
        pmod(xxhash64(x), lit(64L)).cast("int")) =!= lit(0L)))
    }
    time("pmod(h1+h2) no element_at") {
      noop(df.where(pmod(h1(x) + h2(x), lit(bits.toLong)) > 0))
    }
    spark.stop()
  }
}
