package graft

/** Two-parallelism scaling evidence (north rule: ≥0.8 throughput scaling
  * efficiency from N to 4N executors; in this sandbox N and 4N executor
  * *cores* — local[8] vs local[32] — per the driver's instruction).
  *
  * Runs the same stage benches at both parallelism levels in one JVM
  * (separate SparkSessions) and writes the markdown evidence table to
  * BENCH.md. Efficiency = (rate_32 / rate_8) / 4.
  */
object ScalingBench {

  final case class Point(cores: Int, fetch: Double, dedup: Double, images: Double)

  def runAt(cores: Int, fetchN: Long, candN: Long, seenN: Long, imgN: Long): Point = {
    val spark = Bench.session(cores.toString)
    try {
      // warm the JIT/codegen paths once with a small slice
      Bench.benchFetchParse(spark, 10000)
      val f = Bench.benchFetchParse(spark, fetchN)
      val d = Bench.benchDedup(spark, candN, seenN)
      val i = Bench.benchImages(spark, imgN)
      Point(cores, f, d, i)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val fetchN = args.lift(0).map(_.toLong).getOrElse(512L * 1024)
    val candN = args.lift(1).map(_.toLong).getOrElse(4L * 1024 * 1024)
    val imgN = args.lift(2).map(_.toLong).getOrElse(20000L)

    val p8 = runAt(8, fetchN, candN, candN / 2, imgN)
    val p32 = runAt(32, fetchN, candN, candN / 2, imgN)

    def eff(a: Double, b: Double): Double = (b / a) / 4.0
    val effF = eff(p8.fetch, p32.fetch)
    val effD = eff(p8.dedup, p32.dedup)
    val effI = eff(p8.images, p32.images)

    val md =
      f"""# BENCH — measured throughput + scaling evidence
         |
         |Environment: single JVM, Spark 4.1.2 local mode (no real cluster in
         |this sandbox); N vs 4N **executor cores** = `local[8]` vs `local[32]`
         |per the driver instruction. Same inputs at both levels; inputs are
         |generated lazily from `spark.range` (nothing materialized — the
         |10^10-frontier scale path). Efficiency = (rate_32 / rate_8) / 4.
         |
         || stage | local[8] (rows/s) | local[32] (rows/s) | scaling efficiency |
         ||---|---|---|---|
         || fetch+parse (${fetchN} URLs) | ${p8.fetch}%,.0f | ${p32.fetch}%,.0f | $effF%.2f |
         || frontier dedup (${candN} cand vs ${candN / 2} seen) | ${p8.dedup}%,.0f | ${p32.dedup}%,.0f | $effD%.2f |
         || image payload+phash (${imgN}) | ${p8.images}%,.0f | ${p32.images}%,.0f | $effI%.2f |
         |
         |Stage definitions: fetch+parse = pre-planned frontier slice through
         |the fetch `mapPartitions` + Catalyst link parse; dedup = candidates
         |through Bloom-block prefilter + exact anti-join (steady-state index,
         |built outside the timed window); image = deterministic codec encode
         |+ decode + 64-bit phash.
         |
         |Reference single-node comparison (BASELINE.md): the reference crawler
         |processes 2-4 records/sec end-to-end on 2 vCPU and its theoretical
         |16-worker ceiling is ~32 req/s; the table above is the same-machine
         |simulated-fetch path (no network wait), so the honest comparison is
         |architectural: per-core fetch throughput here is bounded by parse
         |CPU, not by a global rate-limiter lock.
         |""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH.md"), md)
    println(md)
  }
}
