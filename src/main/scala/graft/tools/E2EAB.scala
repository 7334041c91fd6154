package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved A/B harness for the MICRO-RUN fixed-cost floor (VERDICT
  * r04 #1): runs the toy e2e crawl (16×100, budget 200, salts 4) under
  * each (AQE, concurrent-prepare) combination, round-robin across reps in
  * ONE JVM, so every config sees the same minutes of co-tenant drift and
  * the same JIT-warm code. Single-shot toy readings move ±35% on this
  * time-shared host — config comparisons from separate sbt invocations
  * are noise (measured: the same code read 45-90 urls/s within an hour).
  *
  * Usage: runMain graft.tools.E2EAB [reps] [cores]
  */
object E2EAB {
  private def session(cores: String, aqe: Boolean): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-e2e-ab")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", aqe.toString)
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "2048")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val reps = args.lift(0).map(_.toInt).getOrElse(3)
    val cores = args.lift(1).getOrElse("32")
    val configs = Seq( // (label, adaptivePerRun, concurrentPrepare, windowsPerRun)
      ("aqe+seq", true, false, 1),
      ("aqe+conc", true, true, 1),
      ("noaqe+seq", false, false, 1),
      ("noaqe+conc", false, true, 1),
      ("noaqe+conc+w2", false, true, 2),
      ("noaqe+conc+w4", false, true, 4))
    val results = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (rep <- 1 to reps; (label, aqe, conc, waves) <- configs) {
      if (conc) sys.props.remove("graft.commit.sequentialPrepare")
      else sys.props("graft.commit.sequentialPrepare") = "true"
      val spark = session(cores, aqe = true) // session default; per-run mode below
      try {
        val (rate, n) = graft.Bench.benchCrawlE2E(spark, 16, 100, 200,
          adaptivePerRun = aqe, windowsPerRun = waves)
        println(f"E2E_TRIAL rep=$rep config=$label rate=$rate%.1f n=$n")
        results(label) = results(label) :+ rate
      } finally { spark.stop(); System.gc() }
    }
    configs.foreach { case (label, _, _, _) =>
      val rs = results(label).sorted
      if (rs.nonEmpty) {
        val med = rs(rs.size / 2)
        println(f"E2E_POINT config=$label best=${rs.last}%.1f median=$med%.1f " +
          s"reps=[${rs.map(r => f"$r%.1f").mkString(",")}]")
      }
    }
    sys.props.remove("graft.commit.sequentialPrepare")
  }
}
