package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic bench (guide §1.4): NOT part of the driver contract —
  * [[Bench]] stays the frozen measurement harness. This main isolates
  * individual declared queries: per query it captures
  * `.explain("formatted")` to a plans directory and times the same
  * `.count()` action the bench uses (best-of-N), plus a noop-sink pass
  * that computes every column (so projection-pruning can't hide work the
  * real result needs).
  *
  * Usage: runMain graft.BenchExtra <sfDir> <plansDir> [reps] [query...]
  */
object BenchExtra {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val plansDir = if (args.length > 1) args(1) else "/tmp/plans"
    val reps = if (args.length > 2) args(2).toInt else 3
    val wanted = args.drop(3).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession = Bench.session(cpus)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(plansDir))

    Tables.names.foreach(t => Tables.load(spark, sfDir, t).count())

    val names =
      if (wanted.nonEmpty) Bench.headline.filter(wanted) ++ wanted.filterNot(Bench.headline.contains)
      else Bench.headline
    // interleaved best-of-N, mirroring Bench.main's protocol
    val bestCount = scala.collection.mutable.LinkedHashMap(names.map(_ -> Double.MaxValue): _*)
    val bestNoop = scala.collection.mutable.LinkedHashMap(names.map(_ -> Double.MaxValue): _*)
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(java.nio.file.Paths.get(plansDir, s"$name.txt"), plan)
    }
    for (_ <- 1 to reps; name <- names) {
      spark.sparkContext.setJobDescription(s"count:$name")
      val (_, cs) = Bench.timed(SparkEntry.queries(name)(spark, sfDir).count())
      bestCount(name) = math.min(bestCount(name), cs)
      spark.sparkContext.setJobDescription(s"noop:$name")
      val (_, ns) = Bench.timed(
        SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save())
      bestNoop(name) = math.min(bestNoop(name), ns)
      spark.sparkContext.setJobDescription(null)
    }
    val qs = names.map(n => f""""$n":{"count":${bestCount(n)}%.3f,"noop":${bestNoop(n)}%.3f}""")
      .mkString("{", ",", "}")
    println(s"""{"metric":"extra","queries":$qs,"sf":"$sfDir","cores":$cpus}""")
    spark.stop()
  }
}
