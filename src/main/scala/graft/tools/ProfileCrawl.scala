package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev profiler: counts Spark jobs and wall time across a bench crawl so
  * micro-run fixed cost is attributable (NOT part of the driver contract). */
object ProfileCrawl {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val agg = new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = e.stageInfos.lastOption.map(_.name).getOrElse("?")
        starts.put(e.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val s = starts.remove(e.jobId)
        if (s != null) {
          val key = s._2.split(" at ").lastOption.getOrElse(s._2).take(60)
          agg.merge(key, (1L, System.nanoTime() - s._1),
            (a, b) => (a._1 + b._1, a._2 + b._2))
        }
      }
    })
    val (rate, n) = graft.Bench.benchCrawlE2E(spark, nHosts = 16, pagesPerHost = 100, budget = 200)
    println(f"E2E: $rate%.1f urls/s over $n urls")
    import scala.jdk.CollectionConverters._
    agg.asScala.toSeq.sortBy(-_._2._2).foreach { case (k, (cnt, ns)) =>
      println(f"${ns / 1e9}%8.2fs  x$cnt%-4d $k")
    }
    spark.stop()
  }
}
