package graft

import graft.crawl.{CrawlConfig, CrawlEngine}
import graft.fetch.SyntheticFetcher
import graft.frontier.Politeness
import graft.web.{SyntheticWeb, WebConfig}
import org.apache.spark.sql.SparkSession

/** Drive the crawl engine end-to-end from the CLI:
  * {{{ sbt "runMain graft.CrawlDemo [nHosts] [pagesPerHost] [cores]" }}}
  * Crawls the deterministic synthetic web, prints per-run stats and the
  * final table summaries. The bench harness reuses this path.
  */
object CrawlDemo {
  def main(args: Array[String]): Unit = {
    val nHosts = args.lift(0).map(_.toInt).getOrElse(8)
    val pages = args.lift(1).map(_.toInt).getOrElse(12)
    val cores = args.lift(2).getOrElse(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val budget = args.lift(3).map(_.toInt).getOrElse(16)
    val salts = args.lift(4).map(_.toInt).getOrElse(1)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-crawl-demo")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val webCfg = WebConfig(nHosts = nHosts, pagesPerHost = pages)
    val web = new SyntheticWeb(webCfg)
    val root = java.nio.file.Files.createTempDirectory("crawl-demo").toString
    val engine = new CrawlEngine(spark,
      CrawlConfig(root, Politeness(perHostBudget = budget, hostSalts = salts),
        // per-run AQE stays OFF unless explicitly requested (CrawlConfig
        // default; SPARK_GRAFT_AQE=true turns it back on for A/Bs)
        adaptivePerRun = sys.env.get("SPARK_GRAFT_AQE").contains("true")),
      new SyntheticFetcher(webCfg), web.robots)

    engine.seed(web.seeds)
    // jobs-per-run counter: micro-run cadence means per-run fixed cost
    // (mostly job count × scheduling floor) IS the e2e throughput
    val jobCount = new java.util.concurrent.atomic.AtomicLong(0L)
    val jobSites = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
    val jobMillis = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
    val inJobMillis = new java.util.concurrent.atomic.AtomicLong(0L)
    val jobStartMs = new java.util.concurrent.ConcurrentHashMap[Int, (String, java.lang.Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobCount.incrementAndGet()
        val site = j.stageInfos.lastOption.map(_.name.takeWhile(_ != '+').trim).getOrElse("?")
        jobSites.merge(site, 1L, (a, b) => a + b)
        jobStartMs.put(j.jobId, (site, java.lang.Long.valueOf(j.time)))
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val st = jobStartMs.remove(j.jobId)
        if (st != null) {
          val d = j.time - st._2.longValue()
          jobMillis.merge(st._1, d, (a, b) => a + b)
          inJobMillis.addAndGet(d) // jobs are serial in this driver loop
        }
      }
    })
    val t0 = System.nanoTime()
    def secsSoFar(t: Long): Double = (System.nanoTime() - t) / 1e9
    // per-run wall + job counts via crawlAll's instrumentation hook (the
    // engine keeps the one crawl loop: maxRuns cap + end-of-crawl Bloom
    // checkpoint flush, so resuming the printed root skips the rebuild)
    val stats = scala.collection.mutable.ArrayBuffer.empty[(graft.crawl.RunStats, Double, Long)]
    var jPrev = jobCount.get()
    engine.crawlAll { (s, wall) =>
      val jNow = jobCount.get()
      stats += ((s, wall, jNow - jPrev))
      jPrev = jNow
    }
    val secs = (System.nanoTime() - t0) / 1e9
    stats.foreach { case (s, w, j) =>
      println(f"run ${s.run}%2d: scheduled=${s.scheduled}%5d ok=${s.fetchedOk}%5d " +
        f"fail=${s.failed}%3d newImages=${s.newImages}%5d newCand=${s.newCandidates}%5d " +
        f"dedupDropped=${s.dedupDropped}%5d delay=${s.delayMsAfter}%6.1fms " +
        f"wall=${w}%5.2fs jobs=$j%3d")
    }
    // the listener bus delivers job-end events asynchronously — drain it
    // before reading the counters, or the last runs' jobs undercount
    // inJobMillis and overstate the printed driver gap. The public API
    // has no waitUntilEmpty, so poll until every observed job-start has
    // its matching end AND the counters hold still, bounded at 5 s
    // (ADVICE r04: a fixed 1 s sleep was best-effort on a slow bus)
    locally {
      val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
      var prev = -1L
      var stable = 0
      while (stable < 2 && System.nanoTime() < deadline) {
        Thread.sleep(50)
        val now = inJobMillis.get()
        if (jobStartMs.isEmpty && now == prev) stable += 1 else stable = 0
        prev = now
      }
    }
    import scala.jdk.CollectionConverters._
    jobSites.asScala.toSeq.sortBy(-_._2).foreach { case (site, n) =>
      val ms = Option(jobMillis.get(site)).map(_.longValue()).getOrElse(0L)
      println(f"JOBSITE $n%4d  ${ms / 1000.0}%7.2fs  $site")
    }
    println(f"DRIVER-GAP ${secsSoFar(t0) - inJobMillis.get() / 1000.0}%.2fs of " +
      f"${secsSoFar(t0)}%.2fs total is outside Spark jobs (planning, manifests, footers)")
    val fetched = stats.map(_._1.scheduled).sum
    println(f"TOTAL: $fetched fetches, ${engine.seenSet().size} distinct URLs, " +
      f"${engine.imageTable().map(_.count()).getOrElse(0L)} images in $secs%.1fs " +
      f"(${fetched / secs}%.1f urls/s) tables at $root")
    spark.stop()
  }
}
