package graft.crawl

import graft.fetch.{FetchStage, Fetcher}
import graft.frontier.{BloomDedup, Politeness, Scheduler}
import graft.functions.UrlFunctions._
import graft.images.ImageKit
import graft.model._
import graft.table.SnapshotTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Engine configuration. `SeqBase` bounds: the hierarchical sequence code
  * `child = parent*64 + linkIdx + 1` stays unique while hosts < 64,
  * links/page < 63 and depth ≤ 9 — ample for the synthetic web; at true
  * web scale the code widens to two longs (documented tradeoff). */
final case class CrawlConfig(
    tableRoot: String,
    politeness: Politeness = Politeness(),
    maxRetries: Int = 3,
    useBloom: Boolean = true,
    bloomBuckets: Int = 16,
    maxRuns: Int = 64)

final case class RunStats(
    run: Long, scheduled: Long, fetchedOk: Long, failed: Long,
    newImages: Long, newCandidates: Long, dedupDropped: Long,
    delayMsAfter: Double)

/** The micro-run crawl engine (SURVEY.md §3.1 lifecycle, §7.1 step 8).
  *
  * State lives in four append-only [[SnapshotTable]]s (Iceberg-emulated,
  * §7.4) so a crashed run resumes from the last committed snapshot:
  *
  *  - `frontier`: discovered candidates (url, hash, host, path, priority,
  *     depth, seq) — the canonical sequence code `seq` defines the
  *     reference-equivalent total crawl order (§3.1: page asc, row asc ⇒
  *     here: lexicographic (parent, linkIdx) code, ascending);
  *  - `fetchlog`: one row per attempt; the URL-seen set is its distinct
  *     `url_hash` (successes ∪ tracked failures, fpds_high_performance
  *     .py:315-336), and retry eligibility derives from the latest
  *     attempt per url (R6);
  *  - `images`: the payload table in the `input_hint` schema;
  *  - run metrics + per-partition lineage ride on every commit.
  *
  * Per micro-run: pending = (frontier ∖ seen) ∪ retryable → robots gate +
  * per-host priority window + deterministic politeness plan → fetch
  * `mapPartitions` → Catalyst parse (regexp_extract_all + canonical_url
  * expression) → image payload fetch → dedup'd appends. The adaptive
  * delay controller (R2) feeds observed success rates into the next run's
  * schedule.
  */
class CrawlEngine(spark: SparkSession, cfg: CrawlConfig, fetcher: Fetcher,
                  robotsRules: Seq[RobotsRule]) {
  import spark.implicits._

  val frontier = new SnapshotTable(spark, s"${cfg.tableRoot}/frontier")
  val fetchlog = new SnapshotTable(spark, s"${cfg.tableRoot}/fetchlog")
  val images = new SnapshotTable(spark, s"${cfg.tableRoot}/images")
  val bloomidx = new SnapshotTable(spark, s"${cfg.tableRoot}/bloomidx")

  private val robotsDf = robotsRules.toDF()
  private var pol: Politeness = cfg.politeness
  // standing Bloom index, maintained incrementally per run — O(batch)
  // per micro-run instead of rebuilding over the whole seen history
  private var bloomBlocks: Option[Map[Int, Array[Byte]]] = None

  def currentDelayMs: Double = pol.clampedDelay

  /** Load (or recover) the standing Bloom blocks. The persisted blocks
    * carry the fetchlog snapshot they cover; a mismatch (crash between
    * the fetchlog and bloomidx commits, or a fresh engine on an old
    * root) forces a full rebuild from the seen table — a stale index
    * would mark recently-seen URLs "definitely new" and refetch them. */
  private def loadBloomBlocks(seen: DataFrame): Map[Int, Array[Byte]] =
    bloomBlocks.getOrElse {
      val logSnap = fetchlog.latestSnapshot.getOrElse(0L)
      val fromTable = bloomidx.read().flatMap { df =>
        val rows = df.filter(col("fetchlog_snapshot") === logSnap)
          .select("bucket", "bloom").collect()
        if (rows.isEmpty) None
        else Some(rows.map(r => r.getInt(0) -> r.getAs[Array[Byte]](1)).toMap)
      }
      val blocks = fromTable.getOrElse(
        BloomDedup.collectBlocks(BloomDedup.buildIndex(seen, cfg.bloomBuckets)))
      bloomBlocks = Some(blocks)
      blocks
    }

  /** Seed the frontier (run 0 commit). Seed i gets seq = i+1, depth 0. */
  def seed(urls: Seq[String]): Unit = {
    val rows = urls.zipWithIndex.map { case (u, i) =>
      val cu = graft.urlkit.UrlKit.canonicalize(u)
      FrontierEntry(cu, graft.urlkit.UrlKit.xxhash64(cu),
        graft.urlkit.UrlKit.host(cu), graft.urlkit.UrlKit.path(cu),
        priority = 0.0, depth = 0, seq = i + 1L)
    }
    frontier.commit(rows.toDF(), Map("n_seeds" -> rows.size.toDouble), Some("seq"))
  }

  private def seenKeys: Option[DataFrame] =
    fetchlog.read().map(_.select("url_hash").distinct())

  /** Candidates discovered but never attempted, via Bloom prefilter +
    * exact anti-join (north rule dedup path). */
  private def pendingNew: Option[DataFrame] = frontier.read().map { f =>
    seenKeys match {
      case None => f
      case Some(seen) =>
        if (cfg.useBloom)
          BloomDedup.dedupWithBlocks(f, seen, loadBloomBlocks(seen), cfg.bloomBuckets)
        else
          BloomDedup.dedup(f, seen, None, cfg.bloomBuckets)
    }
  }

  /** Latest attempt per url where the outcome is retryable (status 500 /
    * transport 0) and attempts remain (R6 typed retry). */
  private def pendingRetry: Option[DataFrame] = fetchlog.read().map { log =>
    val w = Window.partitionBy(col("url_hash")).orderBy(desc("attempt"))
    log.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 &&
        (col("status") === 500 || col("status") === 0) &&
        col("attempt") < cfg.maxRetries)
      .select(col("url"), col("url_hash"), col("host"),
        url_path(col("url")).as("path"),
        lit(0.0).as("priority"), col("depth"), col("seq"),
        (col("attempt") + 1).as("attempt"))
  }

  /** One micro-run; None when the frontier is drained. */
  def runOnce(): Option[RunStats] = {
    val newPart = pendingNew.map(_.withColumn("attempt", lit(1)))
    val pending = (newPart, pendingRetry) match {
      case (Some(a), Some(b)) => a.select(b.columns.map(col): _*).unionByName(b)
      case (Some(a), None) => a
      case (None, Some(b)) => b
      case (None, None) => return None
    }

    val scheduled = Scheduler.schedule(pending, robotsDf, pol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    if (scheduled.isEmpty) { scheduled.unpersist(); return None }

    // A1 progress metrics ride the fetch pass itself via Dataset.observe
    // (fpds_high_performance.py:292-313 `_update_progress` analogue) —
    // no separate counting job over the results
    val obs = new org.apache.spark.sql.Observation(s"fetch-${System.nanoTime()}")
    val results = FetchStage.run(scheduled, fetcher, pol.hostSalts).toDF()
      .observe(obs,
        count(lit(1)).as("n"),
        coalesce(sum(when(col("status") === 200, 1L).otherwise(0L)), lit(0L)).as("ok"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    results.count() // materializes the cache once; completes the observation
    val observed = obs.get
    val nScheduled = observed("n").asInstanceOf[Long]
    val nOk = observed("ok").asInstanceOf[Long]
    val nFail = nScheduled - nOk

    // ---- Catalyst parse stage: images (F7) ----------------------------
    val ok = results.filter(col("status") === 200)
    val imgRefs = ok.select(
        col("seq"),
        regexp_extract_all(col("body"), lit("<img src=\"([^\"]*)\""), lit(1)).as("srcs"),
        regexp_extract_all(col("body"), lit("alt=\"([^\"]*)\""), lit(1)).as("alts"))
      .select(col("seq"), explode(arrays_zip(col("srcs"), col("alts"))).as("img"))
      .select(col("seq"),
        regexp_extract(col("img.srcs"), "([^/]+)\\.(png|jpg|jpeg)$", 1).as("image_id"),
        col("img.alts").as("caption"))
      .filter(col("image_id") =!= "")

    // first discovery in canonical order wins; payload is id-deterministic
    val wImg = Window.partitionBy(col("image_id")).orderBy(col("seq"))
    val newIds = imgRefs
      .withColumn("__rn", row_number().over(wImg)).filter(col("__rn") === 1)
      .select("image_id", "caption")
    val unseenIds = images.read() match {
      case Some(existing) =>
        newIds.join(existing.select("image_id").distinct(), Seq("image_id"), "left_anti")
      case None => newIds
    }

    // payload fetch (the image GET of the fetch stage) + phash
    val imageRows = unseenIds.select("image_id", "caption")
      .as[(String, String)]
      .mapPartitions { it =>
        it.map { case (id, caption) =>
          val (bytes, w, h, f) = ImageKit.generate(id)
          ImageCaptionRow(id, bytes, w, h, f, caption, ImageKit.phash(bytes))
        }
      }.toDF()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nNewImages = imageRows.count()

    // ---- Catalyst parse stage: outlinks (F6) → new frontier rows ------
    val links = ok.select(col("seq").as("parent_seq"), col("depth").as("parent_depth"),
        posexplode(regexp_extract_all(col("body"), lit("<a href=\"([^\"]*)\""), lit(1)))
          .as(Seq("link_idx", "href")))
      .select(
        canonical_url(col("href")).as("url"),
        (col("parent_seq") * 64 + col("link_idx") + 1).as("seq"),
        (col("parent_depth") + 1).as("depth"))
      .withColumn("url_hash", xxhash64(col("url")))
      .withColumn("host", url_host(col("url")))
      .withColumn("path", url_path(col("url")))
      .withColumn("priority", -col("depth").cast("double"))

    // dedup within batch (min-seq row per url), vs frontier, vs seen
    val wLink = Window.partitionBy(col("url_hash")).orderBy(col("seq"))
    val batchUnique = links.withColumn("__rn", row_number().over(wLink))
      .filter(col("__rn") === 1).drop("__rn")
      .select("url", "url_hash", "host", "path", "priority", "depth", "seq")
    val vsFrontier = frontier.read() match {
      case Some(f) => batchUnique.join(f.select("url_hash").distinct(), Seq("url_hash"), "left_anti")
      case None => batchUnique
    }
    val newCandidates = (seenKeys match {
      case Some(s) => vsFrontier.join(s, Seq("url_hash"), "left_anti")
      case None => vsFrontier
    }).persist(StorageLevel.MEMORY_AND_DISK)
    val nNewCand = newCandidates.count()
    val totalLinks = links.count()

    // ---- commits (snapshot isolation; resume point) -------------------
    val runId = fetchlog.latestSnapshot.getOrElse(0L) + 1
    val baseMetrics = Map(
      "scheduled" -> nScheduled.toDouble, "fetched_ok" -> nOk.toDouble,
      "failed" -> nFail.toDouble, "new_images" -> nNewImages.toDouble,
      "new_candidates" -> nNewCand.toDouble,
      "links_seen" -> totalLinks.toDouble,
      "dedup_dropped" -> (totalLinks - nNewCand).toDouble,
      "delay_ms" -> pol.clampedDelay)

    fetchlog.commit(results.drop("body").withColumn("run", lit(runId)),
      baseMetrics, Some("seq"),
      coalesceTo = (nScheduled / 50000 + 1).toInt)
    // incremental Bloom maintenance: hash only THIS run's urls into fresh
    // blocks and merge into the standing index (O(batch), not O(history));
    // persist with the covered fetchlog snapshot for resume validation
    if (cfg.useBloom) {
      val runBlocks = BloomDedup.collectBlocks(
        BloomDedup.buildIndex(results.select("url_hash"), cfg.bloomBuckets))
      val merged = BloomDedup.mergeBlocks(
        bloomBlocks.getOrElse(Map.empty), runBlocks)
      bloomBlocks = Some(merged)
      import spark.implicits._
      bloomidx.commit(
        merged.toSeq.map { case (b, bytes) => (b, bytes, runId) }
          .toDF("bucket", "bloom", "fetchlog_snapshot"),
        Map("covers_fetchlog_snapshot" -> runId.toDouble), None, coalesceTo = 1)
    }
    if (nNewImages > 0)
      images.commit(imageRows, baseMetrics, None,
        coalesceTo = (nNewImages / 5000 + 1).toInt)
    if (nNewCand > 0)
      frontier.commit(
        newCandidates.select("url", "url_hash", "host", "path", "priority", "depth", "seq"),
        baseMetrics, Some("seq"), coalesceTo = (nNewCand / 100000 + 1).toInt)

    // ---- adaptive controller (R2) -------------------------------------
    val successRate = if (nScheduled == 0) 1.0 else nOk.toDouble / nScheduled
    val blockedRate = if (nScheduled == 0) 0.0 else nFail.toDouble / nScheduled
    pol = Scheduler.nextDelay(pol, successRate, blockedRate)

    scheduled.unpersist(); results.unpersist(); imageRows.unpersist(); newCandidates.unpersist()
    Some(RunStats(runId, nScheduled, nOk, nFail, nNewImages, nNewCand,
      totalLinks - nNewCand, pol.clampedDelay))
  }

  /** Crawl until drained (or the safety cap). */
  def crawlAll(): Seq[RunStats] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[RunStats]
    var continue = true
    while (continue && out.size < cfg.maxRuns) {
      runOnce() match {
        case Some(s) => out += s
        case None => continue = false
      }
    }
    out.toSeq
  }

  /** The URL-seen set (distinct attempted urls), for oracle comparison. */
  def seenSet(): Set[String] =
    fetchlog.read().map(_.select("url").distinct().as[String].collect().toSet)
      .getOrElse(Set.empty)

  /** Stored payload rows, canonical order. */
  def imageTable(): Option[DataFrame] = images.read()
}
