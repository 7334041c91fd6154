package graft.oracle

import graft.parse.PageParser
import graft.urlkit.UrlKit
import graft.web.SyntheticWeb

import scala.collection.mutable

/** Single-threaded oracle crawler — the in-process transliteration of the
  * reference's sequential crawl semantics (SURVEY.md §3.1, §5 item 2;
  * fpds_enhanced_extractor.py:49-160 sequential loop +
  * fpds_high_performance.py:315-413 failure/retry semantics), run against
  * the same SyntheticWeb, micro-run by micro-run, with the same
  * per-host budget / robots / retry rules as the engine.
  *
  * The engine test asserts: identical URL-seen set, identical per-run
  * canonical order (seq ascending), identical frontier, identical
  * image_id → caption/phash mapping (FIXTURES.md §4).
  */
final class OracleCrawler(web: SyntheticWeb, perHostBudget: Int, maxRetries: Int) {

  final case class Entry(url: String, hash: Long, host: String, path: String,
                         priority: Double, depth: Int, seq: BigInt)

  val frontier = mutable.LinkedHashMap.empty[Long, Entry]
  val fetchLog = mutable.ArrayBuffer.empty[(String, Long, Int, Int)] // url, hash, attempt, status
  private val latest = mutable.HashMap.empty[Long, (Int, Int)]       // hash -> (attempt, status)
  private val attempted = mutable.HashSet.empty[Long]
  val imagesCaptions = mutable.LinkedHashMap.empty[String, String]
  /** per-run scheduled (url, seq) lists in canonical (seq asc) order */
  val runOrders = mutable.ArrayBuffer.empty[Seq[(String, BigInt)]]

  private val robots: Map[String, Seq[String]] =
    web.robots.map(r => r.host -> r.disallow).toMap

  def seed(urls: Seq[String]): Unit =
    urls.zipWithIndex.foreach { case (u, i) =>
      val cu = UrlKit.canonicalize(u)
      val h = UrlKit.xxhash64(cu)
      frontier.getOrElseUpdate(h,
        Entry(cu, h, UrlKit.host(cu), UrlKit.path(cu), 0.0, 0, BigInt(i + 1)))
    }

  private def allowed(e: Entry): Boolean =
    !robots.getOrElse(e.host, Seq.empty).exists(p => e.path.startsWith(p))

  /** One micro-run; false when drained. */
  def runOnce(): Boolean = {
    val pendingNew = frontier.values.filterNot(e => attempted(e.hash))
      .map(e => (e, 1)).toSeq
    val pendingRetry = latest.toSeq.collect {
      case (h, (att, st)) if (st == 500 || st == 0) && att < maxRetries =>
        // retries re-enter at top priority (engine: pendingRetry priority 0.0)
        val e = frontier(h)
        (e.copy(priority = 0.0), att + 1)
    }
    val pending = (pendingNew ++ pendingRetry).filter { case (e, _) => allowed(e) }
    if (pending.isEmpty) return false

    // per-host priority queue: (priority desc, seq asc), take budget
    val scheduled = pending
      .groupBy(_._1.host)
      .values.flatMap { xs =>
        xs.sortBy { case (e, _) => (-e.priority, e.seq) }.take(perHostBudget)
      }
      .toSeq.sortBy(_._1.seq) // canonical order within the run
    if (scheduled.isEmpty) return false

    runOrders += scheduled.map { case (e, _) => (e.url, e.seq) }

    scheduled.foreach { case (e, attempt) =>
      val resp = web.fetch(e.url, attempt)
      fetchLog += ((e.url, e.hash, attempt, resp.status))
      attempted += e.hash
      latest(e.hash) = (attempt, resp.status)
      if (resp.status == 200) {
        // images: first discovery wins (payload is id-deterministic anyway)
        PageParser.images(e.url, resp.body).foreach { ref =>
          if (!imagesCaptions.contains(ref.imageId))
            imagesCaptions(ref.imageId) = ref.caption
        }
        // outlinks: canonical code child = parent*64 + idx + 1
        PageParser.links(e.url, resp.body).zipWithIndex.foreach { case (l, idx) =>
          val cu = UrlKit.canonicalize(l.url)
          val h = UrlKit.xxhash64(cu)
          if (!frontier.contains(h)) {
            val d = e.depth + 1
            frontier(h) = Entry(cu, h, UrlKit.host(cu), UrlKit.path(cu),
              -d.toDouble, d, e.seq * 64 + idx + 1)
          }
        }
      }
    }
    true
  }

  def crawlAll(maxRuns: Int = 64): Int = {
    var n = 0
    while (n < maxRuns && runOnce()) n += 1
    n
  }

  def seenSet: Set[String] = fetchLog.map(_._1).toSet
}
