package graft.fetch

import graft.urlkit.UrlKit
import scala.collection.mutable

/** Proxy rotation policy (SURVEY.md §2.9 R4, §2.4 A5 —
  * proxy_manager.py:71-178 semantics): round-robin over a proxy list,
  * skip blocked proxies, block a proxy after `maxErrors` consecutive
  * errors, reset-all fallback when every proxy is blocked, per-proxy
  * usage/error stats.
  *
  * One instance lives per fetch partition (driver-broadcast list,
  * partition-local counters — the Spark shape of the reference's shared
  * locked singleton). Selection is deterministic: seeded round-robin
  * start keyed by (url_hash, attempt), matching the engine-wide
  * seeded-randomness rule (SURVEY.md §7.4).
  */
final case class ProxyStats(requests: Long, errors: Long, blocked: Boolean)

class ProxyManager(proxies: Seq[String], maxErrors: Int = 5) extends Serializable {
  require(proxies.nonEmpty, "proxy list must not be empty")

  private val requests = mutable.Map(proxies.map(_ -> 0L): _*)
  private val errors = mutable.Map(proxies.map(_ -> 0L): _*)
  private val consecutive = mutable.Map(proxies.map(_ -> 0): _*)
  private val blocked = mutable.Set.empty[String]

  /** Deterministic pick: seeded start, first unblocked clockwise.
    * Resets all blocks when everything is blocked (proxy_manager.py:
    * 135-137 reset-all fallback). */
  def pick(urlHash: Long, attempt: Int): String = {
    if (blocked.size == proxies.size) resetAll()
    val start = math.floorMod(UrlKit.xxhash64(s"proxy:$urlHash:$attempt"), proxies.size.toLong).toInt
    val n = proxies.size
    var i = 0
    while (i < n) {
      val p = proxies((start + i) % n)
      if (!blocked(p)) {
        requests(p) += 1
        return p
      }
      i += 1
    }
    proxies(start) // unreachable after resetAll
  }

  /** Feedback: success clears the consecutive-error streak; an error
    * blocks the proxy after `maxErrors` in a row. */
  def record(proxy: String, ok: Boolean): Unit = {
    if (ok) consecutive(proxy) = 0
    else {
      errors(proxy) += 1
      consecutive(proxy) += 1
      if (consecutive(proxy) >= maxErrors) blocked += proxy
    }
  }

  def resetAll(): Unit = {
    blocked.clear()
    consecutive.keys.foreach(consecutive(_) = 0)
  }

  def isBlocked(proxy: String): Boolean = blocked(proxy)

  /** A5: per-proxy stats map (proxy_manager.py:49-56,175-178). */
  def stats: Map[String, ProxyStats] =
    proxies.map(p => p -> ProxyStats(requests(p), errors(p), blocked(p))).toMap
}
