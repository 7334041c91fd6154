package graft.urlkit

import java.net.URI
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** Pure URL utilities shared by the DataFrame expressions, the oracle
  * crawler, and the scheduler. Everything here is deterministic and
  * driver/executor-safe.
  *
  * Canonicalization semantics (SURVEY.md §7.1 `urlkit`):
  *   - scheme + host lowercased
  *   - default port stripped (http:80, https:443)
  *   - fragment stripped
  *   - path: "" → "/", dot-segments resolved
  *   - query: params split on '&'/'=', sorted by (key, value), empties
  *     dropped; '?'-only suffix removed
  *
  * Reference analogue: the crawler joins relative links against the page
  * base with urljoin (lib/utils.py:95-99) and treats URL identity as
  * exact-string; we tighten that to a canonical form so the seen-set is
  * stable under the noise variants the synthetic web emits.
  */
object UrlKit {

  private val XxSeed = 42L // must match Spark SQL xxhash64's default seed

  /** xxhash64 of a string, bit-identical with Spark SQL `xxhash64(col)`. */
  def xxhash64(s: String): Long = {
    val u = UTF8String.fromString(s)
    XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, XxSeed)
  }

  /** Canonicalize a URL string; returns the input unchanged when it does
    * not parse as an absolute http(s) URI. */
  def canonicalize(url: String): String = {
    if (url == null) return null
    try {
      val uri = new URI(url.trim).normalize()
      val scheme = Option(uri.getScheme).map(_.toLowerCase).getOrElse(return url)
      if (scheme != "http" && scheme != "https") return url
      val host = Option(uri.getHost).map(_.toLowerCase).getOrElse(return url)
      val port = uri.getPort match {
        case -1 => ""
        case 80 if scheme == "http" => ""
        case 443 if scheme == "https" => ""
        case p => s":$p"
      }
      val rawPath = Option(uri.getRawPath).getOrElse("")
      val path = if (rawPath.isEmpty) "/" else rawPath
      val query = Option(uri.getRawQuery) match {
        case None | Some("") => ""
        case Some(q) =>
          // split into (key, value, hadEquals) triples, sort by (key, value)
          val kvs = q.split("&").filter(_.nonEmpty).toSeq.map { p =>
            val i = p.indexOf('=')
            if (i < 0) (p, "", false) else (p.substring(0, i), p.substring(i + 1), true)
          }
          val sorted = kvs.sortBy(kv => (kv._1, kv._2))
          if (sorted.isEmpty) ""
          else "?" + sorted.map { case (k, v, eq) => if (eq) s"$k=$v" else k }.mkString("&")
      }
      s"$scheme://$host$port$path$query"
    } catch {
      case _: Exception => url
    }
  }

  /** Host of a canonical URL ("" when unparseable). */
  def host(url: String): String = {
    if (url == null) return null
    try Option(new URI(url).getHost).map(_.toLowerCase).getOrElse("")
    catch { case _: Exception => "" }
  }

  /** Path of a canonical URL ("/" default). */
  def path(url: String): String = {
    if (url == null) return null
    try {
      val p = Option(new URI(url).getPath).getOrElse("")
      if (p.isEmpty) "/" else p
    } catch { case _: Exception => "/" }
  }

  /** Resolve a possibly-relative link against a base URL (RFC 3986),
    * reference F6 (lib/utils.py:95-99 urljoin). */
  def resolve(base: String, link: String): String = {
    try new URI(base).resolve(link.trim).toString
    catch { case _: Exception => link }
  }

  /** Deterministic jitter in [0.8, 1.2), keyed by (urlHash, attempt) —
    * the seeded replacement for the reference's random.uniform(0.8, 1.2)
    * (smart_rate_limiter.py:63-65; SURVEY.md F17). */
  def jitter(urlHash: Long, attempt: Int): Double = {
    val h = xxhash64(s"jitter:$urlHash:$attempt")
    0.8 + 0.4 * ((h >>> 11).toDouble / (1L << 53).toDouble)
  }
}
