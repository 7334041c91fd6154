package graft.parse

import graft.model.RobotsRule

/** robots.txt text parser (north-rule: "enforces robots.txt rules" — the
  * engine consumes [[RobotsRule]] structures; this turns a fetched
  * robots.txt body into one, per the original robots exclusion format:
  * `User-agent` groups, `Disallow` prefixes, `Crawl-delay` seconds).
  *
  * Group selection follows RFC 9309 §2.2.1: user agents match on their
  * PRODUCT TOKEN (the part before any `/version`), case-insensitively,
  * and when several groups match the same agent their rules are MERGED —
  * disallow lists union, Crawl-delay takes the max (the conservative
  * fold). Only when no group matches does the `*` group apply (itself
  * merged across all `*` groups); otherwise everything is allowed.
  * Successive User-agent lines with no rules between them share one
  * group. An empty `Disallow:` means allow-all and contributes no
  * prefix. Comments (`#` to end of line) and unknown directives are
  * ignored.
  */
object RobotsTxt {

  def parse(host: String, text: String, userAgent: String = "*"): RobotsRule = {
    final case class Group(agents: Seq[String], disallow: Seq[String],
                           crawlDelaySec: Option[Double])
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    var agents = scala.collection.mutable.ArrayBuffer.empty[String]
    var disallow = scala.collection.mutable.ArrayBuffer.empty[String]
    var delay: Option[Double] = None
    var inRules = false

    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents.toSeq, disallow.toSeq, delay)
      agents = scala.collection.mutable.ArrayBuffer.empty
      disallow = scala.collection.mutable.ArrayBuffer.empty
      delay = None
      inRules = false
    }

    text.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      if (line.nonEmpty) {
        val i = line.indexOf(':')
        if (i > 0) {
          val key = line.substring(0, i).trim.toLowerCase
          val value = line.substring(i + 1).trim
          key match {
            case "user-agent" =>
              if (inRules) flush() // a UA line after rules starts a new group
              agents += value.toLowerCase
            case "disallow" =>
              inRules = true
              if (value.nonEmpty) disallow += value
            case "crawl-delay" =>
              inRules = true
              delay = value.toDoubleOption.orElse(delay)
            case "allow" =>
              inRules = true // a group rule we don't restrict on, but it
              // does mark the group as rule-bearing
            case _ => // sitemap/unknown: NON-group lines — RFC 9309 says
            // they do not split a group, so they must not flip inRules
          }
        }
      }
    }
    flush()

    // RFC 9309: compare product tokens (strip any /version suffix),
    // case-insensitive; merge ALL matching groups (union disallow, max
    // Crawl-delay). `*` groups apply only when no named group matched.
    def token(s: String): String = s.trim.toLowerCase.takeWhile(c => c != '/' && c != ' ')
    val uaTok = token(userAgent)
    val named = groups.filter(_.agents.exists(a => a != "*" && token(a) == uaTok)).toSeq
    val chosen = if (named.nonEmpty) named else groups.filter(_.agents.contains("*")).toSeq
    val delays = chosen.flatMap(_.crawlDelaySec)
    RobotsRule(host,
      chosen.flatMap(_.disallow).distinct,
      if (delays.isEmpty) None else Some(delays.max * 1000.0))
  }
}
