package graft

import graft.frontier.{Politeness, Scheduler}
import graft.model.RobotsRule
import graft.parse.RobotsTxt
import graft.urlkit.UrlKit
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the scheduler's politeness-plan arithmetic: budget, ordering,
  * and the deterministic jittered offsets (SURVEY.md §2.9 R1-R3/W3). */
class SchedulerSpec extends AnyFunSuite {
  import TestSpark._

  private def pendingDf = {
    val spark = TestSpark.spark
    import spark.implicits._
    (for {
      h <- 0 until 3
      p <- 0 until 10
    } yield {
      val url = s"http://host-$h.test/page/$p"
      (url, UrlKit.xxhash64(url), s"host-$h.test", s"/page/$p",
        -(p % 4).toDouble, p % 4, (h * 100 + p).toLong, 1)
    }).toDF("url", "url_hash", "host", "path", "priority", "depth", "seq", "attempt")
  }

  test("robots.txt parser: group selection, empty disallow, crawl-delay, comments") {
    val txt =
      """# robots for example.test
        |User-agent: greedybot
        |Disallow: /
        |
        |User-agent: *
        |Disallow: /private/   # secrets
        |Disallow: /tmp/
        |Crawl-delay: 2.5
        |
        |User-agent: niceBot
        |Disallow:
        |Crawl-delay: 1
        |""".stripMargin
    val any = RobotsTxt.parse("example.test", txt)
    assert(any.disallow == Seq("/private/", "/tmp/"))
    assert(any.crawlDelayMs.contains(2500.0))
    val nice = RobotsTxt.parse("example.test", txt, userAgent = "NiceBot")
    assert(nice.disallow.isEmpty, "empty Disallow must allow all")
    assert(nice.crawlDelayMs.contains(1000.0))
    val greedy = RobotsTxt.parse("example.test", txt, userAgent = "greedybot")
    assert(greedy.disallow == Seq("/"))
    val none = RobotsTxt.parse("example.test", "# no groups at all\n")
    assert(none.disallow.isEmpty && none.crawlDelayMs.isEmpty)
    // RFC 9309: non-group lines (Sitemap, unknown keys) must NOT split a
    // group — a named agent followed by a Sitemap line before the shared
    // rules still gets those rules
    val withSitemap =
      """User-agent: graftbot
        |Sitemap: https://example.test/sitemap.xml
        |User-agent: *
        |Disallow: /private/
        |""".stripMargin
    val graft = RobotsTxt.parse("example.test", withSitemap, userAgent = "graftbot")
    assert(graft.disallow == Seq("/private/"),
      s"Sitemap line split the group: ${graft.disallow}")
  }

  test("robots.txt RFC 9309: same-agent groups merge, product tokens match, max crawl-delay wins") {
    val txt =
      """User-agent: bot
        |Disallow: /a/
        |Crawl-delay: 1
        |
        |User-agent: other
        |Disallow: /x/
        |
        |User-agent: bot
        |Disallow: /b/
        |Crawl-delay: 3
        |
        |User-agent: *
        |Disallow: /star/
        |""".stripMargin
    // two `User-agent: bot` groups MERGE: union of disallows, max delay
    val merged = RobotsTxt.parse("example.test", txt, userAgent = "bot")
    assert(merged.disallow.toSet == Set("/a/", "/b/"),
      s"same-agent groups not merged: ${merged.disallow}")
    assert(merged.crawlDelayMs.contains(3000.0), "max Crawl-delay must win")
    // a `bot/1.2` product token still matches the `bot` groups
    val versioned = RobotsTxt.parse("example.test", txt, userAgent = "Bot/1.2")
    assert(versioned.disallow.toSet == Set("/a/", "/b/"),
      s"product-token match failed: ${versioned.disallow}")
    // unmatched agents fall back to the merged `*` groups
    val star = RobotsTxt.parse("example.test", txt, userAgent = "nobody")
    assert(star.disallow == Seq("/star/"))
  }

  test("site Crawl-delay floors the politeness plan for its host only") {
    val spark = TestSpark.spark
    import spark.implicits._
    val robots = Seq(
      RobotsRule("host-0.test", Seq.empty, crawlDelayMs = Some(4000.0)),
      RobotsRule("host-1.test", Seq.empty)).toDF()
    val pol = Politeness(perHostBudget = 10, baseDelayMs = 500)
    val out = Scheduler.schedule(pendingDf, robots, pol)
      .select("host", "rank", "sched_offset_ms")
      .as[(String, Int, Double)].collect()
    def spacings(h: String): Seq[Double] = {
      val offs = out.filter(_._1 == h).sortBy(_._2).map(_._3)
      offs.head +: offs.sliding(2).map { case Array(a, b) => b - a }.toSeq
    }
    // delayed host: every inter-request gap ≥ 4000 × 0.8 (jitter floor)
    assert(spacings("host-0.test").forall(_ >= 4000 * 0.8),
      s"crawl-delay not honored: ${spacings("host-0.test").take(3)}")
    // others keep the adaptive delay envelope (500 × [0.8, 1.2))
    assert(spacings("host-1.test").forall(g => g >= 400 && g < 600),
      s"unexpected gaps: ${spacings("host-1.test").take(3)}")
  }

  test("per-host budget and (priority desc, seq asc) ordering") {
    val spark = TestSpark.spark
    import spark.implicits._
    val robots = Seq.empty[RobotsRule].toDF()
    val pol = Politeness(perHostBudget = 4, baseDelayMs = 500)
    val out = Scheduler.schedule(pendingDf, robots, pol)
      .select("host", "url", "priority", "seq", "rank")
      .as[(String, String, Double, Long, Int)].collect()
    assert(out.length == 12) // 3 hosts × budget 4
    out.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._5)
      // rank order must follow (priority desc, seq asc)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 > b._3 || (a._3 == b._3 && a._4 < b._4),
            s"ordering violated: $a before $b")
        case _ =>
      }
      // the selected 4 are the true top-4 by (priority desc, seq asc):
      // the three priority-0 pages (p = 0, 4, 8) plus the first -1 page
      val expectedSeqMod = Set(0L, 4L, 8L, 1L)
      assert(sorted.map(_._4 % 100).toSet == expectedSeqMod,
        s"selection mismatch: ${sorted.map(_._4 % 100).toSet}")
    }
  }

  test("politeness offsets are cumulative sums of jittered delays, within the envelope") {
    val spark = TestSpark.spark
    import spark.implicits._
    val robots = Seq.empty[RobotsRule].toDF()
    val pol = Politeness(perHostBudget = 10, baseDelayMs = 500)
    val out = Scheduler.schedule(pendingDf, robots, pol)
      .select("host", "url_hash", "rank", "sched_offset_ms")
      .as[(String, Long, Int, Double)].collect()
    out.groupBy(_._1).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_._3)
      var expected = 0.0
      byRank.foreach { case (_, urlHash, _, offset) =>
        expected += 500.0 * UrlKit.jitter(urlHash, 1)
        assert(math.abs(offset - expected) < 1e-6,
          s"offset $offset != cumulative $expected")
      }
      // per-request gaps stay inside the jitter envelope [0.8, 1.2)·delay
      byRank.sliding(2).foreach {
        case Array(a, b) =>
          val gap = b._4 - a._4
          assert(gap >= 400.0 && gap < 600.0, s"gap $gap outside envelope")
        case _ =>
      }
    }
  }

  test("delay clamping honors min/max envelope") {
    assert(Politeness(baseDelayMs = 50.0).clampedDelay == 100.0)
    assert(Politeness(baseDelayMs = 9999.0).clampedDelay == 2000.0)
    val p = Politeness(baseDelayMs = 1900.0)
    // conservative ×1.5 clamps at max
    assert(Scheduler.nextDelay(p, successRate = 0.5, blockedRate = 0.5).clampedDelay == 2000.0)
    // aggressive ×0.8 from the floor clamps at min
    val p2 = Politeness(baseDelayMs = 110.0)
    assert(Scheduler.nextDelay(p2, 1.0, 0.0).clampedDelay == 100.0)
  }

  test("robots gate drops only disallowed paths of disallowing hosts") {
    val spark = TestSpark.spark
    import spark.implicits._
    val pending = Seq(
      ("http://a.test/private/1", UrlKit.xxhash64("a1"), "a.test", "/private/1", 0.0, 0, 1L, 1),
      ("http://a.test/page/1", UrlKit.xxhash64("a2"), "a.test", "/page/1", 0.0, 0, 2L, 1),
      ("http://b.test/private/1", UrlKit.xxhash64("b1"), "b.test", "/private/1", 0.0, 0, 3L, 1)
    ).toDF("url", "url_hash", "host", "path", "priority", "depth", "seq", "attempt")
    val robots = Seq(RobotsRule("a.test", Seq("/private/"))).toDF()
    val kept = Scheduler.schedule(pending, robots, Politeness())
      .select("url").as[String].collect().toSet
    assert(kept == Set("http://a.test/page/1", "http://b.test/private/1"))
  }
}
