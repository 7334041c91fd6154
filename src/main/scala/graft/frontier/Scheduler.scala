package graft.frontier

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Politeness configuration — envelope mirrors the reference's limiter
  * defaults (fpds_high_performance.py:39-43: initial 0.5 s, min 0.1 s,
  * max 2.0 s; jitter ±20%, smart_rate_limiter.py:56-78). */
final case class Politeness(
    perHostBudget: Int = 16,     // max requests per host per micro-run
    baseDelayMs: Double = 500.0, // current adaptive delay
    minDelayMs: Double = 100.0,
    maxDelayMs: Double = 2000.0,
    hostSalts: Int = 1           // >1 splits hot hosts across partitions
) {
  def clampedDelay: Double = math.min(maxDelayMs, math.max(minDelayMs, baseDelayMs))
}

/** Frontier scheduler (SURVEY.md §2.9 R1-R3, W3; north rule: per-host
  * priority queue + robots + token buckets). Fully declarative — windows
  * and joins only, no driver-side loops:
  *
  *   1. robots gate: broadcast-join per-host disallow prefixes, filter
  *      with an array `exists` (no UDF);
  *   2. per-host priority queue: `row_number` over
  *      `(priority desc, seq asc)` per host, keep `rank <= budget`;
  *   3. deterministic politeness plan: each request gets a planned offset
  *      = running sum of `delay × jitter(url_hash, attempt)` within its
  *      host — the seeded replacement for the reference's random jitter,
  *      so N-core and 4N-core runs plan identical schedules.
  *
  * Scale notes: the window shuffles by host exactly once; hot hosts are
  * split by `hostSalts` at fetch-repartition time. Only the per-stream
  * delay is scaled (× salts) so the host's aggregate request rate is
  * unchanged; the per-host budget is applied whole, before salting.
  */
object Scheduler {

  /** Jitter column bit-identical with UrlKit.jitter(urlHash, attempt). */
  def jitterCol(urlHash: org.apache.spark.sql.Column, attempt: org.apache.spark.sql.Column) = {
    val h = xxhash64(concat(lit("jitter:"), urlHash.cast("string"), lit(":"), attempt.cast("string")))
    lit(0.8) + lit(0.4) * (shiftrightunsigned(h, 11).cast("double") / lit((1L << 53).toDouble))
  }

  /** `pending` needs (url, url_hash, host, path, priority, seq, attempt).
    * `robots`: (host, disallow: array<string>). Returns the scheduled
    * slice with `rank` and `sched_offset_ms`. */
  def schedule(pending: DataFrame, robots: DataFrame, pol: Politeness): DataFrame = {
    val hasCrawlDelay = robots.columns.contains("crawlDelayMs")
    val joined = pending
      .join(broadcast(robots), Seq("host"), "left_outer")
      .filter(col("disallow").isNull ||
        !exists(col("disallow"), p => col("path").startsWith(p)))
      .drop("disallow")

    val w = Window.partitionBy(col("host")).orderBy(desc("priority"), asc("seq"))
    // per-host effective delay: never faster than a site-declared
    // Crawl-delay, whatever the adaptive controller wants; hostSalts > 1
    // splits a host's requests across that many concurrent fetch
    // partitions, and spacing each stream by salts× the delay keeps the
    // host's AGGREGATE request rate at the politeness target
    val baseDelay =
      if (hasCrawlDelay) greatest(coalesce(col("crawlDelayMs"), lit(0.0)), lit(pol.clampedDelay))
      else lit(pol.clampedDelay)
    val delay = baseDelay * lit(math.max(1, pol.hostSalts).toDouble)
    joined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= pol.perHostBudget)
      .withColumn("__delay_ms", delay * jitterCol(col("url_hash"), col("attempt")))
      .withColumn("sched_offset_ms",
        sum(col("__delay_ms")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__delay_ms")
      .drop("crawlDelayMs")
  }

  /** Adaptive delay controller (smart_rate_limiter.py:100-149 semantics):
    * success ≥ .95 & blocked < .05 → ×0.8 (aggressive); success < .8 or
    * blocked > .1 → ×1.5 (conservative); else decay toward base ×0.9.
    * Driver-side between micro-runs — feedback, not a Catalyst concern
    * (SURVEY.md §4). */
  def nextDelay(pol: Politeness, successRate: Double, blockedRate: Double): Politeness = {
    val d = pol.clampedDelay
    val next =
      if (successRate >= 0.95 && blockedRate < 0.05) d * 0.8
      else if (successRate < 0.8 || blockedRate > 0.1) d * 1.5
      else d * 0.9
    pol.copy(baseDelayMs = math.min(pol.maxDelayMs, math.max(pol.minDelayMs, next)))
  }
}
