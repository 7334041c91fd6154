package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming layer (SURVEY.md §2.10).
  *
  * The engine's crawl loop is deliberately micro-batch (matching the
  * reference's restart-driven operation, fpds-crawler-manager.py:121-160),
  * but the same stages lift to Structured Streaming for continuous
  * ingestion: event-time windows with watermarks for the metrics stream,
  * and the adaptive rate-limiter controller (smart_rate_limiter.py:100-149)
  * re-expressed as keyed streaming state over per-host fetch outcomes.
  */
object Streams {

  /** Windowed event aggregation with a watermark: the streaming analogue
    * of the per-run metrics rollup (A3). `events` needs (ts: timestamp,
    * event_type: string, value: double). Late rows beyond 10 minutes are
    * dropped by the watermark. */
  def windowedEventCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("total"))
      .select(col("win.start").as("hour_start"), col("event_type"), col("n"), col("total"))

  /** One fetch outcome flowing into the controller. */
  final case class FetchOutcome(host: String, ok: Boolean, blocked: Boolean)

  /** Controller state per host: the reference's adaptive delay machine. */
  final case class HostRateState(
      delayMs: Double, window: List[Boolean], blockedWindow: List[Boolean])

  final case class HostDelay(host: String, delayMs: Double, successRate: Double, n: Long)

  val MinDelayMs = 100.0
  val MaxDelayMs = 2000.0
  val WindowSize = 50 // the reference's last-50 sliding stats window

  /** smart_rate_limiter.py:100-149 semantics over the last-50 window:
    * success ≥ .95 & blocked < .05 → ×0.8; success < .8 or blocked > .1
    * → ×1.5; else ×0.9 decay — per host, as streaming state. */
  def updateHost(host: String, outcomes: Iterator[FetchOutcome],
                 state: GroupState[HostRateState]): HostDelay = {
    val prev = state.getOption.getOrElse(HostRateState(500.0, Nil, Nil))
    var win = prev.window
    var blockedWin = prev.blockedWindow
    outcomes.foreach { o =>
      win = (o.ok :: win).take(WindowSize)
      blockedWin = (o.blocked :: blockedWin).take(WindowSize)
    }
    val n = win.size.max(1)
    val successRate = win.count(identity).toDouble / n
    val blockedRate = blockedWin.count(identity).toDouble / n
    val d = prev.delayMs
    val next =
      if (successRate >= 0.95 && blockedRate < 0.05) d * 0.8
      else if (successRate < 0.8 || blockedRate > 0.1) d * 1.5
      else d * 0.9
    val clamped = math.min(MaxDelayMs, math.max(MinDelayMs, next))
    state.update(HostRateState(clamped, win, blockedWin))
    HostDelay(host, clamped, successRate, win.size.toLong)
  }

  /** Keyed stateful stream: per-host adaptive delays from fetch outcomes. */
  def adaptiveDelays(outcomes: Dataset[FetchOutcome]): Dataset[HostDelay] = {
    val spark = outcomes.sparkSession
    import spark.implicits._
    outcomes
      .groupByKey(_.host)
      .mapGroupsWithState[HostRateState, HostDelay](
        GroupStateTimeout.NoTimeout)(updateHost)
  }

  /** Streaming frontier dedup: candidate URLs arriving as a stream are
    * canonical-keyed and deduplicated STATEFULLY, with the event-time
    * watermark actually bounding the state: keys older than the horizon
    * are evicted, so a re-discovery after the horizon re-admits — the
    * recrawl-after-TTL semantics the cuckoo path serves in batch. This
    * needs `dropDuplicatesWithinWatermark` — a plain
    * `dropDuplicates("url_hash")` would keep every key forever (watermark
    * eviction only applies when the event-time column is part of the
    * dedup key). `candidates` needs
    * (url_hash: long, url: string, host: string, ts: timestamp). */
  def frontierDedup(candidates: DataFrame, watermark: String = "10 minutes"): DataFrame =
    candidates
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("url_hash")

  /** Streaming per-host admission counts over tumbling windows — the
    * politeness budget's continuous analogue: downstream fetch dispatch
    * reads at most `budget` rows per (host, window). */
  def hostAdmissions(deduped: DataFrame, windowLen: String = "1 minute"): DataFrame =
    deduped
      .groupBy(window(col("ts"), windowLen).as("win"), col("host"))
      .agg(count(lit(1)).as("n_admitted"))
      .select(col("win.start").as("win_start"), col("host"), col("n_admitted"))

  /** File-source streaming ingest of an events directory (schema required
    * by Structured Streaming file sources). */
  def ingest(spark: SparkSession, dir: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("props", org.apache.spark.sql.types.StringType)))
    spark.readStream.schema(schema).parquet(dir)
  }
}
