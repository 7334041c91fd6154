package graft.fetch

import graft.web.{FetchResponse, SyntheticWeb, WebConfig}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Injectable fetch policy (SURVEY.md §7.1 step 5). */
trait Fetcher extends Serializable {
  def fetch(url: String, attempt: Int): FetchResponse
}

/** Deterministic fetcher over the synthetic web — tests + benches. */
final class SyntheticFetcher(cfg: WebConfig) extends Fetcher {
  @transient private lazy val web = new SyntheticWeb(cfg)
  override def fetch(url: String, attempt: Int): FetchResponse = web.fetch(url, attempt)
}

/** Real HTTP fetcher (production path; java.net only, no extra jars).
  * UA rotation is seeded by (url, attempt) — the deterministic analogue of
  * the reference's random.choice over 5 UAs (proxy_manager.py:135-137). */
final class HttpFetcher(timeoutMs: Int = 10000) extends Fetcher {
  private val userAgents = Array(
    "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/537.36")

  override def fetch(url: String, attempt: Int): FetchResponse = {
    import graft.urlkit.UrlKit
    try {
      val conn = new java.net.URI(url).toURL.openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setConnectTimeout(timeoutMs)
      conn.setReadTimeout(timeoutMs)
      val ua = userAgents(math.floorMod(UrlKit.xxhash64(s"ua:$url:$attempt"), userAgents.length.toLong).toInt)
      conn.setRequestProperty("User-Agent", ua)
      val status = conn.getResponseCode
      val body =
        if (status >= 200 && status < 300)
          new String(conn.getInputStream.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        else ""
      conn.disconnect()
      FetchResponse(status, body)
    } catch {
      case _: Exception => FetchResponse(0, "")
    }
  }
}

/** The scheduler's output contract: columns (url, url_hash, host, path,
  * priority, depth, seq, attempt, rank, sched_offset_ms). `seq` is passed
  * through untyped — the engine uses decimal(38,0) (the hierarchical
  * sequence code outgrows a long past depth 9), benches use plain longs. */

/** The fetch stage — the single permitted non-Catalyst `mapPartitions`
  * (north rule; SURVEY.md §2.1 S1/S3/S5).
  *
  * Requests are repartitioned by `(host, salt)` — `hostSalts > 1` splits a
  * hot host across partitions (explicit skew handling; the scheduler
  * scaled only the per-stream delay by `salts`, keeping the host's
  * aggregate rate — the per-host budget was applied whole, pre-salt) —
  * and sorted by planned offset,
  * so each partition replays its hosts' schedules in order. A per-host
  * token bucket inside the partition enforces the minimum interval in
  * real-time mode; in virtual-time mode (tests/bench) the planned offsets
  * ARE the politeness evidence and no thread sleeps.
  */
object FetchStage {

  def run(scheduled: DataFrame, fetcher: Fetcher, hostSalts: Int,
          minIntervalMs: Long = 0L, realTime: Boolean = false,
          fetchPartitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val spark = scheduled.sparkSession
    // Pin the partition count explicitly: fetch parallelism is a
    // politeness/concurrency decision, not a data-volume one — AQE's
    // coalescing otherwise merges a small batch's tiny shuffle blocks
    // into ONE partition and serializes every request behind a single
    // task slot (measured: a 2 ms-RTT batch ran at 1x instead of
    // n-cores x). A user-specified numPartitions is exempt from AQE
    // coalescing.
    val nPart =
      if (fetchPartitions > 0) fetchPartitions
      else spark.sparkContext.defaultParallelism
    val salted = scheduled
      .repartition(nPart, col("host"), pmod(col("url_hash"), lit(math.max(1, hostSalts))))
      .sortWithinPartitions(col("host"), col("sched_offset_ms"))
      .select("url", "url_hash", "host", "path", "priority", "depth", "seq", "attempt", "rank", "sched_offset_ms")

    // Row-based (not a case-class encoder): `seq` keeps its column type —
    // the engine's decimal(38,0) sequence code has no lossless JVM-encoder
    // mapping (BigDecimal encoders force scale 18, halving the range)
    val outSchema = StructType(Seq(
      StructField("url", StringType, nullable = false),
      StructField("url_hash", LongType, nullable = false),
      StructField("host", StringType, nullable = false),
      StructField("seq", salted.schema("seq").dataType, nullable = true),
      StructField("depth", IntegerType, nullable = false),
      StructField("attempt", IntegerType, nullable = false),
      StructField("status", IntegerType, nullable = false),
      StructField("body", StringType, nullable = true),
      StructField("error", StringType, nullable = true)))

    salted.mapPartitions { rows =>
      val lastHit = scala.collection.mutable.HashMap.empty[String, Long]
      rows.map { r =>
        val host = r.getString(2)
        val url = r.getString(0)
        val attempt = r.getInt(7)
        if (realTime && minIntervalMs > 0) {
          val now = System.currentTimeMillis()
          val due = lastHit.getOrElse(host, 0L) + minIntervalMs
          if (due > now) Thread.sleep(due - now)
          lastHit(host) = math.max(now, due)
        }
        val resp = fetcher.fetch(url, attempt)
        Row(url, r.getLong(1), host, r.get(6), r.getInt(5), attempt,
          resp.status, resp.body,
          if (resp.status == 200) "" else s"http_${resp.status}")
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }
}
