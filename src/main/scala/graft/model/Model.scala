package graft.model

/** Core typed rows of the crawl engine (SURVEY.md §1.1, §1.4).
  *
  * The payload schema is the authoritative `BASELINE.json.input_hint` shape:
  * (image_id, bytes, w, h, fmt, caption, phash).
  */
final case class ImageCaptionRow(
    image_id: String,
    bytes: Array[Byte],
    w: Int,
    h: Int,
    fmt: String,
    caption: String,
    phash: Long)

/** A frontier candidate, pre-canonicalized.
  *
  * `seq` is the deterministic discovery sequence (page asc, row asc —
  * the reference's canonical request order, SURVEY.md §3.1); `depth` is
  * hops from seed; `priority` is the scheduler's ranking key.
  */
final case class FrontierEntry(
    url: String,
    url_hash: Long,
    host: String,
    path: String,
    priority: Double,
    depth: Int,
    seq: Long)

/** One fetch outcome. `status` 200 = ok; 0 = transport error/timeout.
  * Mirrors the reference's typed failure record
  * (fpds_high_performance.py:319-331). */
final case class FetchResult(
    url: String,
    url_hash: Long,
    host: String,
    seq: Long,
    depth: Int,
    attempt: Int,
    status: Int,
    body: String,
    error: String)

/** A retry-table row (reference: the failed_request_data JSON dumps,
  * fpds_high_performance.py:315-347). */
final case class RetryEntry(
    url: String,
    url_hash: Long,
    host: String,
    seq: Long,
    depth: Int,
    attempts: Int,
    last_status: Int,
    error: String)

/** Per-host robots rules (north-rule extension; not in reference).
  * `crawlDelayMs`: a site-declared Crawl-delay — the scheduler never goes
  * faster than it, whatever the adaptive controller wants. */
final case class RobotsRule(host: String, disallow: Seq[String],
                            crawlDelayMs: Option[Double] = None)

/** Per-commit, per-partition lineage row (north rule: "per-partition
  * lineage rows plus fetch/dedup metrics on every commit"). */
final case class LineageRow(
    snapshot_id: Long,
    partition_id: Int,
    n_rows: Long,
    min_seq: Long,
    max_seq: Long)

/** Per-commit scalar metric. */
final case class MetricRow(snapshot_id: Long, key: String, value: Double)
