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

// Fetch results and retry rows are Row-based (their `seq` is a
// decimal(38,0) with no lossless JVM-encoder mapping) — the schema lives
// in FetchStage; the reference's typed failure record
// (fpds_high_performance.py:319-331) maps onto the fetchlog columns
// (url, url_hash, host, seq, depth, attempt, status, error, run, bucket).

/** Per-host robots rules (north-rule extension; not in reference).
  * `crawlDelayMs`: a site-declared Crawl-delay — the scheduler never goes
  * faster than it, whatever the adaptive controller wants. */
final case class RobotsRule(host: String, disallow: Seq[String],
                            crawlDelayMs: Option[Double] = None)

// Per-commit lineage and metrics live as JSON in the SnapshotTable
// manifests (queryable via SnapshotTable.manifests()); the rows are
// computed from parquet footer statistics — see table/ParquetFooters.
