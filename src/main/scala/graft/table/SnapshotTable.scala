package graft.table

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot-committed Parquet table: the offline stand-in for an Iceberg
  * table (SURVEY.md §7.4 — no Iceberg jar ships in /opt/spark/jars).
  *
  * Layout:
  * {{{
  *   <root>/data/commit-<N>/part-*.parquet   // one dir of data files per commit
  *   <root>/commits/v<N>.json                // manifest (atomic rename)
  * }}}
  *
  * Commit protocol: data files are fully written first, then the manifest
  * is staged to `commits/.tmp-v<N>.json` and atomically renamed to
  * `v<N>.json`. A crash between the two leaves an orphan data dir that no
  * manifest references — readers only union data dirs of committed
  * manifests, so reads are snapshot-isolated and resume is
  * "read the last committed snapshot" (north rule: resumable from
  * checkpoint). Each manifest carries per-partition lineage rows plus the
  * run's metrics (north rule: per-partition lineage + metrics per commit).
  *
  * All tables in the engine are append-only (seen-set, frontier log,
  * retry log, image payloads), which keeps the emulation exact: a
  * snapshot IS the set of commits `<= N`.
  */
class SnapshotTable(spark: SparkSession, root: String) {

  private def commitsDir: Path = Paths.get(root, "commits")
  private def dataDir(n: Long): Path = Paths.get(root, "data", f"commit-$n%06d")

  private val ManifestRe = "^v([0-9]{6})\\.json$".r

  /** Ids of committed snapshots, ascending. */
  def snapshots: Seq[Long] = {
    if (!Files.isDirectory(commitsDir)) return Seq.empty
    val stream = Files.list(commitsDir)
    try {
      stream.iterator().asScala
        .flatMap(p => ManifestRe.findFirstMatchIn(p.getFileName.toString).map(_.group(1).toLong))
        .toSeq.sorted
    } finally stream.close()
  }

  def latestSnapshot: Option[Long] = snapshots.lastOption

  /** Read the table at the latest committed snapshot (None when empty). */
  def read(): Option[DataFrame] = readAt(latestSnapshot.getOrElse(-1L))

  /** Read the table as of snapshot `n` (time travel). */
  def readAt(n: Long): Option[DataFrame] = {
    val dirs = snapshots.filter(_ <= n).map(s => dataDir(s).toString)
      .filter(d => Files.isDirectory(Paths.get(d)))
    if (dirs.isEmpty) None else Some(spark.read.parquet(dirs: _*))
  }

  /** Append `df` as a new snapshot; returns the snapshot id.
    * Computes per-output-partition lineage (row count + seq range when a
    * `seqCol` is present) from the written files themselves.
    * `coalesceTo > 0` caps the number of data files — micro-run commits
    * are often tiny and writing one file per upstream shuffle partition
    * multiplies task-launch and footer overhead across every later read. */
  def commit(df: DataFrame, metrics: Map[String, Double], seqCol: Option[String] = None,
             coalesceTo: Int = 0): Long = {
    val id = latestSnapshot.getOrElse(0L) + 1L
    val out = dataDir(id)
    val toWrite = if (coalesceTo > 0) df.coalesce(coalesceTo) else df
    // "overwrite": a dir at this id can only be a crashed run's orphan
    // (no manifest references it — see class doc), so reclaiming it is safe
    toWrite.write.mode("overwrite").parquet(out.toString)

    // lineage from the committed files (one row per data file)
    val written = spark.read.parquet(out.toString)
    val seqExpr = seqCol.map(c => col(c).cast("long")).getOrElse(lit(null).cast("long"))
    val lineage = written
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"), min(seqExpr).as("min_seq"), max(seqExpr).as("max_seq"))
      .orderBy("file")
      .collect()
      .zipWithIndex
      .map { case (r, i) =>
        val mn = if (r.isNullAt(2)) "null" else r.getLong(2).toString
        val mx = if (r.isNullAt(3)) "null" else r.getLong(3).toString
        s"""{"partition_id":$i,"n_rows":${r.getLong(1)},"min_seq":$mn,"max_seq":$mx}"""
      }

    val metricsJson = metrics.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${k}":$v""" }.mkString("{", ",", "}")
    val manifest =
      s"""{"snapshot_id":$id,
         |"data_dir":"${out.toString}",
         |"committed_at_ms":${System.currentTimeMillis()},
         |"metrics":$metricsJson,
         |"lineage":[${lineage.mkString(",")}]}""".stripMargin

    Files.createDirectories(commitsDir)
    val tmp = commitsDir.resolve(f".tmp-v$id%06d.json")
    Files.write(tmp, manifest.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, commitsDir.resolve(f"v$id%06d.json"),
      StandardCopyOption.ATOMIC_MOVE)
    id
  }

  /** All committed manifests as a DataFrame (metrics + lineage queryable). */
  def manifests(): Option[DataFrame] = {
    if (snapshots.isEmpty) None
    else Some(spark.read.option("multiLine", true)
      .json(commitsDir.resolve("v*.json").toString))
  }

  /** Simulate a crash: write data files for a would-be snapshot but no
    * manifest (test hook for resume semantics). */
  def writeOrphan(df: DataFrame): Unit = {
    val id = latestSnapshot.getOrElse(0L) + 1L
    df.write.mode("overwrite").parquet(dataDir(id).toString)
  }
}
