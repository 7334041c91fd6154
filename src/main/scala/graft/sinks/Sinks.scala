package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Export sinks (SURVEY.md §2.1 K1/K2): JSON and CSV dumps of result
  * tables with the reference's run-stamped naming
  * (fpds_high_performance.py:566-574, fpds_enhanced_extractor.py:511-533).
  *
  * The primary analytical sink is the snapshot table (K4 ≙
  * graft.table.SnapshotTable); these are interchange exports. The
  * reference's union-of-keys CSV schema merge disappears because the
  * engine's schemas are fixed up front (SURVEY.md §1.3); columns are
  * emitted in sorted order to match its sorted-header behavior. */
object Sinks {

  def stampedDir(base: String, prefix: String, stampMs: Long): String =
    s"$base/${prefix}_$stampMs"

  /** K1: JSON lines export. */
  def exportJson(df: DataFrame, base: String, prefix: String,
                 stampMs: Long = System.currentTimeMillis()): String = {
    val out = stampedDir(base, prefix, stampMs)
    df.write.mode("overwrite").json(out)
    out
  }

  /** K2: CSV export with header, columns sorted by name (the reference
    * sorts its union-of-keys header, fpds_enhanced_extractor.py:529).
    * Binary columns are hex-encoded (CSV has no binary type). */
  def exportCsv(df: DataFrame, base: String, prefix: String,
                stampMs: Long = System.currentTimeMillis()): String = {
    val out = stampedDir(base, prefix, stampMs)
    val cols = df.schema.fields.sortBy(_.name).map { f =>
      f.dataType match {
        case org.apache.spark.sql.types.BinaryType => hex(col(f.name)).as(f.name)
        case _: org.apache.spark.sql.types.ArrayType => to_json(col(f.name)).as(f.name)
        case _: org.apache.spark.sql.types.MapType => to_json(col(f.name)).as(f.name)
        case _: org.apache.spark.sql.types.StructType => to_json(col(f.name)).as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(cols.toSeq: _*).write.mode("overwrite")
      .option("header", "true").csv(out)
    out
  }
}
