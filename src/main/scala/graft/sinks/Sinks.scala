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

  /** K3: XML export (fpds_enhanced_extractor.py:535-570 `save_to_xml`).
    * No spark-xml jar ships offline, so rows are serialized with a small
    * mapPartitions pass (the sanctioned IO-edge class, like the fetch
    * stage): each part-file is a complete well-formed document — the
    * standard multi-part distributed export, fields in sorted order with
    * XML-escaped text like the reference. */
  def exportXml(df: DataFrame, base: String, prefix: String,
                stampMs: Long = System.currentTimeMillis(),
                rootTag: String = "records", rowTag: String = "record"): String = {
    val out = stampedDir(base, prefix, stampMs)
    val names = df.schema.fieldNames.sorted.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    // stringify (sorted columns, binary → hex, nested → json) BEFORE the
    // serializer so the row pass is a plain string concat
    val strCols = df.schema.fields.sortBy(_.name).map { f =>
      f.dataType match {
        case org.apache.spark.sql.types.BinaryType => hex(col(f.name)).as(f.name)
        case _: org.apache.spark.sql.types.ArrayType | _: org.apache.spark.sql.types.MapType |
             _: org.apache.spark.sql.types.StructType => to_json(col(f.name)).as(f.name)
        case _ => col(f.name).cast("string").as(f.name)
      }
    }
    def escape(s: String): String =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    df.select(strCols.toSeq: _*).mapPartitions { rows =>
      val body = rows.map { r =>
        names.indices.map { i =>
          val tag = names(i)
          if (r.isNullAt(i)) s"    <$tag/>"
          else s"    <$tag>${escape(r.getString(i))}</$tag>"
        }.mkString(s"  <$rowTag>\n", "\n", s"\n  </$rowTag>")
      }
      Iterator(s"""<?xml version="1.0" encoding="UTF-8"?>""", s"<$rootTag>") ++
        body ++ Iterator(s"</$rootTag>")
    }.write.mode("overwrite").text(out)
    out
  }
}
