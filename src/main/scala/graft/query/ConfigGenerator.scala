package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Phase-1 selector-config bootstrap seam (SURVEY.md §2.11; VERDICT r02
  * missing #3) — the pluggable analogue of the reference's
  * `LLMExtractor.analyze_pages` (/root/reference/lib/llm_extractor.py:43-225),
  * which asks an external LLM to propose selectors for target fields from
  * example pages. An external API is unportable offline (and the
  * reference's `eval` of returned code is rejected by design), so the
  * seam is a trait: the workflow composes against ANY generator, and the
  * default is a deterministic, data-driven one. */
trait ConfigGenerator {

  /** Propose a config for `targetFields` from example pages.
    * `name`/`domain`/`tags`/`createdAtMs` metadata is the caller's. */
  def generate(examplePages: DataFrame, htmlCol: String,
               targetFields: Seq[String], name: String,
               domain: String = "", tags: Seq[String] = Nil,
               createdAtMs: Long = 0L): ExtractionConfig
}

/** Deterministic bootstrap: probe a fixed registry of candidate selector
  * forms per field over the example pages IN ONE aggregation pass, then
  * pick per field the candidate with the highest non-null extraction
  * rate (ties → registry order). The winner becomes the primary selector
  * with confidence = its hit rate; remaining candidates that hit at all
  * become the fallback chain, best-first. This is the same job the
  * reference delegates to the LLM — inferring selectors from evidence in
  * example pages — done measurably instead of generatively. */
object HeuristicConfigGenerator extends ConfigGenerator {

  /** Candidate registry for one field, in tie-break order: bare class
    * form, then the tag-qualified class forms the CSS compiler supports
    * (span/div/td — td being the table-cell form the reference's tabular
    * result pages favor), id form, meta tag, labelled-number regex (+ the
    * title tag for the title field). Pluggable by design — a
    * domain-specific generator can extend the trait with its own
    * registry; every candidate is one more codegen'd column in the same
    * single aggregation pass. */
  def candidates(field: String): Seq[String] = {
    val generic = Seq(
      s"css:.$field",
      s"css:span.$field",
      s"css:div.$field",
      s"css:td.$field",
      s"css:div#$field",
      s"meta:$field",
      s"regex:$field is ([0-9.]+)")
    if (field == "title") generic :+ "title" else generic
  }

  /** Per-(field, candidate) hit counts over the example pages:
    * `(field, ord, selector, hits, total)` — ONE map-side-combining
    * aggregate over the pages (every candidate is a codegen'd column in
    * the same projection), unpivoted with `stack`. */
  def scores(examplePages: DataFrame, htmlCol: String,
             targetFields: Seq[String]): DataFrame = {
    val html = col(htmlCol)
    val cands = targetFields.sorted.flatMap(f =>
      candidates(f).zipWithIndex.map { case (sel, ord) => (f, ord, sel) })
    val sums = cands.zipWithIndex.map { case ((_, _, sel), i) =>
      sum(when(RuleExtractor.compileSelector(sel)(html).isNotNull, 1L)
        .otherwise(0L)).as(s"c_$i")
    } :+ count(lit(1)).as("total")
    val one = examplePages.agg(sums.head, sums.tail: _*)
    val stackArgs = cands.zipWithIndex
      .map { case ((f, ord, sel), i) => s"'$f', $ord, '${sel.replace("'", "''")}', c_$i" }
      .mkString(", ")
    one.selectExpr("total",
        s"stack(${cands.size}, $stackArgs) AS (field, ord, selector, hits)")
      .select("field", "ord", "selector", "hits", "total")
  }

  override def generate(examplePages: DataFrame, htmlCol: String,
                        targetFields: Seq[String], name: String,
                        domain: String, tags: Seq[String],
                        createdAtMs: Long): ExtractionConfig = {
    // the score table is fields × |registry| rows — driver-side config
    // assembly over it is control-plane work, like the store itself
    val rows = scores(examplePages, htmlCol, targetFields)
      .collect()
      // hits is NULL (not 0) when there are zero example pages — sum()
      // over an empty frame; the zero-page case must yield a
      // zero-confidence config, not an NPE
      .map(r => (r.getString(0), r.getInt(1), r.getString(2),
        if (r.isNullAt(3)) 0L else r.getLong(3), r.getLong(4)))
    val byField = rows.groupBy(_._1)
    val picked = targetFields.sorted.flatMap { f =>
      byField.get(f).map { cs =>
        val ordered = cs.sortBy(c => (-c._4, c._2)).toSeq
        val (_, _, winner, hits, total) = ordered.head
        val rate = if (total == 0) 0.0 else hits.toDouble / total
        val fallbacks = ordered.tail.filter(_._4 > 0).map(_._3)
        (f, winner, math.rint(rate * 10000) / 10000, fallbacks)
      }
    }
    ExtractionConfig(
      name = name, domain = domain, tags = tags,
      selectors = picked.map(p => p._1 -> p._2).toMap,
      confidence = picked.map(p => p._1 -> p._3).toMap,
      createdAtMs = createdAtMs,
      fallbacks = picked.filter(_._4.nonEmpty).map(p => p._1 -> p._4).toMap)
  }
}
