package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Config-driven extraction executor — the Spark re-expression of the
  * reference's `RuleParser.extract_from_html`
  * (/root/reference/lib/rule_parser.py:62-134, selector eval :136-175,
  * fallback chains :177-201).
  *
  * The reference stores selector CODE STRINGS and `eval`s them against
  * BeautifulSoup. Here a selector is DATA compiled through a registry of
  * named, pre-compiled selector forms (SURVEY.md §2.11) into native
  * Catalyst `Column` expressions — never eval, never a UDF, so the whole
  * extraction plan stays inside whole-stage codegen and Catalyst can
  * prune/push it like any other projection:
  *
  *  - `css:tag.class` / `css:tag#id` / `css:tag` — first matching
  *    element's text (get_text(strip=True) approximated by stripping
  *    inner tags + trim);
  *  - `regex:<pattern>` — first match's group 1;
  *  - `title` — the `<title>` text;
  *  - `meta:<name>` — the named `<meta>`'s content attribute.
  *
  * Per field the executor emits `<f>_value`, `<f>_confidence` (config
  * score, default 0.5 — rule_parser.py:112), `<f>_method`, plus a page
  * `extract_success_rate` (rule_parser.py:128-131). Method semantics
  * mirror the reference EXACTLY, including its quirk: `'primary'`
  * whenever a value exists — even when a fallback produced it — and
  * `'fallback'` when every selector came up empty
  * (rule_parser.py:115-119 sets `'primary' if value else 'fallback'`).
  */
object RuleExtractor {

  /** Compile one selector string to a Column over the html column.
    * Unknown forms yield null (the reference logs and returns None). */
  def compileSelector(sel: String): Column => Column = {
    def firstGroup(pattern: String): Column => Column =
      html => nullif(trim(regexp_replace(
        regexp_extract(html, pattern, 1), "<[^>]*>", "")), lit(""))
    sel match {
      case s if s.startsWith("regex:") =>
        html => nullif(trim(regexp_extract(html, s.stripPrefix("regex:"), 1)), lit(""))
      case "title" =>
        firstGroup("(?s)<title\\b[^>]*>(.*?)</title>")
      case s if s.startsWith("meta:") =>
        val name = java.util.regex.Pattern.quote(s.stripPrefix("meta:"))
        firstGroup(s"""<meta\\b[^>]*name="$name"[^>]*content="([^"]*)"""")
      case s if s.startsWith("css:") =>
        compileCss(s.stripPrefix("css:"))
      case _ =>
        _ => lit(null).cast("string")
    }
  }

  /** CSS subset: `tag`, `tag.class`, `tag#id`, `.class`. */
  private def compileCss(css: String): Column => Column = {
    val TagClass = "^([a-zA-Z0-9]+)\\.([\\w-]+)$".r
    val TagId = "^([a-zA-Z0-9]+)#([\\w-]+)$".r
    val BareClass = "^\\.([\\w-]+)$".r
    val BareTag = "^([a-zA-Z0-9]+)$".r
    val pattern = css match {
      case TagClass(tag, cls) =>
        s"""(?s)<$tag\\b[^>]*class="[^"]*\\b$cls\\b[^"]*"[^>]*>(.*?)</$tag>"""
      case TagId(tag, id) =>
        s"""(?s)<$tag\\b[^>]*id="$id"[^>]*>(.*?)</$tag>"""
      case BareClass(cls) =>
        s"""(?s)<\\w+\\b[^>]*class="[^"]*\\b$cls\\b[^"]*"[^>]*>(.*?)</\\w+>"""
      case BareTag(tag) =>
        s"""(?s)<$tag\\b[^>]*>(.*?)</$tag>"""
      case _ => return (_ => lit(null).cast("string"))
    }
    html => nullif(trim(regexp_replace(
      regexp_extract(html, pattern, 1), "<[^>]*>", "")), lit(""))
  }

  /** Run `cfg` over `pages`: every column except `htmlCol` is carried
    * through; per-field value/confidence/method columns and the page
    * success rate are appended. One narrow codegen'd projection. */
  def extract(pages: DataFrame, htmlCol: String, cfg: ExtractionConfig): DataFrame = {
    val html = col(htmlCol)
    val fields = cfg.selectors.toSeq.sortBy(_._1)
    val fieldCols = fields.flatMap { case (f, sel) =>
      val primary = compileSelector(sel)(html)
      val chain = primary +: cfg.fallbacks.getOrElse(f, Nil).map(compileSelector(_)(html))
      val value = coalesce(chain: _*)
      Seq(
        value.as(s"${f}_value"),
        lit(cfg.confidence.getOrElse(f, 0.5)).as(s"${f}_confidence"),
        // reference quirk preserved — see class doc
        when(value.isNotNull, "primary").otherwise("fallback").as(s"${f}_method"))
    }
    val carried = pages.columns.filterNot(_ == htmlCol).map(col)
    val out = pages.select(carried ++ fieldCols: _*)
    val successRate = fields
      .map { case (f, _) => when(col(s"${f}_value").isNotNull, 1).otherwise(0) }
      .reduce(_ + _).cast("double") / lit(fields.size.toDouble)
    out.withColumn("extract_success_rate", round(successRate, 4))
  }

  /** A4 per-field extraction stats (rule_parser.py:386-438): one row per
    * field `(field, successful, total, success_rate)` plus a `__pages__`
    * summary row (`successful_pages`, `total_pages`, `page_success_rate`).
    * A single map-side-combining aggregate over the extracted table. */
  def extractionStats(extracted: DataFrame, fieldNames: Seq[String]): DataFrame = {
    val fields = fieldNames.sorted
    val stackExpr = "stack(" + fields.size + ", " +
      fields.map(f => s"'$f', ${f}_value").mkString(", ") + ") as (field, value)"
    val perField = extracted.selectExpr(stackExpr)
      .groupBy("field")
      .agg(
        sum(when(col("value").isNotNull, 1L).otherwise(0L)).as("successful"),
        count(lit(1)).as("total"))
    val pages = extracted.agg(
      sum(when(col("extract_success_rate") > 0, 1L).otherwise(0L)).as("successful"),
      count(lit(1)).as("total"))
      .withColumn("field", lit("__pages__"))
      .select("field", "successful", "total")
    perField.unionByName(pages)
      .withColumn("success_rate", round(col("successful") / col("total"), 4))
      .orderBy("field")
  }

  /** One field's validation rules (rule_parser.py:292-342). */
  final case class FieldRules(
      required: Boolean = false,
      minLength: Option[Int] = None,
      maxLength: Option[Int] = None,
      pattern: Option[String] = None)

  /** P6 per-record validation report: `{valid, errors[], warnings[]}`
    * built with array/higher-order functions (no UDF), matching
    * `validate_extraction`: required/empty and pattern violations are
    * errors; length violations are warnings; valid ⇔ no errors. */
  def validate(extracted: DataFrame, rules: Map[String, FieldRules]): DataFrame = {
    val errs = rules.toSeq.sortBy(_._1).flatMap { case (f, r) =>
      val v = col(s"${f}_value")
      val required =
        if (r.required) Some(when(v.isNull, lit(s"Required field '$f' is empty")))
        else None
      val pat = r.pattern.map(p =>
        when(v.isNotNull && !v.rlike(p), lit(s"Field '$f' doesn't match required pattern")))
      required.toSeq ++ pat.toSeq
    }
    val warns = rules.toSeq.sortBy(_._1).flatMap { case (f, r) =>
      val v = col(s"${f}_value")
      val mn = r.minLength.map(n =>
        when(v.isNotNull && length(v) < n, lit(s"Field '$f' is shorter than minimum length")))
      val mx = r.maxLength.map(n =>
        when(v.isNotNull && length(v) > n, lit(s"Field '$f' is longer than maximum length")))
      mn.toSeq ++ mx.toSeq
    }
    def compact(cols: Seq[Column]): Column =
      if (cols.isEmpty) array().cast("array<string>")
      else filter(array(cols: _*), _.isNotNull)
    extracted
      .withColumn("errors", compact(errs))
      .withColumn("warnings", compact(warns))
      .withColumn("valid", size(col("errors")) === 0)
  }
}
