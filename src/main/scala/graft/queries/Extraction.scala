package graft.queries

import graft.Tables
import graft.query.{ExtractionConfig, RuleExtractor}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Config-driven extraction pipeline queries (VERDICT r01 missing #1/#2/#3
  * + K4 text search) — each an oracle-checked entry over the testdata
  * tables, all pure Catalyst projections/aggregations. */
object Extraction {

  /** The demo config: four fields across every selector form, with a
    * price fallback chain (primary span → legacy cell → loose regex). */
  val demoConfig: ExtractionConfig = ExtractionConfig(
    name = "part-pages", domain = "parts.test",
    tags = Seq("demo"),
    selectors = Map(
      "title" -> "title",
      "price" -> "css:span.price",
      "vendor" -> "css:div.vendor",
      "mfgr" -> "meta:mfgr"),
    confidence = Map("title" -> 0.95, "price" -> 0.8, "vendor" -> 0.6),
    createdAtMs = 0L,
    fallbacks = Map("price" -> Seq("css:td.amount", "regex:price is ([0-9.]+)")))

  /** Synthesized page table over `part`: html shape varies by partkey so
    * every selector outcome (primary hit, fallback hit, miss) occurs. */
  private def pages(spark: SparkSession, dir: String): DataFrame = {
    // the selector chains downstream run ~10 multi-line regexes per page
    // — spread the one-task scan so extraction runs full-width (§2.5)
    val p = Tables.spread(Tables.load(spark, dir, "part")
      .select("p_partkey", "p_name", "p_type", "p_brand", "p_retailprice"))
    val price = col("p_retailprice").cast("decimal(12,2)").cast("string")
    p.select(col("p_partkey"),
      concat(
        lit("<html><head><title>Part "), col("p_name"), lit("</title>"),
        when(col("p_partkey") % 4 === 0,
          concat(lit("<meta name=\"mfgr\" content=\""), col("p_type"), lit("\">")))
          .otherwise(lit("")),
        lit("</head><body>"),
        when(col("p_partkey") % 3 === 0,
          concat(lit("<span class=\"price\">"), price, lit("</span>")))
          .when(col("p_partkey") % 3 === 1,
            concat(lit("<td class=\"amount\">"), price, lit("</td>")))
          .otherwise(concat(lit("price is "), price, lit(" usd"))),
        when(col("p_partkey") % 2 === 0,
          concat(lit("<div class=\"vendor\"><b>"), col("p_brand"), lit("</b></div>")))
          .otherwise(lit("")),
        lit("</body></html>")).as("html"))
  }

  /** The DuckDB-side page synthesis, shared by the q44/q45/q46 oracles. */
  private val pagesSql: String =
    """SELECT p_partkey,
      |  '<html><head><title>Part ' || p_name || '</title>' ||
      |  CASE WHEN p_partkey % 4 = 0 THEN '<meta name="mfgr" content="' || p_type || '">' ELSE '' END ||
      |  '</head><body>' ||
      |  CASE WHEN p_partkey % 3 = 0 THEN '<span class="price">' || CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS VARCHAR) || '</span>'
      |       WHEN p_partkey % 3 = 1 THEN '<td class="amount">' || CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS VARCHAR) || '</td>'
      |       ELSE 'price is ' || CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS VARCHAR) || ' usd' END ||
      |  CASE WHEN p_partkey % 2 = 0 THEN '<div class="vendor"><b>' || p_brand || '</b></div>' ELSE '' END ||
      |  '</body></html>' AS html
      |FROM part""".stripMargin

  /** The DuckDB transliteration of the compiled selector chains. */
  private val extractedSql: String =
    s"""WITH pages AS ($pagesSql),
       |raw AS (
       |  SELECT p_partkey,
       |    NULLIF(TRIM(regexp_replace(regexp_extract(html, '(?s)<title\\b[^>]*>(.*?)</title>', 1), '<[^>]*>', '', 'g')), '') AS title_value,
       |    NULLIF(TRIM(regexp_replace(regexp_extract(html, '(?s)<span\\b[^>]*class="[^"]*\\bprice\\b[^"]*"[^>]*>(.*?)</span>', 1), '<[^>]*>', '', 'g')), '') AS price_primary,
       |    NULLIF(TRIM(regexp_replace(regexp_extract(html, '(?s)<td\\b[^>]*class="[^"]*\\bamount\\b[^"]*"[^>]*>(.*?)</td>', 1), '<[^>]*>', '', 'g')), '') AS price_fb1,
       |    NULLIF(TRIM(regexp_extract(html, 'price is ([0-9.]+)', 1)), '') AS price_fb2,
       |    NULLIF(TRIM(regexp_replace(regexp_extract(html, '(?s)<div\\b[^>]*class="[^"]*\\bvendor\\b[^"]*"[^>]*>(.*?)</div>', 1), '<[^>]*>', '', 'g')), '') AS vendor_value,
       |    NULLIF(TRIM(regexp_replace(regexp_extract(html, '<meta\\b[^>]*name="mfgr"[^>]*content="([^"]*)"', 1), '<[^>]*>', '', 'g')), '') AS mfgr_value
       |  FROM pages)
       |SELECT p_partkey,
       |  mfgr_value, 0.5 AS mfgr_confidence,
       |  CASE WHEN mfgr_value IS NOT NULL THEN 'primary' ELSE 'fallback' END AS mfgr_method,
       |  COALESCE(price_primary, price_fb1, price_fb2) AS price_value, 0.8 AS price_confidence,
       |  CASE WHEN COALESCE(price_primary, price_fb1, price_fb2) IS NOT NULL THEN 'primary' ELSE 'fallback' END AS price_method,
       |  title_value, 0.95 AS title_confidence,
       |  CASE WHEN title_value IS NOT NULL THEN 'primary' ELSE 'fallback' END AS title_method,
       |  vendor_value, 0.6 AS vendor_confidence,
       |  CASE WHEN vendor_value IS NOT NULL THEN 'primary' ELSE 'fallback' END AS vendor_method,
       |  ROUND((
       |    CASE WHEN mfgr_value IS NOT NULL THEN 1 ELSE 0 END +
       |    CASE WHEN COALESCE(price_primary, price_fb1, price_fb2) IS NOT NULL THEN 1 ELSE 0 END +
       |    CASE WHEN title_value IS NOT NULL THEN 1 ELSE 0 END +
       |    CASE WHEN vendor_value IS NOT NULL THEN 1 ELSE 0 END) / 4.0, 4) AS extract_success_rate
       |FROM raw""".stripMargin

  /** The executor output over the synthesized pages (shared by q44-q46). */
  def extracted(spark: SparkSession, dir: String): DataFrame =
    RuleExtractor.extract(pages(spark, dir), "html", demoConfig)

  /** Config-driven extraction executor (rule_parser.py:62-201). */
  def q44ConfigExtract(spark: SparkSession, dir: String): DataFrame =
    extracted(spark, dir).orderBy("p_partkey")

  val q44Sql: String = s"$extractedSql ORDER BY p_partkey"

  /** A4 per-field extraction stats (rule_parser.py:386-438). */
  def q45ExtractionStats(spark: SparkSession, dir: String): DataFrame =
    RuleExtractor.extractionStats(extracted(spark, dir), demoConfig.selectors.keys.toSeq)

  val q45Sql: String =
    s"""WITH ex AS ($extractedSql)
       |SELECT field, successful, total, ROUND(successful / CAST(total AS DOUBLE), 4) AS success_rate
       |FROM (
       |  SELECT 'mfgr' AS field, CAST(SUM(CASE WHEN mfgr_value IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS successful, CAST(COUNT(*) AS BIGINT) AS total FROM ex
       |  UNION ALL
       |  SELECT 'price', CAST(SUM(CASE WHEN price_value IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT), CAST(COUNT(*) AS BIGINT) FROM ex
       |  UNION ALL
       |  SELECT 'title', CAST(SUM(CASE WHEN title_value IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT), CAST(COUNT(*) AS BIGINT) FROM ex
       |  UNION ALL
       |  SELECT 'vendor', CAST(SUM(CASE WHEN vendor_value IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT), CAST(COUNT(*) AS BIGINT) FROM ex
       |  UNION ALL
       |  SELECT '__pages__', CAST(SUM(CASE WHEN extract_success_rate > 0 THEN 1 ELSE 0 END) AS BIGINT), CAST(COUNT(*) AS BIGINT) FROM ex)
       |ORDER BY field""".stripMargin

  /** P6 full validation report (rule_parser.py:292-342): per-record
    * valid/errors/warnings. Arrays are built with higher-order functions;
    * the oracle-compared projection joins them (the driver's hash compare
    * needs scalar columns). */
  def q46ValidationReport(spark: SparkSession, dir: String): DataFrame = {
    val rules = Map(
      "title" -> RuleExtractor.FieldRules(required = true, minLength = Some(20)),
      "price" -> RuleExtractor.FieldRules(required = true, pattern = Some("^[0-9]+\\.[0-9]+$")),
      "vendor" -> RuleExtractor.FieldRules(required = true, maxLength = Some(12)))
    RuleExtractor.validate(extracted(spark, dir), rules)
      .select(col("p_partkey"), col("valid"),
        size(col("errors")).as("n_errors"), size(col("warnings")).as("n_warnings"),
        array_join(col("errors"), "|").as("errors_str"),
        array_join(col("warnings"), "|").as("warnings_str"))
      .orderBy("p_partkey")
  }

  val q46Sql: String =
    s"""WITH ex AS ($extractedSql)
       |SELECT p_partkey,
       |  (price_err IS NULL AND price_pat_err IS NULL AND title_err IS NULL AND vendor_err IS NULL) AS valid,
       |  CAST((CASE WHEN price_err IS NOT NULL THEN 1 ELSE 0 END) +
       |       (CASE WHEN price_pat_err IS NOT NULL THEN 1 ELSE 0 END) +
       |       (CASE WHEN title_err IS NOT NULL THEN 1 ELSE 0 END) +
       |       (CASE WHEN vendor_err IS NOT NULL THEN 1 ELSE 0 END) AS INTEGER) AS n_errors,
       |  CAST((CASE WHEN title_warn IS NOT NULL THEN 1 ELSE 0 END) +
       |       (CASE WHEN vendor_warn IS NOT NULL THEN 1 ELSE 0 END) AS INTEGER) AS n_warnings,
       |  concat_ws('|', price_err, price_pat_err, title_err, vendor_err) AS errors_str,
       |  concat_ws('|', title_warn, vendor_warn) AS warnings_str
       |FROM (
       |  SELECT p_partkey,
       |    CASE WHEN price_value IS NULL THEN 'Required field ''price'' is empty' END AS price_err,
       |    CASE WHEN price_value IS NOT NULL AND NOT regexp_matches(price_value, '^[0-9]+\\.[0-9]+$$') THEN 'Field ''price'' doesn''t match required pattern' END AS price_pat_err,
       |    CASE WHEN title_value IS NULL THEN 'Required field ''title'' is empty' END AS title_err,
       |    CASE WHEN vendor_value IS NULL THEN 'Required field ''vendor'' is empty' END AS vendor_err,
       |    CASE WHEN title_value IS NOT NULL AND length(title_value) < 20 THEN 'Field ''title'' is shorter than minimum length' END AS title_warn,
       |    CASE WHEN vendor_value IS NOT NULL AND length(vendor_value) > 12 THEN 'Field ''vendor'' is longer than maximum length' END AS vendor_warn
       |  FROM ex)
       |ORDER BY p_partkey""".stripMargin

  /** Phase-1 selector bootstrap (crawler_framework.py:118-178 via the
    * deterministic generator — VERDICT r02 missing #2/#3): per target
    * field, probe the candidate-selector registry over the example pages
    * in ONE aggregation pass and emit the winning selector (highest hit
    * rate, ties → registry order), its evidence, and the fallback chain
    * the losers with any hits form. The same scores feed
    * [[graft.query.HeuristicConfigGenerator.generate]]. */
  def q49SelectorBootstrap(spark: SparkSession, dir: String): DataFrame = {
    val sc = graft.query.HeuristicConfigGenerator.scores(
      pages(spark, dir), "html", Seq("mfgr", "price", "title", "vendor"))
    val w = Window.partitionBy("field").orderBy(desc("hits"), col("ord"))
    val ranked = sc.withColumn("rn", row_number().over(w))
    val fb = ranked.filter(col("rn") > 1 && col("hits") > 0)
      .groupBy("field")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("rn"), col("selector")))),
          x => x.getField("selector")), "|").as("fb"))
    ranked.filter(col("rn") === 1)
      .join(fb, Seq("field"), "left")
      .select(col("field"), col("selector"), col("hits"), col("total"),
        // raw IEEE division, not round(): bit-deterministic across engines
        (col("hits") / col("total")).as("confidence"),
        coalesce(col("fb"), lit("")).as("fallbacks"))
      .orderBy("field")
  }

  /** One candidate's DuckDB hit-count leg — the SQL transliteration of
    * [[graft.query.RuleExtractor.compileSelector]] for the registry's
    * three-plus-title selector forms. */
  private def candHitSql(field: String, ord: Int, sel: String): String = {
    def stripped(pat: String) =
      s"NULLIF(TRIM(regexp_replace(regexp_extract(html, '$pat', 1), '<[^>]*>', '', 'g')), '')"
    val value = sel match {
      case s if s.startsWith("regex:") =>
        s"NULLIF(TRIM(regexp_extract(html, '${s.stripPrefix("regex:")}', 1)), '')"
      case "title" => stripped("(?s)<title\\b[^>]*>(.*?)</title>")
      case s if s.startsWith("meta:") =>
        stripped(s"""<meta\\b[^>]*name="${s.stripPrefix("meta:")}"[^>]*content="([^"]*)"""")
      case s if s.startsWith("css:.") =>
        stripped(s"""(?s)<\\w+\\b[^>]*class="[^"]*\\b${s.stripPrefix("css:.")}\\b[^"]*"[^>]*>(.*?)</\\w+>""")
      case s if s.startsWith("css:") && s.contains("#") =>
        val Array(tag, id) = s.stripPrefix("css:").split("#", 2)
        stripped(s"""(?s)<$tag\\b[^>]*id="$id"[^>]*>(.*?)</$tag>""")
      case s if s.startsWith("css:") && s.contains(".") => // tag.class form
        val Array(tag, cls) = s.stripPrefix("css:").split("\\.", 2)
        stripped(s"""(?s)<$tag\\b[^>]*class="[^"]*\\b$cls\\b[^"]*"[^>]*>(.*?)</$tag>""")
      case other => throw new IllegalArgumentException(other)
    }
    s"""SELECT '$field' AS field, $ord AS ord, '$sel' AS selector,
       |  CAST(SUM(CASE WHEN $value IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
       |  CAST(COUNT(*) AS BIGINT) AS total FROM pages""".stripMargin
  }

  val q49Sql: String = {
    val legs = Seq("mfgr", "price", "title", "vendor").flatMap(f =>
      graft.query.HeuristicConfigGenerator.candidates(f).zipWithIndex
        .map { case (sel, ord) => candHitSql(f, ord, sel) })
    s"""WITH pages AS ($pagesSql),
       |hits AS (${legs.mkString("\n  UNION ALL\n")}),
       |ranked AS (
       |  SELECT h.*, ROW_NUMBER() OVER (PARTITION BY field ORDER BY hits DESC, ord) AS rn
       |  FROM hits h)
       |SELECT r.field, r.selector, r.hits, r.total,
       |  r.hits / CAST(r.total AS DOUBLE) AS confidence,
       |  COALESCE(f.fb, '') AS fallbacks
       |FROM ranked r LEFT JOIN (
       |  SELECT field, string_agg(selector, '|' ORDER BY hits DESC, ord) AS fb
       |  FROM ranked WHERE rn > 1 AND hits > 0 GROUP BY field) f USING (field)
       |WHERE r.rn = 1
       |ORDER BY r.field""".stripMargin
  }

  /** K4 tail — text-search column: the Mongo text-index analogue
    * (mongo_service.py:62-66 creates a text index over searchable
    * fields). A precomputed lower-cased concat + contains predicate,
    * prunable/pushable like any other column. */
  def q47TextSearch(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
      .withColumn("searchable",
        lower(concat_ws(" ", col("lang"), col("source"), col("text"))))
    d.filter(col("searchable").contains("data"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_hits"), min("doc_id").as("first_doc"))
      .orderBy("lang")
  }

  val q47Sql: String =
    """SELECT lang, COUNT(*) AS n_hits, MIN(doc_id) AS first_doc FROM (
      |  SELECT doc_id, lang,
      |    lower(concat_ws(' ', lang, source, text)) AS searchable
      |  FROM documents)
      |WHERE searchable LIKE '%data%'
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** W1 partitioned twin of q09: the same last-50 sliding stats but keyed
    * per user — the per-proxy shape the engine's controller actually uses
    * (W2), with NO single-partition global sort (VERDICT r01 #6). */
  def q09bKeyedWindow(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events").filter(col("event_type") === "click")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-49, 0)
    e.select(
        col("user_id"), col("event_id"),
        sum(col("value").cast("decimal(18,4)")).over(w).cast("double").as("win_sum"),
        count(lit(1)).over(w).as("win_n"))
      // no round(): a half-tie rounds differently across engines; the raw
      // IEEE division of identical doubles is bit-deterministic
      .withColumn("win_avg", col("win_sum") / col("win_n"))
      .orderBy("user_id", "event_id")
  }

  val q09bSql: String =
    """SELECT user_id, event_id, CAST(win_sum_d AS DOUBLE) AS win_sum, win_n,
      |  CAST(win_sum_d AS DOUBLE) / win_n AS win_avg
      |FROM (
      |  SELECT user_id, event_id,
      |    SUM(CAST(value AS DECIMAL(18,4))) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN 49 PRECEDING AND CURRENT ROW) AS win_sum_d,
      |    COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN 49 PRECEDING AND CURRENT ROW) AS win_n
      |  FROM events WHERE event_type = 'click')
      |ORDER BY user_id, event_id""".stripMargin
}
