package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** Remaining SURVEY.md §2 operator coverage: set-collection aggregates
  * (A6/U4), pattern extractors over text (F10), and JSON parsing (F16). */
object Extras {

  /** A6/U4: collect_set rollup — distinct market segments per nation,
    * sorted for determinism (the reference's config-stats shape,
    * lib/config_manager.py:292-331). Arrays are exploded to rows so the
    * oracle hash-compare stays scalar. */
  def q36CollectSet(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer")
    val n = Tables.load(spark, dir, "nation")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sort_array(collect_set(col("c_mktsegment"))).as("segments"),
        countDistinct(col("c_mktsegment")).as("n_segments"))
      .select(col("n_name"), col("n_segments"), posexplode(col("segments")).as(Seq("pos", "segment")))
      .orderBy("n_name", "pos")
  }

  val q36Sql: String =
    """SELECT n_name, n_segments, CAST(pos - 1 AS INTEGER) AS pos, segment FROM (
      |  SELECT n_name, n_segments, seg AS segment,
      |    ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY seg) AS pos
      |  FROM (
      |    SELECT n_name,
      |      COUNT(DISTINCT c_mktsegment) AS n_segments,
      |      UNNEST(list_sort(list(DISTINCT c_mktsegment))) AS seg
      |    FROM customer JOIN nation ON c_nationkey = n_nationkey
      |    GROUP BY n_name))
      |ORDER BY n_name, pos""".stripMargin

  /** F10: pattern extractors — currency amounts pulled out of generated
    * caption-like text via regexp_extract_all + explode (lib/utils.py:
    * 296-416 semantics: find-all then dedup). */
  def q37PatternExtract(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders").filter(col("o_orderkey") % 10 === 0)
    val text = o.select(
      col("o_orderkey"),
      concat(lit("obligation $"), col("o_totalprice").cast("decimal(14,2)").cast("string"),
        lit(" signed "), date_format(col("o_orderdate"), "MM/dd/yyyy"),
        lit(" ref $"), (col("o_orderkey") % 1000).cast("string"), lit(".00")).as("txt"))
    text.select(col("o_orderkey"),
        posexplode(expr("regexp_extract_all(txt, '\\\\$([0-9]+\\\\.[0-9]{2})', 1)"))
          .as(Seq("pos", "amount_str")))
      .select(col("o_orderkey"), col("pos"),
        col("amount_str").cast("double").as("amount"))
      .orderBy("o_orderkey", "pos")
  }

  val q37Sql: String =
    """SELECT o_orderkey, CAST(pos - 1 AS INTEGER) AS pos,
      |  CAST(amount_str AS DOUBLE) AS amount
      |FROM (
      |  SELECT o_orderkey,
      |    generate_subscripts(amts, 1) AS pos,
      |    UNNEST(amts) AS amount_str
      |  FROM (
      |    SELECT o_orderkey,
      |      regexp_extract_all(
      |        'obligation $' || CAST(CAST(o_totalprice AS DECIMAL(14,2)) AS VARCHAR)
      |          || ' signed ' || strftime(o_orderdate, '%m/%d/%Y')
      |          || ' ref $' || CAST(o_orderkey % 1000 AS VARCHAR) || '.00',
      |        '\$([0-9]+\.[0-9]{2})', 1) AS amts
      |    FROM orders WHERE o_orderkey % 10 = 0))
      |ORDER BY o_orderkey, pos""".stripMargin

  /** F16: from_json over the events props column + aggregate on the
    * parsed field (reference: json.load shape dispatch,
    * bulk_insert_helper.py:83-91). */
  def q38JsonParse(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val schema = StructType(Seq(StructField("k", IntegerType)))
    e.select(col("event_type"), from_json(col("props"), schema).getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n"),
        sum(col("k").cast("long")).as("k_sum"),
        min(col("k")).as("k_min"), max(col("k")).as("k_max"))
      .orderBy("event_type")
  }

  val q38Sql: String =
    """SELECT event_type, COUNT(k) AS n, CAST(SUM(k) AS BIGINT) AS k_sum,
      |  MIN(k) AS k_min, MAX(k) AS k_max
      |FROM (
      |  SELECT event_type, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
      |  FROM events)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** F12: month/year range → (first day, last day) via trunc/last_day
    * (fpds_high_performance.py:585-626 calendar.monthrange semantics). */
  def q39DateRange(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    o.select(date_format(trunc(col("o_orderdate"), "MM"), "yyyy-MM-dd").as("month_start"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"))
      .groupBy("month_start", "month_end")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("month_start")
  }

  val q39Sql: String =
    """SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
      |  strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
      |  COUNT(*) AS n_orders
      |FROM orders GROUP BY 1, 2 ORDER BY 1""".stripMargin

  /** Fallback selector chain + per-field confidence (SURVEY.md §2.11 —
    * lib/rule_parser.py:177-201 first-non-empty-of-N ≙ coalesce; :109-113
    * confidence attach). Three extractors of descending confidence run
    * over a synthesized page snippet; the first that matches wins. */
  def q40FallbackExtract(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(spark, dir, "part")
    // page snippet shape varies by partkey: some have the primary span,
    // some only the legacy cell, some only raw text
    val pages = p.select(col("p_partkey"),
      when(col("p_partkey") % 3 === 0,
        concat(lit("<span class=\"price\">"), col("p_retailprice").cast("decimal(12,2)").cast("string"), lit("</span>")))
        .when(col("p_partkey") % 3 === 1,
          concat(lit("<td class=\"amount\">"), col("p_retailprice").cast("decimal(12,2)").cast("string"), lit("</td>")))
        .otherwise(concat(lit("price is "), col("p_retailprice").cast("decimal(12,2)").cast("string"), lit(" usd")))
        .as("snippet"))
    val primary = regexp_extract(col("snippet"), "<span class=\"price\">([0-9.]+)</span>", 1)
    val legacy = regexp_extract(col("snippet"), "<td class=\"amount\">([0-9.]+)</td>", 1)
    val loose = regexp_extract(col("snippet"), "price is ([0-9.]+)", 1)
    pages.select(col("p_partkey"),
        coalesce(nullif(primary, lit("")), nullif(legacy, lit("")), nullif(loose, lit("")))
          .cast("double").as("value"),
        when(primary =!= "", 0.9).when(legacy =!= "", 0.6).otherwise(0.3).as("confidence"))
      .orderBy("p_partkey")
  }

  val q40Sql: String =
    """SELECT p_partkey,
      |  CAST(COALESCE(NULLIF(regexp_extract(snippet, '<span class="price">([0-9.]+)</span>', 1), ''),
      |                NULLIF(regexp_extract(snippet, '<td class="amount">([0-9.]+)</td>', 1), ''),
      |                NULLIF(regexp_extract(snippet, 'price is ([0-9.]+)', 1), '')) AS DOUBLE) AS value,
      |  CASE WHEN regexp_extract(snippet, '<span class="price">([0-9.]+)</span>', 1) <> '' THEN 0.9
      |       WHEN regexp_extract(snippet, '<td class="amount">([0-9.]+)</td>', 1) <> '' THEN 0.6
      |       ELSE 0.3 END AS confidence
      |FROM (
      |  SELECT p_partkey,
      |    CASE WHEN p_partkey % 3 = 0 THEN '<span class="price">' || CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS VARCHAR) || '</span>'
      |         WHEN p_partkey % 3 = 1 THEN '<td class="amount">' || CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS VARCHAR) || '</td>'
      |         ELSE 'price is ' || CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS VARCHAR) || ' usd' END AS snippet
      |  FROM part)
      |ORDER BY p_partkey""".stripMargin
}
