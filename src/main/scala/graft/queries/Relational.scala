package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator coverage (SURVEY.md §2.2–§2.8): filters, joins,
  * aggregations, windows, sorts/top-k, set ops, type coercion, field-name
  * cleaning, regex extraction.
  *
  * Oracle-parity rules (the driver hash-compares against DuckDB):
  *  - money sums go through `decimal` so both engines sum exactly;
  *  - final numeric outputs are cast to double/long so value repr matches;
  *  - every result carries a deterministic total `orderBy`.
  */
object Relational {

  /** Exact money sum: cast each double to decimal(18,4) first, sum
    * exactly, expose as double. Matches DuckDB's exact DECIMAL sum. */
  private def dsum(c: Column): Column = sum(c.cast("decimal(18,4)")).cast("double")

  /** TPC-H Q1-shaped pricing summary: group-agg (A2/A4 analogue). */
  def q01PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    li.filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q6-shaped scan filter (P1 predicate pushdown shape). */
  def q02FilterRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    li.filter(
        col("l_shipdate") >= to_timestamp(lit("1995-01-01 00:00:00")) &&
        col("l_shipdate") <  to_timestamp(lit("1997-01-01 00:00:00")) &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
           count(lit(1)).as("n_rows"))
  }

  val q02Sql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  /** J1: 1:1 left-outer enrichment (summary⟕detail analogue) + group. */
  def q03JoinEnrich(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val c = Tables.load(spark, dir, "customer")
    o.join(c, o("o_custkey") === c("c_custkey"), "left_outer")
      .groupBy(coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("mktsegment"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_value"))
      .orderBy("mktsegment")
  }

  val q03Sql: String =
    """SELECT COALESCE(c_mktsegment, 'UNKNOWN') AS mktsegment,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      |FROM orders LEFT OUTER JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** T1: 3-way join + revenue ranking, deterministic top-20 (TPC-H Q10 shape).
    * `customer`/`orders` are small vs lineitem — Catalyst broadcasts them. */
  def q04TopCustomers(spark: SparkSession, dir: String): DataFrame = {
    val c  = Tables.load(spark, dir, "customer")
    val o  = Tables.load(spark, dir, "orders")
    val li = Tables.load(spark, dir, "lineitem")
    // aggregate by the integer custkey FIRST and attach c_name to the
    // ~15k aggregated rows afterwards (guide §2.3, aggregate before you
    // shuffle / shuffle keys not payloads): grouping by (c_custkey,
    // c_name) dragged the name string through the probe-side pipeline
    // and both aggregate passes. c_name is functionally dependent on
    // c_custkey and every o_custkey has a customer row, so the result is
    // identical (measured −35%: 1.04 s → 0.67 s).
    li.filter(col("l_returnflag") === "R")
      .join(o.select("o_orderkey", "o_custkey"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .join(broadcast(c.select("c_custkey", "c_name")), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("revenue"))
      .orderBy(desc("revenue"), col("c_custkey"))
      .limit(20)
  }

  val q04Sql: String =
    """SELECT c_custkey, c_name,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE l_returnflag = 'R'
      |GROUP BY c_custkey, c_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  /** J4/U5: anti-join (the URL-seen / still-failed retry shape):
    * customers with no big urgent order. */
  def q05AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer")
    val o = Tables.load(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 150000.0)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")
  }

  val q05Sql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
      |    AND o_totalprice > 150000.0)
      |ORDER BY c_custkey""".stripMargin

  /** Semi-join: customers with at least one urgent order. */
  def q06SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer")
    val o = Tables.load(spark, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("c_mktsegment")
  }

  val q06Sql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_customers FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** J2/U3: union of overlapping slices + dedup (retry-merge shape). */
  def q07UnionDedup(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val a = o.filter(col("o_totalprice") > 100000.0)
    val b = o.filter(col("o_orderpriority") === "1-URGENT")
    a.union(b).distinct()
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
      .orderBy("o_orderstatus")
  }

  val q07Sql: String =
    """SELECT o_orderstatus, COUNT(*) AS n FROM (
      |  SELECT * FROM orders WHERE o_totalprice > 100000.0
      |  UNION
      |  SELECT * FROM orders WHERE o_orderpriority = '1-URGENT'
      |) GROUP BY 1 ORDER BY 1""".stripMargin

  /** W3: per-group top-k via row_number (per-host scheduling shape). */
  def q08TopkPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
    // project the three live columns and pin the window exchange at full
    // parallelism: the ~2 MB shuffle otherwise AQE-coalesces to a couple
    // of partitions and the per-group sort serializes (guide §2.5;
    // measured 0.51 s → 0.39 s). Scale-guarded: no-op on a wide scan.
    Tables.spreadBy(o.select("o_custkey", "o_orderkey", "o_totalprice"),
        col("o_custkey"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("rk"))
      .orderBy("o_custkey", "rk")
  }

  val q08Sql: String =
    """SELECT o_custkey, o_orderkey, rk FROM (
      |  SELECT o_custkey, o_orderkey,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rk
      |  FROM orders)
      |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin

  /** W1/A3: sliding last-50 window stats over the event stream
    * (rate-limiter request-history analogue). Exact decimal window sum. */
  def q09SlidingWindow(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events").filter(col("event_type") === "click")
    val w = Window.orderBy(col("ts"), col("event_id")).rowsBetween(-49, 0)
    e.select(
        col("event_id"),
        sum(col("value").cast("decimal(18,4)")).over(w).cast("double").as("win_sum"),
        count(lit(1)).over(w).as("win_n"))
      .withColumn("win_avg", round(col("win_sum") / col("win_n"), 4))
      .orderBy("event_id")
  }

  val q09Sql: String =
    """SELECT event_id, CAST(win_sum_d AS DOUBLE) AS win_sum, win_n,
      |  ROUND(CAST(win_sum_d AS DOUBLE) / win_n, 4) AS win_avg
      |FROM (
      |  SELECT event_id,
      |    SUM(CAST(value AS DECIMAL(18,4))) OVER (ORDER BY ts, event_id
      |      ROWS BETWEEN 49 PRECEDING AND CURRENT ROW) AS win_sum_d,
      |    COUNT(*) OVER (ORDER BY ts, event_id
      |      ROWS BETWEEN 49 PRECEDING AND CURRENT ROW) AS win_n
      |  FROM events WHERE event_type = 'click')
      |ORDER BY event_id""".stripMargin

  /** U-set: EXCEPT — parts returned-A but never returned-R. */
  def q10SetOps(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val a = li.filter(col("l_returnflag") === "A" && col("l_quantity") > 45)
      .select(col("l_partkey")).distinct()
    val r = li.filter(col("l_returnflag") === "R" && col("l_quantity") > 45)
      .select(col("l_partkey")).distinct()
    a.except(r).orderBy("l_partkey")
  }

  val q10Sql: String =
    """SELECT DISTINCT l_partkey FROM lineitem
      |WHERE l_returnflag = 'A' AND l_quantity > 45
      |EXCEPT
      |SELECT DISTINCT l_partkey FROM lineitem
      |WHERE l_returnflag = 'R' AND l_quantity > 45
      |ORDER BY l_partkey""".stripMargin

  /** F11: money/date round-trip — serialize typed values to the
    * reference's wire formats ($-money, MM/dd/yyyy) then coerce back
    * (bulk_insert_helper.py:280-339 semantics). */
  def q11TypeCoercion(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val wire = o.select(
      col("o_orderkey"),
      concat(lit("$"), col("o_totalprice").cast("decimal(14,2)").cast("string")).as("money_str"),
      date_format(col("o_orderdate"), "MM/dd/yyyy").as("date_str"))
    wire.select(
        col("o_orderkey"),
        regexp_replace(col("money_str"), "[$,]", "").cast("double").as("amount"),
        to_date(col("date_str"), "MM/dd/yyyy").as("order_date"))
      .groupBy(year(col("order_date")).as("order_year"))
      .agg(dsum(col("amount")).as("total_amount"), count(lit(1)).as("n"))
      .orderBy("order_year")
  }

  val q11Sql: String =
    """SELECT CAST(year(order_date) AS INTEGER) AS order_year,
      |  CAST(SUM(CAST(amount AS DECIMAL(18,4))) AS DOUBLE) AS total_amount,
      |  COUNT(*) AS n
      |FROM (
      |  SELECT o_orderkey,
      |    CAST(regexp_replace(money_str, '[$,]', '', 'g') AS DOUBLE) AS amount,
      |    CAST(strptime(date_str, '%m/%d/%Y') AS DATE) AS order_date
      |  FROM (
      |    SELECT o_orderkey,
      |      '$' || CAST(CAST(o_totalprice AS DECIMAL(14,2)) AS VARCHAR) AS money_str,
      |      strftime(o_orderdate, '%m/%d/%Y') AS date_str
      |    FROM orders))
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** F1: clean_field_name — strip non-word chars, whitespace→_, lowercase
    * (fpds_enhanced_extractor.py:503-509 semantics). */
  def q12CleanFieldName(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(spark, dir, "part")
    p.select(
        col("p_partkey"),
        lower(regexp_replace(regexp_replace(trim(concat_ws(" ", col("p_brand"), col("p_type"), col("p_name"))),
          "[^\\w\\s]", ""), "\\s+", "_")).as("field_name"))
      .orderBy("p_partkey")
  }

  val q12Sql: String =
    """SELECT p_partkey,
      |  lower(regexp_replace(regexp_replace(
      |    trim(concat_ws(' ', p_brand, p_type, p_name)),
      |    '[^\w\s]', '', 'g'), '\s+', '_', 'g')) AS field_name
      |FROM part ORDER BY p_partkey""".stripMargin

  /** P6: validation predicate set — required/length/regex per field. */
  def q13Validation(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer")
    c.select(
        when(col("c_name").rlike("^Customer#[0-9]{9}$") &&
             length(col("c_name")) >= 10 &&
             col("c_acctbal").isNotNull, "valid")
          .otherwise("invalid").as("status"))
      .groupBy("status").agg(count(lit(1)).as("n"))
      .orderBy("status")
  }

  val q13Sql: String =
    """SELECT CASE WHEN regexp_matches(c_name, '^Customer#[0-9]{9}$')
      |            AND length(c_name) >= 10
      |            AND c_acctbal IS NOT NULL
      |       THEN 'valid' ELSE 'invalid' END AS status,
      |  COUNT(*) AS n
      |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin

  /** P5: empty/None normalization — ''→NULL then coalesce to default. */
  def q14NullNormalize(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
    d.select(
        col("doc_id"),
        coalesce(nullif(trim(col("lang")), lit("")), lit("und")).as("lang_norm"))
      .groupBy("lang_norm").agg(count(lit(1)).as("n"))
      .orderBy("lang_norm")
  }

  val q14Sql: String =
    """SELECT COALESCE(NULLIF(trim(lang), ''), 'und') AS lang_norm, COUNT(*) AS n
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  /** F3: pagination-total parse — "Results 1-30 of <b>N</b>" → N
    * (fpds_enhanced_extractor.py:177-202 semantics), round-tripped. */
  def q15RegexExtract(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders").orderBy("o_orderkey").limit(1000)
    o.select(
        col("o_orderkey"),
        concat(lit("Results 1-30 of <b>"), col("o_orderkey").cast("string"), lit("</b> shown")).as("heading"))
      .select(
        col("o_orderkey"),
        regexp_extract(col("heading"), "of\\s*<b>([0-9]+)</b>", 1).cast("long").as("total"))
      .filter(col("total") === col("o_orderkey"))
      .agg(count(lit(1)).as("n_roundtrip"))
  }

  val q15Sql: String =
    """SELECT COUNT(*) AS n_roundtrip FROM (
      |  SELECT o_orderkey,
      |    CAST(regexp_extract('Results 1-30 of <b>' || CAST(o_orderkey AS VARCHAR) || '</b> shown',
      |      'of\s*<b>([0-9]+)</b>', 1) AS BIGINT) AS total
      |  FROM (SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 1000))
      |WHERE total = o_orderkey""".stripMargin
}
