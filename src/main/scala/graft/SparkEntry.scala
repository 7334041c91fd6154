package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Relational

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from SURVEY.md §2 expressed
  * Spark-first over the TESTDATA.md parquet tables; [[oracleSql]] carries
  * the DuckDB-equivalent SQL the driver hash-compares against.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q04TopCustomers(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (Relational.q01PricingSummary _),
    "q02_filter_revenue"  -> (Relational.q02FilterRevenue _),
    "q03_join_enrich"     -> (Relational.q03JoinEnrich _),
    "q04_top_customers"   -> (Relational.q04TopCustomers _),
    "q05_anti_join"       -> (Relational.q05AntiJoin _),
    "q06_semi_join"       -> (Relational.q06SemiJoin _),
    "q07_union_dedup"     -> (Relational.q07UnionDedup _),
    "q08_topk_per_group"  -> (Relational.q08TopkPerGroup _),
    "q09_sliding_window"  -> (Relational.q09SlidingWindow _),
    "q10_set_ops"         -> (Relational.q10SetOps _),
    "q11_type_coercion"   -> (Relational.q11TypeCoercion _),
    "q12_clean_field_name"-> (Relational.q12CleanFieldName _),
    "q13_validation"      -> (Relational.q13Validation _),
    "q14_null_normalize"  -> (Relational.q14NullNormalize _),
    "q15_regex_extract"   -> (Relational.q15RegexExtract _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" -> Relational.q01Sql,
    "q02_filter_revenue"  -> Relational.q02Sql,
    "q03_join_enrich"     -> Relational.q03Sql,
    "q04_top_customers"   -> Relational.q04Sql,
    "q05_anti_join"       -> Relational.q05Sql,
    "q06_semi_join"       -> Relational.q06Sql,
    "q07_union_dedup"     -> Relational.q07Sql,
    "q08_topk_per_group"  -> Relational.q08Sql,
    "q09_sliding_window"  -> Relational.q09Sql,
    "q10_set_ops"         -> Relational.q10Sql,
    "q11_type_coercion"   -> Relational.q11Sql,
    "q12_clean_field_name"-> Relational.q12Sql,
    "q13_validation"      -> Relational.q13Sql,
    "q14_null_normalize"  -> Relational.q14Sql,
    "q15_regex_extract"   -> Relational.q15Sql,
  )
}
