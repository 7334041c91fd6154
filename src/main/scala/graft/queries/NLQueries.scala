package graft.queries

import graft.Tables
import graft.query.{FieldCatalog, NLQuery}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** NL query layer as oracle-checked queries (SURVEY.md §2.3 J3, §2.6 T1,
  * §2.8 F13/F14). The oracle SQL is *generated from the same catalog
  * data*, so the two sides can only agree if the scoring semantics match. */
object NLQueries {

  val nlQuery = "agency contract amount signed image"

  /** J3/T1: field-catalog NL scoring — broadcast the 24-row catalog,
    * cross join the expanded terms, score with the reference weights,
    * rank. */
  def q34NlFieldMatch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val catalog = FieldCatalog.fields
      .map(f => (f.field, f.description, f.category, "|" + f.searchTerms.mkString("|") + "|"))
      .toDF("field", "description", "category", "terms")
    val terms = FieldCatalog.expandTerms(nlQuery).toDF("term")
    broadcast(catalog).crossJoin(terms)
      .select(col("field"),
        (when(instr(col("description"), col("term")) > 0, FieldCatalog.DescriptionWeight).otherwise(0) +
         when(instr(col("terms"), concat(lit("|"), col("term"), lit("|"))) > 0, FieldCatalog.SearchTermWeight).otherwise(0) +
         when(instr(col("category"), col("term")) > 0, FieldCatalog.CategoryWeight).otherwise(0)
        ).as("s"))
      .groupBy("field").agg(sum(col("s")).cast("long").as("score"))
      .filter(col("score") > 0)
      .orderBy(desc("score"), asc("field"))
      .limit(10)
  }

  /** Oracle generated from the same catalog + term expansion. */
  def q34Sql: String = {
    val values = FieldCatalog.fields.map { f =>
      s"('${f.field}', '${f.description}', '${f.category}', '|${f.searchTerms.mkString("|")}|')"
    }.mkString(",\n    ")
    val terms = FieldCatalog.expandTerms(nlQuery).map(t => s"('$t')").mkString(", ")
    s"""WITH catalog(field, description, category, terms) AS (VALUES
       |    $values),
       |q(term) AS (VALUES $terms)
       |SELECT field, score FROM (
       |  SELECT field, CAST(SUM(
       |    CASE WHEN position(term IN description) > 0 THEN ${FieldCatalog.DescriptionWeight} ELSE 0 END +
       |    CASE WHEN position('|' || term || '|' IN terms) > 0 THEN ${FieldCatalog.SearchTermWeight} ELSE 0 END +
       |    CASE WHEN position(term IN category) > 0 THEN ${FieldCatalog.CategoryWeight} ELSE 0 END) AS BIGINT) AS score
       |  FROM catalog CROSS JOIN q GROUP BY field)
       |WHERE score > 0 ORDER BY score DESC, field LIMIT 10""".stripMargin
  }

  val nlPredicateQuery = "orders over $100,000 after 03/15/1996 urgent"

  /** F14: NL→predicate translation applied to the orders table. */
  def q35NlPredicate(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    o.filter(NLQuery.ordersPredicate(nlPredicateQuery))
      .agg(count(lit(1)).as("n_matching"),
        sum(col("o_totalprice").cast("decimal(18,4)")).cast("double").as("total_value"))
  }

  val q35Sql: String =
    """SELECT COUNT(*) AS n_matching,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      |FROM orders
      |WHERE o_totalprice >= 100000.0
      |  AND o_orderdate >= TIMESTAMP '1996-03-15 00:00:00'
      |  AND o_orderpriority = '1-URGENT'""".stripMargin
}
