package graft.functions

import graft.urlkit.UrlKit
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the URL kit (preferred over UDFs per
  * SURVEY.md §7.3: scalar extension = custom Expression).
  *
  * These are `CodegenFallback` (single virtual call per row around a
  * JVM-string transform — the transform itself dominates); they are
  * null-safe and usable from both the Column API and SQL.
  */
abstract class UrlStringExpression extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  protected def transform(s: String): String
  override def nullSafeEval(v: Any): Any = {
    val out = transform(v.asInstanceOf[UTF8String].toString)
    if (out == null) null else UTF8String.fromString(out)
  }
}

/** `canonical_url(url)` — UrlKit.canonicalize as an expression. */
case class CanonicalUrl(child: Expression) extends UrlStringExpression {
  override protected def transform(s: String): String = UrlKit.canonicalize(s)
  override protected def withNewChildInternal(c: Expression): CanonicalUrl = copy(c)
  override def prettyName: String = "canonical_url"
}

/** `url_host(url)` — lowercased host. */
case class UrlHost(child: Expression) extends UrlStringExpression {
  override protected def transform(s: String): String = UrlKit.host(s)
  override protected def withNewChildInternal(c: Expression): UrlHost = copy(c)
  override def prettyName: String = "url_host"
}

/** `url_path(url)` — path with "/" default. */
case class UrlPath(child: Expression) extends UrlStringExpression {
  override protected def transform(s: String): String = UrlKit.path(s)
  override protected def withNewChildInternal(c: Expression): UrlPath = copy(c)
  override def prettyName: String = "url_path"
}

object UrlFunctions {
  private def toCol(e: Expression): Column = Bridge.column(e)
  private def exprOf(c: Column): Expression = Bridge.expression(c)

  def canonical_url(c: Column): Column = toCol(CanonicalUrl(exprOf(c)))
  def url_host(c: Column): Column = toCol(UrlHost(exprOf(c)))
  def url_path(c: Column): Column = toCol(UrlPath(exprOf(c)))

  /** Register SQL names so `spark.sql("select canonical_url(u) ...")` works. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("canonical_url", es => CanonicalUrl(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("url_host", es => UrlHost(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("url_path", es => UrlPath(es.head), "scala_udf")
  }
}
