package graft.functions

import graft.core.UrlNormalizer
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the canonicalization trio (SURVEY.md
  * §2.9/§7.3 stretch): unlike a ScalaUDF these skip the row
  * encoder/closure plumbing — null-safe eval straight on UTF8String —
  * and sit inside the plan as first-class expressions (prunable,
  * constant-foldable when the child is foldable). `doGenCode` is
  * delegated to CodegenFallback: the bodies are full parsers, so the
  * win codegen could add is the call overhead only.
  *
  * Errors (unparseable URLs) evaluate to null, which declarative
  * pipelines filter naturally — same contract as UrlUdfs.
  */
abstract class UrlStringExpression extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  protected def transform(s: String): Either[String, String]
  override def nullSafeEval(input: Any): Any =
    transform(input.asInstanceOf[UTF8String].toString) match {
      case Right(v) => UTF8String.fromString(v)
      case Left(_)  => null
    }
}

case class NormalizeUrlExpr(child: Expression) extends UrlStringExpression {
  override protected def transform(s: String): Either[String, String] =
    UrlNormalizer.normalize(s)
  override protected def withNewChildInternal(c: Expression): NormalizeUrlExpr =
    copy(child = c)
  override def prettyName: String = "normalize_url_native"
}

case class UrlHashExpr(child: Expression) extends UrlStringExpression {
  override protected def transform(s: String): Either[String, String] =
    UrlNormalizer.urlHash(s)
  override protected def withNewChildInternal(c: Expression): UrlHashExpr =
    copy(child = c)
  override def prettyName: String = "url_hash_native"
}

case class ExtractHostExpr(child: Expression) extends UrlStringExpression {
  override protected def transform(s: String): Either[String, String] =
    UrlNormalizer.extractHost(s)
  override protected def withNewChildInternal(c: Expression): ExtractHostExpr =
    copy(child = c)
  override def prettyName: String = "extract_host_native"
}

object UrlExpressions {
  // Spark 4's Column is Connect-neutral; the classic bridge converts
  // Column <-> catalyst Expression.
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def normalize_url_native(c: Column): Column = column(NormalizeUrlExpr(expression(c)))
  def url_hash_native(c: Column): Column = column(UrlHashExpr(expression(c)))
  def extract_host_native(c: Column): Column = column(ExtractHostExpr(expression(c)))

  /** Register the native forms for SQL use. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("normalize_url_native",
      es => NormalizeUrlExpr(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("url_hash_native",
      es => UrlHashExpr(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("extract_host_native",
      es => ExtractHostExpr(es.head), "scala_udf")
  }
}
