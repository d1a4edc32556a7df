package graft.functions

import graft.core.UrlNormalizer
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the canonicalization trio (SURVEY.md
  * §2.9/§7.3 stretch): unlike a ScalaUDF these skip the row
  * encoder/closure plumbing — null-safe eval straight on UTF8String —
  * and sit inside the plan as first-class expressions (prunable,
  * constant-foldable when the child is foldable).
  *
  * Real `doGenCode` (not CodegenFallback): the body is a full parser, so
  * the generated code is a single call into [[evalUtf8]] via a plan
  * reference — but that one line is the difference between the whole
  * stage compiling into one span and CollapseCodegenStages refusing the
  * entire Project (a CodegenFallback expression disqualifies its host
  * operator, splitting the stage and re-materializing rows around it).
  *
  * Errors (unparseable URLs) evaluate to null, which declarative
  * pipelines filter naturally — same contract as UrlUdfs.
  */
abstract class UrlStringExpression extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  protected def transform(s: String): Either[String, String]
  /** Shared kernel for the interpreted and generated paths. */
  final def evalUtf8(input: UTF8String): UTF8String =
    transform(input.toString) match {
      case Right(v) => UTF8String.fromString(v)
      case Left(_)  => null
    }
  override def nullSafeEval(input: Any): Any =
    evalUtf8(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("urlExpr", this,
        classOf[UrlStringExpression].getName)
      s"""
         |${ev.value} = $ref.evalUtf8($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
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

/** The engine's bucket function (MurmurHash3.stringHash(host) masked,
  * mod numBuckets) as a codegen'd expression: the column-form of
  * `CrawlEngine.bucketOf`, so bucket assignment in the submit/host paths
  * stays inside whole-stage codegen instead of forcing a typed-encoder
  * round-trip of every row just to fill one int field.
  */
case class HostBucketExpr(child: Expression, numBuckets: Int)
    extends UnaryExpression {
  require(numBuckets >= 1)
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "host_bucket"
  final def evalUtf8(input: UTF8String): Int =
    (scala.util.hashing.MurmurHash3.stringHash(input.toString) & 0x7fffffff) %
      numBuckets
  override def nullSafeEval(input: Any): Any =
    evalUtf8(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("bucketExpr", this,
        classOf[HostBucketExpr].getName)
      s"${ev.value} = $ref.evalUtf8($c);"
    })
  override protected def withNewChildInternal(c: Expression): HostBucketExpr =
    copy(child = c)
}

object UrlExpressions {
  // Spark 4's Column is Connect-neutral; the classic bridge converts
  // Column <-> catalyst Expression.
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def normalize_url_native(c: Column): Column = column(NormalizeUrlExpr(expression(c)))
  def url_hash_native(c: Column): Column = column(UrlHashExpr(expression(c)))
  def extract_host_native(c: Column): Column = column(ExtractHostExpr(expression(c)))
  def host_bucket(c: Column, numBuckets: Int): Column =
    column(HostBucketExpr(expression(c), numBuckets))

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
