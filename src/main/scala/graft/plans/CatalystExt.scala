package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{LinkExtract, Sniff}

/** Catalyst-native kernels (SURVEY §7.3 phase-2 polish): the hot scalar
  * functions as Expressions so they stay inside whole-stage codegen (no
  * ScalaUDF row conversion), and href extraction as a Generator so it has a
  * SQL surface (`LATERAL VIEW graft_extract_hrefs(url, html)`).
  */

/** F5 as a codegen'd expression: DetectContentType over a binary column.
  * The generated code calls the static kernel directly on the byte[] —
  * no UDF boxing, stays inside the WholeStageCodegen span. */
case class SniffContentType(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sniff_native requires BINARY input, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_sniff_native"

  protected override def nullSafeEval(bytes: Any): Any =
    UTF8String.fromString(Sniff.detectContentType(bytes.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.Sniff.detectContentType($c))")

  override protected def withNewChildInternal(newChild: Expression): SniffContentType =
    copy(child = newChild)
}

/** F9 as a Generator: one row per [href] element, resolved against the page
  * url, in document order — the UDTF form of ExtractDocLinks
  * (core/url.go:460-511). */
case class ExtractHrefs(urlExpr: Expression, htmlExpr: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(urlExpr, htmlExpr)

  override def elementSchema: StructType = StructType(Seq(
    StructField("href_idx", IntegerType, nullable = false),
    StructField("link", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val url = urlExpr.eval(input)
    val html = htmlExpr.eval(input)
    if (url == null || html == null) Nil
    else {
      val links = LinkExtract.extractLinksFromBody(
        url.asInstanceOf[UTF8String].toString, html.asInstanceOf[Array[Byte]])
      links.iterator.zipWithIndex.map { case (l, i) =>
        InternalRow(i, UTF8String.fromString(l))
      }.toSeq
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ExtractHrefs =
    copy(urlExpr = newChildren(0), htmlExpr = newChildren(1))
}

object CatalystExt {
  /** Register the native functions for SQL use. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("graft_sniff_native",
      exprs => SniffContentType(exprs.head), "scala_udf")
    registry.createOrReplaceTempFunction("graft_extract_hrefs",
      exprs => ExtractHrefs(exprs(0), exprs(1)), "scala_udf")
  }
}
