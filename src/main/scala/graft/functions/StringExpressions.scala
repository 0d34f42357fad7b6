package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native Catalyst
  * expression with whole-stage codegen — Spark ships no normalizer, and
  * the alternative (a Scala UDF over `java.text.Normalizer`) breaks the
  * codegen span and serializes every row through a generic closure.
  *
  * The form argument must be a foldable string literal: it is resolved to
  * a `java.text.Normalizer.Form` ONCE at plan time and inlined into the
  * generated code. The generated path short-circuits via
  * `Normalizer.isNormalized` (the Unicode quick-check), so ASCII-dominant
  * corpora pay one toString and zero re-encodes per row.
  */
case class UnicodeNormalize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = {
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"input must be string, got ${left.dataType}")
    else if (right.dataType != StringType || !right.foldable)
      TypeCheckResult.TypeCheckFailure("form must be a foldable string literal")
    else if (!Set("NFC", "NFD", "NFKC", "NFKD").contains(formName))
      TypeCheckResult.TypeCheckFailure(s"unknown normalization form '$formName'")
    else TypeCheckResult.TypeCheckSuccess
  }

  private lazy val formName: String =
    right.eval().asInstanceOf[UTF8String].toString.toUpperCase

  private lazy val form: java.text.Normalizer.Form =
    java.text.Normalizer.Form.valueOf(formName)

  override def nullSafeEval(s: Any, f: Any): Any = {
    val str = s.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, form))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val s = ctx.freshName("s")
      val f = s"java.text.Normalizer.Form.$formName"
      s"""
         |String $s = $a.toString();
         |${ev.value} = java.text.Normalizer.isNormalized($s, $f)
         |  ? $a
         |  : org.apache.spark.unsafe.types.UTF8String.fromString(
         |      java.text.Normalizer.normalize($s, $f));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): UnicodeNormalize =
    copy(left = l, right = r)
}

object StringExpressions {

  /** Register `graft_normalize(str, form)` in the session registry
    * (idempotent) for use from the Column API and SQL.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_normalize", exprs => UnicodeNormalize(exprs.head, exprs(1)), "built-in")

  /** Column wrapper. Requires [[register]] on the session first. */
  def unicodeNormalize(s: Column, form: String): Column =
    org.apache.spark.sql.functions.call_function("graft_normalize", s,
      org.apache.spark.sql.functions.lit(form))
}
