package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text canonicalization as native Catalyst expressions — the
  * preprocessing step every large text corpus needs before hashing or
  * dedup: the SAME text arriving precomposed ("é" U+00E9) and decomposed
  * ("e"+U+0301) must hash identically, and accent-insensitive matching
  * needs a diacritic fold. Spark has no built-in for either; preference
  * order (b) from SURVEY §2.2 applies — a codegen'd `Expression` (JDK
  * `java.text.Normalizer`, no external deps) beats a Scala UDF: it stays
  * inside whole-stage codegen, so a 100 TB normalize pass never leaves the
  * generated loop.
  *
  * Determinism: Unicode normalization forms are pure functions of the
  * input defined by UAX #15; the JDK and DuckDB (utf8proc) implement the
  * same tables, so NFC output is hash-comparable cross-engine. */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  require(Set("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"unknown normalization form $form")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString, Normalizer.Form.valueOf(form)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "UTF8String.fromString(java.text.Normalizer.normalize(" +
        s"$c.toString(), java.text.Normalizer.Form.$form))")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

/** Diacritic fold: NFD-decompose, then drop combining marks (Unicode
  * category Mn) — "exposé"/"über"/"garçon" → "expose"/"uber"/"garcon".
  * Matches DuckDB's `strip_accents` on Latin diacritics (both reduce to
  * base letter + discarded combining sequence). */
case class StripAccents(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "fold_accents"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      TextNorm.stripAccents(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.functions.TextNorm.stripAccents($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}

object TextNorm {
  private val combiningMarks = java.util.regex.Pattern.compile("\\p{Mn}+")

  /** NFD + drop combining marks. Static so generated code can call it. */
  def stripAccents(s: String): String =
    combiningMarks.matcher(Normalizer.normalize(s, Normalizer.Form.NFD))
      .replaceAll("")
}

object TextNormFunctions {
  def unicode_normalize(c: Column, form: String): Column =
    ColumnBridge.column(UnicodeNormalize(ColumnBridge.expression(c), form))

  def fold_accents(c: Column): Column =
    ColumnBridge.column(StripAccents(ColumnBridge.expression(c)))

  val normName = "unicode_normalize"
  val normInfo = new ExpressionInfo(classOf[UnicodeNormalize].getName, normName)
  val normBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"$normName expects 2 arguments (str, form)")
    val form = exprs(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: UTF8String, StringType) =>
        v.toString
      case other => throw new IllegalArgumentException(
        s"$normName: form must be a string literal, got $other")
    }
    UnicodeNormalize(exprs.head, form)
  }

  val foldName = "fold_accents"
  val foldInfo = new ExpressionInfo(classOf[StripAccents].getName, foldName)
  val foldBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1, s"$foldName expects 1 argument")
    StripAccents(exprs.head)
  }
}
