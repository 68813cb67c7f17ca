package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.decode.{PgBinary, PgOutputDecodeException}

/** `pg_binary_text(type_oid int, payload binary)` → the type's canonical
  * output-function text, via [[graft.decode.PgBinary]] — the SQL-level
  * companion to `decode_pgoutput`, which (stateless, no Relation in hand)
  * surfaces binary-mode ('b') tuple values as base64. Joining the decoded
  * frames with their Relation frame's per-column oids and rendering with
  * this function completes frame triage for binary-mode streams in pure
  * SQL (the gate query `cdc_binary_sql_render` reconstructs a whole table
  * that way).
  *
  * Unsupported oids and malformed payloads yield NULL — the triage
  * surface must not die on the value it exists to inspect (the stateful
  * pipeline is the strict path that raises). CodegenFallback: diagnostic
  * surface, not the ingest hot path. */
case class PgBinaryText(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == IntegerType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (int, binary), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def prettyName: String = "pg_binary_text"
  override val dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(oid: Any, payload: Any): Any =
    try UTF8String.fromString(
      PgBinary.render(oid.asInstanceOf[Int], payload.asInstanceOf[Array[Byte]]))
    catch { case _: PgOutputDecodeException => null }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PgBinaryText =
    copy(left = newLeft, right = newRight)
}

object PgBinaryTextFunction {
  def pg_binary_text(typeOid: Column, payload: Column): Column =
    ColumnBridge.column(PgBinaryText(
      ColumnBridge.expression(typeOid), ColumnBridge.expression(payload)))

  val fnName = "pg_binary_text"
  val fnInfo = new ExpressionInfo(classOf[PgBinaryText].getName, fnName)
  val fnBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"$fnName expects 2 arguments")
    PgBinaryText(exprs.head, exprs(1))
  }
}
