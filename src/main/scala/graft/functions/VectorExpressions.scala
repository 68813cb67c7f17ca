package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Fused float-vector dot product as a native Catalyst expression with
  * whole-stage codegen (SURVEY.md §2.2 "custom Expression for fused
  * dot-product speed" — preference order (b): a codegen'd Expression beats
  * a Scala UDF).
  *
  * Semantics are EXACTLY the left fold the composable form uses —
  * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0d, +)` —
  * widening each float to double before multiplying and accumulating
  * left-to-right, so results are bit-identical to both the DataFrame
  * formulation and the DuckDB oracle's list_reduce. The fusion removes the
  * intermediate product array and the per-element lambda dispatch.
  *
  * Inputs are expected densely non-null (embedding vectors); a null array
  * yields null (standard null-intolerant behavior). */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<float> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vector_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVectorDot =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Column-level API for the fused dot product. */
  def vector_dot(a: Column, b: Column): Column =
    ColumnBridge.column(FloatVectorDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  val fnName = "vector_dot"
  val fnInfo = new ExpressionInfo(classOf[FloatVectorDot].getName, fnName)
  val fnBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"$fnName expects 2 arguments")
    FloatVectorDot(exprs.head, exprs(1))
  }
}
