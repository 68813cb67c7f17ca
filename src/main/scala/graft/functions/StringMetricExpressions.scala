package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity as a native codegen'd expression — the
  * entity-resolution verify metric (name/address matching) Spark lacks
  * (it ships levenshtein but no Jaro family). Preference order (b) from
  * SURVEY §2.2: a codegen'd `Expression` keeps a 100 TB match pass inside
  * whole-stage codegen; the generated loop calls one static JVM method,
  * exactly like Spark's own Levenshtein.
  *
  * Cross-engine contract (pinned by StringMetricsSpec and the
  * q81_jaro_entity oracle): this implements the rapidfuzz semantics
  * DuckDB vendors — transposition count halved with INTEGER division
  * (probed: 'abcdef'/'bcadef' → 0.9444, not classic 0.9167), Winkler
  * boost only when jaro > 0.7, common-prefix cap 4, scaling 0.1, and
  * either-empty → 0.0 (DuckDB convention, not the textbook 1.0 for two
  * empties). Float ops mirror rapidfuzz's association:
  * (m/l1 + m/l2 + (m−t)/m)/3, then sim + (0.1·l)·(1−sim) — every
  * operation correctly rounded and identically ordered, so values are
  * bit-identical to DuckDB's on ASCII inputs. The comparison unit is the
  * UTF-16 code unit here vs the UTF-8 byte there — identical only on
  * ASCII; ANY non-ASCII character ('é' is 1 unit / 2 bytes) changes the
  * match counts between engines, so the cross-engine contract is
  * ASCII-scoped (the gated corpus is ASCII). */
object StringMetrics {

  /** Static so generated code can call it. */
  def jaroWinkler(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val am = new Array[Boolean](la)
    val bm = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!bm(j) && a.charAt(i) == b.charAt(j)) {
          am(i) = true; bm(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (am(i)) {
        while (!bm(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2 // rapidfuzz/DuckDB: integer halving, not the textbook t/2.0
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxPref = math.min(4, math.min(la, lb))
    while (l < maxPref && a.charAt(l) == b.charAt(l)) l += 1
    jaro + (l * 0.1) * (1.0 - jaro)
  }
}

case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler_sim"

  override def nullSafeEval(a: Any, b: Any): Any =
    StringMetrics.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.StringMetrics.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSim =
    copy(left = newLeft, right = newRight)
}

object StringMetricFunctions {
  def jaro_winkler(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinklerSim(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  val fnName = "jaro_winkler_sim"
  val fnInfo = new ExpressionInfo(classOf[JaroWinklerSim].getName, fnName)
  val fnBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"$fnName expects 2 arguments")
    JaroWinklerSim(exprs.head, exprs(1))
  }
}
