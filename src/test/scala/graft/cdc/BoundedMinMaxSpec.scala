package graft.cdc

import java.math.{BigDecimal => JBigDecimal}

import org.scalatest.funsuite.AnyFunSuite

/** Unit semantics of the bounded MIN/MAX synopsis (pure, no Spark). */
class BoundedMinMaxSpec extends AnyFunSuite {

  import BoundedMinMax._

  private def d(v: String) = new JBigDecimal(v)
  private def vals(s: GroupState, bottom: Boolean): Seq[(String, Long)] =
    (if (bottom) s.bottom else s.top).map(vc => (vc.v.toPlainString, vc.n))

  private def build(values: (String, Long)*): GroupState =
    fromValues("g", values.map { case (v, n) => (d(v), n) }, 2).get

  test("fromValues keeps k extremes each side, complete iff all fit") {
    val s = build("1" -> 1L, "2" -> 2L, "3" -> 1L, "4" -> 1L)
    assert(vals(s, bottom = true) === Seq(("1", 1L), ("2", 2L)))
    assert(vals(s, bottom = false) === Seq(("4", 1L), ("3", 1L)))
    assert(!s.bottomComplete && !s.topComplete)
    assert(s.cnt === 5L)
    val small = build("7" -> 1L)
    assert(small.bottomComplete && small.topComplete)
  }

  test("deleting the current minimum promotes the retained runner-up") {
    val s = build("1" -> 1L, "2" -> 1L, "9" -> 1L)
    val Updated(Some(s2)) = merge(s, Seq((d("1"), -1L)), 2): @unchecked
    assert(vals(s2, bottom = true).head === ("2", 1L))
    assert(s2.cnt === 2L)
  }

  test("deletes beyond the retained bound are ignored, extremes stay exact") {
    val s = build("1" -> 1L, "2" -> 1L, "8" -> 1L, "9" -> 1L, "5" -> 3L)
    // 5 is outside both retained sides (bottom {1,2}, top {9,8})
    val Updated(Some(s2)) = merge(s, Seq((d("5"), -2L)), 2): @unchecked
    assert(vals(s2, bottom = true) === Seq(("1", 1L), ("2", 1L)))
    assert(vals(s2, bottom = false) === Seq(("9", 1L), ("8", 1L)))
    assert(s2.cnt === 5L)
  }

  test("inserts inside the bound are tracked; beyond an incomplete bound ignored") {
    val s = build("1" -> 1L, "2" -> 1L, "8" -> 1L, "9" -> 1L)
    val Updated(Some(s2)) = merge(s, Seq((d("2"), 1L), (d("5"), 1L)), 2): @unchecked
    assert(vals(s2, bottom = true) === Seq(("1", 1L), ("2", 2L)))
    assert(vals(s2, bottom = false) === Seq(("9", 1L), ("8", 1L)))
    assert(s2.cnt === 6L)
  }

  test("a new smaller value displaces the k-th retained one") {
    val s = build("5" -> 1L, "6" -> 1L, "8" -> 1L)
    val Updated(Some(s2)) = merge(s, Seq((d("0"), 1L)), 2): @unchecked
    // complete=false on bottom after the original trim? bottom was {5,6} with
    // 8 beyond → incomplete; 0 < bound(6) → accepted, 6 trimmed out
    assert(vals(s2, bottom = true) === Seq(("0", 1L), ("5", 1L)))
  }

  test("exhausting a synopsis under deletes requests a rescan") {
    val s = build("1" -> 1L, "2" -> 1L, "8" -> 1L, "9" -> 1L)
    assert(merge(s, Seq((d("1"), -1L), (d("2"), -1L)), 2) === NeedsRescan)
  }

  test("complete synopsis never rescans: it IS the whole group") {
    val s = build("3" -> 1L, "7" -> 2L)
    val Updated(Some(s2)) = merge(s, Seq((d("3"), -1L), (d("10"), 1L)), 2): @unchecked
    assert(vals(s2, bottom = true) === Seq(("7", 2L), ("10", 1L)))
    assert(s2.bottomComplete && s2.topComplete)
    val Updated(None) = merge(s, Seq((d("3"), -1L), (d("7"), -2L)), 2): @unchecked
  }

  test("rescan rebuild equals a fresh bootstrap") {
    assert(fromValues("g", Nil, 2) === None)
    val s = fromValues("g", Seq((d("4"), 2L), (d("1"), 1L), (d("9"), 5L)), 2).get
    assert(vals(s, bottom = true) === Seq(("1", 1L), ("4", 2L)))
    assert(vals(s, bottom = false) === Seq(("9", 5L), ("4", 2L)))
    assert(s.cnt === 8L)
  }
}
