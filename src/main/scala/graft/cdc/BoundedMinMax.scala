package graft.cdc

import java.math.{BigDecimal => JBigDecimal}

/** Bounded per-group synopsis for incrementally-maintained MIN/MAX under
  * deletes (the streaming complement of [[Cdc.incrementalMinMax]]).
  *
  * A scalar MIN accumulator cannot absorb a retraction (deleting the
  * current minimum needs the runner-up), and keeping every value is
  * per-group memory O(rows). The classical middle ground, implemented
  * here: keep the k smallest and k largest DISTINCT values with exact row
  * counts. Deletes inside the retained range decrement counts; deletes
  * beyond it cannot affect MIN/MAX and are ignored. Only when deletes
  * exhaust an entire synopsis while rows remain is the true extreme
  * unknown — the merge then reports [[NeedsRescan]] and the caller rebuilds
  * that group from the materialized table (a targeted, per-group rescan;
  * with k ≥ the number of distinct values ever deleted between rescans it
  * never triggers). State is O(k) per group regardless of group size.
  *
  * Invariants per side (bottom shown; top is the mirror with reversed
  * order):
  *  - `bottom` holds every current row whose value ≤ max(bottom) with its
  *    exact count — so min(bottom) is the group's true minimum whenever
  *    `bottom` is non-empty;
  *  - `bottomComplete` marks that `bottom` covers the ENTIRE group (set
  *    when the group has ≤ k distinct values; cleared when a merge trims
  *    the synopsis back to k).
  */
object BoundedMinMax {

  /** One retained value with its exact current row count. */
  final case class VC(v: JBigDecimal, n: Long)

  /** Per-group synopsis. `bottom` ascending, `top` descending — element 0
    * of each is the group's MIN / MAX. */
  final case class GroupState(g: String, bottom: Seq[VC], top: Seq[VC],
      bottomComplete: Boolean, topComplete: Boolean, cnt: Long)

  sealed trait MergeResult
  /** New synopsis; None = the group's last row was deleted. */
  final case class Updated(state: Option[GroupState]) extends MergeResult
  /** Deletes exhausted a synopsis while rows remain: rebuild from table. */
  case object NeedsRescan extends MergeResult

  /** Fresh group (covers everything vacuously). */
  def empty(g: String): GroupState =
    GroupState(g, Nil, Nil, bottomComplete = true, topComplete = true, 0L)

  private val asc: Ordering[JBigDecimal] = (a, b) => a.compareTo(b)

  /** Rebuild a synopsis from the COMPLETE (value → row count) multiset of a
    * group's current table rows (the rescan path, and the bootstrap). */
  def fromValues(g: String, valueCounts: Seq[(JBigDecimal, Long)],
      k: Int): Option[GroupState] = {
    val sorted = valueCounts.filter(_._2 > 0).sortBy(_._1)(asc)
    if (sorted.isEmpty) None
    else {
      val complete = sorted.size <= k
      Some(GroupState(g,
        sorted.take(k).map { case (v, n) => VC(v, n) },
        sorted.takeRight(k).reverse.map { case (v, n) => VC(v, n) },
        complete, complete, sorted.map(_._2).sum))
    }
  }

  /** Apply one batch's NET (value → ±rows) deltas to a group's synopsis. */
  def merge(state: GroupState, deltas: Seq[(JBigDecimal, Long)],
      k: Int): MergeResult = {
    val cnt2 = state.cnt + deltas.map(_._2).sum
    require(cnt2 >= 0, s"group ${state.g}: more rows deleted than exist")
    if (cnt2 == 0) return Updated(None)

    // one side (bottom under ascending order / top under descending):
    // deletes first against the old coverage bound, then inserts accepted
    // inside that bound (rows beyond it were never covered), then trim.
    def side(buf: Seq[VC], complete: Boolean,
        ord: Ordering[JBigDecimal]): Option[(Seq[VC], Boolean)] = {
      val m = scala.collection.mutable.TreeMap.empty[JBigDecimal, Long](ord)
      buf.foreach(vc => m(vc.v) = vc.n)
      val bound = m.lastOption.map(_._1)
      deltas.withFilter(_._2 < 0).foreach { case (v, net) =>
        m.get(v) match {
          case Some(n) =>
            require(n + net >= 0, s"group ${state.g}: value $v over-deleted")
            if (n + net > 0) m(v) = n + net else m.remove(v)
          case None =>
            require(!complete && bound.exists(b => ord.gt(v, b)),
              s"group ${state.g}: delete of value $v the synopsis never saw")
        }
      }
      var comp = complete
      deltas.withFilter(_._2 > 0).foreach { case (v, net) =>
        if (comp || bound.exists(b => ord.lteq(v, b)))
          m(v) = m.getOrElse(v, 0L) + net
      }
      while (m.size > k) { m.remove(m.lastKey); comp = false }
      if (m.isEmpty && !comp) None
      else Some((m.toSeq.map { case (v, n) => VC(v, n) }, comp))
    }

    (side(state.bottom, state.bottomComplete, asc),
      side(state.top, state.topComplete, asc.reverse)) match {
      case (Some((b, bc)), Some((t, tc))) =>
        require(b.nonEmpty && t.nonEmpty,
          s"group ${state.g}: $cnt2 rows but an empty complete synopsis")
        Updated(Some(GroupState(state.g, b, t, bc, tc, cnt2)))
      case _ => NeedsRescan
    }
  }
}
