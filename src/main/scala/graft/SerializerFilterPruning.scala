package graft

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.AttributeSet
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, SerializeFromObject}
import org.apache.spark.sql.catalyst.rules.Rule

/** Prune unused fields out of `SerializeFromObject` when a `Filter` sits
  * between it and the consuming `Project`.
  *
  * Why this exists: every decoded-envelope pipeline is
  * `mapPartitions(decode) → SerializeFromObject(all 16 ChangeEvent fields)`
  * and every consumer immediately filters on `op` and projects a handful of
  * columns. Predicate pushdown parks the filter directly on top of the
  * serializer, and Spark's own `ObjectSerializerPruning` only matches
  * `Project(SerializeFromObject)` — with the filter in between it never
  * fires, so the per-event serializer built ALL three MapType images
  * (key/before/after), both toast lists and every string field, only for
  * the Project one node up to drop most of them (r9 plan dumps: the
  * serializer emits 16 fields, the Project keeps 5).
  *
  * UNION pruning, not per-site pruning: a query usually embeds the same
  * decode subtree several times (the compaction window and the truncate
  * high-water branch both re-derive it), and at runtime exchange/subtree
  * reuse dedupes them — but only while the copies stay byte-identical.
  * Pruning each site to just ITS fields made the copies differ (5 vs 3
  * fields) and doubled the decode (measured on cdc_temporal_join: jobs
  * 9 → 11, shuffle write 9.7 → 18 MB). So the rule first unions the used
  * field sets across every site sharing a canonically-equal serializer
  * child, then prunes each site to that union — copies stay identical AND
  * the unused maps/strings are gone.
  *
  * Pure pruning: dropped fields are referenced by nothing above the
  * serializer, so results are bit-identical; only per-event serialization
  * work and the bytes entering the downstream sort/exchange change. */
object SerializerFilterPruning extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // pass 1: per canonicalized serializer child, the union of field
    // ordinals referenced by any (Project, Filter) consumer pair
    val usedOrdinals = mutable.HashMap.empty[LogicalPlan, mutable.BitSet]
    plan.foreach {
      case p @ Project(_, f @ Filter(_, s: SerializeFromObject)) =>
        val used = AttributeSet(p.references ++ f.references)
        val bits = usedOrdinals.getOrElseUpdate(
          s.child.canonicalized, mutable.BitSet.empty)
        s.serializer.zipWithIndex.foreach { case (ne, i) =>
          if (used.contains(ne.toAttribute)) bits += i
        }
      case _ =>
    }
    if (usedOrdinals.isEmpty) plan
    else plan.transform {
      case p @ Project(projectList, f @ Filter(cond, s: SerializeFromObject)) =>
        usedOrdinals.get(s.child.canonicalized) match {
          case Some(bits) if bits.size < s.serializer.size =>
            val kept = s.serializer.zipWithIndex
              .collect { case (ne, i) if bits(i) => ne }
            // a count-only consumer set can reference nothing: keep one
            // cheap field so the row stays non-empty
            val retained =
              if (kept.nonEmpty) kept
              else Seq(s.serializer.minBy(_.dataType.defaultSize))
            Project(projectList, Filter(cond, s.copy(serializer = retained)))
          case _ => p
        }
    }
  }
}
