package graft

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
  * fires, so the per-event serializer builds ALL three MapType images
  * (key/before/after), both toast lists and every string field, only for
  * the Project one node up to drop most of them (r9 plan dumps: the
  * serializer emits 16 fields, the Project keeps 5). This rule matches the
  * blocked shape and keeps exactly the fields the filter and the project
  * reference — e.g. the compaction pipeline serializes (op, lsn, seq, key,
  * after) instead of the full envelope, and the truncate high-water branch
  * (agg over `op = 'T'`) stops serializing maps entirely.
  *
  * Pure pruning: dropped fields are referenced by nothing above the
  * serializer, so results are bit-identical; only per-event serialization
  * work and the bytes entering the downstream sort/exchange change. */
object SerializerFilterPruning extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projectList, f @ Filter(cond, s: SerializeFromObject)) =>
      val used = AttributeSet(p.references ++ f.references)
      val kept = s.serializer.filter(ne => used.contains(ne.toAttribute))
      if (kept.size == s.serializer.size) p
      else {
        // a count-only consumer can reference nothing: keep one cheap
        // (primitive-typed if available) field so the row stays non-empty
        val retained =
          if (kept.nonEmpty) kept
          else Seq(s.serializer.minBy(_.dataType.defaultSize))
        Project(projectList, Filter(cond, s.copy(serializer = retained)))
      }
  }
}
