package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Rewrites an [[Aggregate]] carrying TWO OR MORE `count(DISTINCT x)`
  * columns over integral keys into one-pass [[RoaringDistinctCount]]
  * aggregates.
  *
  * Why: Spark plans multiple distinct aggregates via
  * `RewriteDistinctAggregates`, which inserts an `Expand` that replicates
  * EVERY input row once per distinct group before the first shuffle — a
  * 3-distinct stat query scans the fact table once but shuffles it three
  * times over. The roaring aggregate holds each group's key set as a
  * compressed bitmap in the aggregation buffer instead: map-side partials
  * dedupe before the shuffle, the merge is container-wise union, and the
  * plan is a plain two-stage ObjectHashAggregate — no replication. Same
  * exact answer (the buffer is an exact set; nulls are skipped exactly as
  * `count(DISTINCT)` skips them).
  *
  * Guards (rewrite only when ALL hold, else leave the plan alone):
  *   - at least two distinct aggregates (a single one planner-handles
  *     without Expand already);
  *   - every distinct aggregate in the operator is a single-argument,
  *     unfiltered `count` over an integral child (byte/short/int/long —
  *     cast to long is injective, so distinct counts are preserved);
  *     a mixed operator (sum DISTINCT, string keys, FILTER clauses)
  *     is left untouched rather than half-rewritten.
  *
  * This rule runs in the extended operator-optimization batch, BEFORE
  * `RewriteDistinctAggregates` — by the time that rule looks for
  * distinct aggregates there are none left to expand.
  */
object RewriteMultiDistinctToRoaring extends Rule[LogicalPlan] {

  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def asLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg: Aggregate =>
      val distincts = agg.aggregateExpressions.flatMap(_.collect {
        case ae: AggregateExpression if ae.isDistinct => ae
      })
      val rewritable = distincts.length >= 2 && distincts.forall {
        case AggregateExpression(Count(Seq(c)), _, true, None, _) => integral(c.dataType)
        case _ => false
      }
      if (!rewritable) agg
      else {
        val newAggs = agg.aggregateExpressions.map(_.transform {
          case ae @ AggregateExpression(Count(Seq(c)), _, true, None, _) =>
            ae.copy(
              aggregateFunction = RoaringDistinctCount(asLong(c)),
              isDistinct = false)
        }.asInstanceOf[NamedExpression])
        agg.copy(aggregateExpressions = newAggs)
      }
  }
}
