package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the ubiquitous group-wise top-k idiom —
  *
  *   SELECT <cols w/o rn> FROM (
  *     SELECT *, row_number() OVER (PARTITION BY g ORDER BY s) rn ...)
  *   WHERE rn <= k
  *
  * — into the [[GroupTopK]] operator, so every existing query written
  * with the standard window pattern gets the bounded-heap two-phase
  * plan without being rewritten by hand.
  *
  * Deliberately conservative match:
  *  - exactly ONE window expression, and it is row_number() (rank and
  *    dense_rank admit >k rows on ties — different semantics);
  *  - non-empty PARTITION BY (global top-k already plans as
  *    TakeOrderedAndProject, which is the right operator there);
  *  - the filter is a simple rn-vs-literal bound resolving to k >= 1;
  *  - the projection above discards rn (if the caller keeps the rank,
  *    the rewrite would have to re-derive it — out of scope).
  *
  * Every oracled query that uses the idiom (top-segment-per-region,
  * top-customer-per-nation, the reference-parity qr* family...) runs
  * through this rewrite and still hash-matches its DuckDB oracle —
  * the whole correctness gate doubles as the rule's test suite.
  */
object GroupTopKRewrite extends Rule[LogicalPlan] {

  private def rowNumberAttr(w: Window): Option[Attribute] =
    w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(_: RowNumber, spec), _))
          if spec.partitionSpec == w.partitionSpec &&
            spec.orderSpec == w.orderSpec =>
        Some(a.toAttribute)
      case _ => None
    }

  private def intLit(e: Expression): Option[Int] = e match {
    case Literal(v: Int, _) => Some(v)
    case Literal(v: Long, _) if v <= Int.MaxValue => Some(v.toInt)
    case _ => None
  }

  /** The bound k, when `cond` is a simple rn-vs-literal predicate. */
  private def extractK(cond: Expression, rn: Attribute): Option[Int] = {
    val k = cond match {
      case LessThanOrEqual(a: Attribute, l) if a.semanticEquals(rn) => intLit(l)
      case LessThan(a: Attribute, l) if a.semanticEquals(rn) => intLit(l).map(_ - 1)
      case EqualTo(a: Attribute, l) if a.semanticEquals(rn) =>
        intLit(l).filter(_ == 1)
      case GreaterThanOrEqual(l, a: Attribute) if a.semanticEquals(rn) => intLit(l)
      case GreaterThan(l, a: Attribute) if a.semanticEquals(rn) => intLit(l).map(_ - 1)
      case _ => None
    }
    k.filter(_ >= 1)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case proj @ Project(fields, Filter(cond, w: Window))
        if w.partitionSpec.nonEmpty && w.orderSpec.nonEmpty =>
      (for {
        rn <- rowNumberAttr(w)
        k <- extractK(cond, rn)
        if fields.forall(!_.references.contains(rn))
      } yield Project(fields, GroupTopK(w.partitionSpec, w.orderSpec, k, w.child))
      ).getOrElse(proj)
  }
}
