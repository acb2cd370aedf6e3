package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, EqualTo, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule for the reference's J3 pattern (SURVEY.md §2.3, §4.3a):
  * an inner self-join whose right side is a PROJECTION OF THE SAME PLAN,
  * keyed on a column of that plan —
  * {{{
  *   df.join(df.select($"k", expr.as("x")), Seq("k"))   // J3 shape
  *   ≡  df.withColumn("x", expr)                        // when k is unique
  * }}}
  * The join (a full shuffle of both sides) disappears into the projection
  * the optimizer was already doing.
  *
  * SAFETY: the rewrite is value-correct ONLY when the join key is unique
  * in the shared child — with duplicate keys the join multiplies rows.
  * Key uniqueness is not statically provable from the plan, so the rule is
  * OFF by default and gated on
  * `spark.graft.rewriteSelfJoin.assumeUniqueKeys=true` — the engine-side
  * formalisation of what the reference assumes implicitly (its `date` key
  * is verified unique, ipynb cell 15). Enable per session when the
  * invariant holds; the blueprint's J3 pipelines set it.
  */
object SelfJoinRewrite extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.rewriteSelfJoin.assumeUniqueKeys",
      "false") == "true"

  /** Match `cond` as a conjunction of equalities pairing left/right
    * attributes; return (leftKey, rightKey) pairs. */
  private def equiPairs(cond: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[Seq[(Attribute, Attribute)]] = {
    def split(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(a, b) =>
        split(a) ++ split(b)
      case other => Seq(other)
    }
    val pairs = split(cond).map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if left.outputSet.contains(a) && right.outputSet.contains(b) =>
        Some((a, b))
      case EqualTo(b: AttributeReference, a: AttributeReference)
          if left.outputSet.contains(a) && right.outputSet.contains(b) =>
        Some((a, b))
      case _ => None
    }
    if (pairs.forall(_.isDefined)) Some(pairs.flatten) else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case j @ Join(left, right @ Project(projList, rightChild), Inner,
          Some(cond), _) => {
        // the left side may carry its own (pruned) projection over the
        // shared child — strip it to compare plans
        val (leftProj, leftChild) = left match {
          case Project(lp, c) => (lp, c)
          case other => (other.output, other)
        }
        if (leftChild.canonicalized != rightChild.canonicalized) j
        else equiPairs(cond, left, right) match {
          case Some(pairs) if pairs.nonEmpty &&
              // every right key must be a bare pass-through of a child
              // attribute that also appears among the left keys
              pairs.forall { case (lk, rk) =>
                projList.exists {
                  case ar: AttributeReference => ar.exprId == rk.exprId &&
                    ar.name == lk.name
                  case _ => false
                }
              } =>
            // remap the projected expressions from the right child's
            // attribute ids onto the left child's equivalent attributes
            // (same canonical plan → same column order)
            val mapping: Map[Long, Attribute] =
              rightChild.output.map(_.exprId.id)
                .zip(leftChild.output).toMap
            val rebased: Seq[NamedExpression] = projList.map { ne =>
              ne.transform {
                case ar: AttributeReference
                    if mapping.contains(ar.exprId.id) =>
                  mapping(ar.exprId.id)
              }.asInstanceOf[NamedExpression] match {
                // keep the ORIGINAL output ids so parents still resolve
                case a: Alias => a
                case ar: AttributeReference =>
                  val src = mapping.getOrElse(ar.exprId.id, ar)
                  Alias(src, ar.name)(exprId = ar.exprId)
                case other => other
              }
            }
            // one projection over the shared child: the left side's own
            // list (or pass-through) plus the rebased right expressions
            Project(leftProj ++ rebased, leftChild)
          case _ => j
        }
      }
    }
  }
}
