package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, Alias, AttributeReference, CreateArray, EqualTo, Explode, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule that turns a small integer BAND JOIN into an exploded
  * equi-join.
  *
  * Spark plans a non-equi join condition like
  * {{{
  *   a.join(b, b("k") >= a("k") + 1 && b("k") <= a("k") + 5)
  * }}}
  * as a BroadcastNestedLoopJoin (or a cartesian product) — O(N·M) pair
  * evaluations, the shape that took qv5's id-band dedup from sub-second
  * to 79 s at sf0.1 and that cannot survive 100 TB. When the condition
  * bounds `bKey − aKey` to a closed integer interval [lo, hi] of width
  * ≤ `spark.graft.rewriteBandJoin.maxWidth` (default 64), the join is
  * equivalent to: explode offsets lo..hi on one side, equi-join on
  * `aKey + off = bKey` — `width·N` extra rows through ONE hash shuffle
  * instead of N·M comparisons.
  *
  * Semantics preserved exactly (unlike [[SelfJoinRewrite]], no data
  * assumption is needed, so the rule defaults ON when registered):
  *  - each qualifying pair matches exactly ONE offset (integer delta) —
  *    no duplicates introduced;
  *  - a NULL key makes the original band predicate null-false and makes
  *    `aKey + off` null, which an equi-join drops — same rows out;
  *  - every conjunct not absorbed into [lo, hi] stays in the join
  *    condition (extra equi keys make the join cheaper still);
  *  - multiple lower (upper) bounds collapse to the tightest, which
  *    implies the rest.
  * Caveat: `aKey + off` uses non-ANSI wrapping arithmetic; keys within
  * `maxWidth` of the int64 edge could in principle wrap — corpus ids
  * never live there, and the width guard keeps the window tiny.
  *
  * Config: `spark.graft.rewriteBandJoin.enabled` (default true),
  * `spark.graft.rewriteBandJoin.maxWidth` (default 64 offsets).
  */
object BandJoinRewrite extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.rewriteBandJoin.enabled", "true") == "true"

  private def maxWidth: Long =
    conf.getConfString("spark.graft.rewriteBandJoin.maxWidth", "64").toLong

  private object IntLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Int, IntegerType) => Some(v.toLong)
      case Literal(v: Long, LongType) => Some(v)
      case _ => None
    }
  }

  /** Decompose `e` as `attr + c` (int or long attr, literal offset). */
  private def linear(e: Expression): Option[(AttributeReference, Long)] =
    e match {
      case a: AttributeReference
          if a.dataType == IntegerType || a.dataType == LongType =>
        Some((a, 0L))
      case Add(a: AttributeReference, IntLit(c), _) => Some((a, c))
      case Add(IntLit(c), a: AttributeReference, _) => Some((a, c))
      case _ => None
    }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(a, b) =>
      splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /** Normalise a comparison conjunct to `p ≤ q` over attr+const sides
    * (strict forms shift the constant — integer domains). */
  private def asLeq(e: Expression)
      : Option[((AttributeReference, Long), (AttributeReference, Long))] =
    e match {
      case LessThanOrEqual(x, y) =>
        for (a <- linear(x); b <- linear(y)) yield (a, b)
      case LessThan(x, y) =>
        for (a <- linear(x); b <- linear(y)) yield ((a._1, a._2 + 1), b)
      case GreaterThanOrEqual(x, y) =>
        for (a <- linear(x); b <- linear(y)) yield (b, a)
      case GreaterThan(x, y) =>
        for (a <- linear(x); b <- linear(y)) yield ((b._1, b._2 + 1), a)
      case _ => None
    }

  private final case class Band(l: AttributeReference, r: AttributeReference,
      lo: Long, hi: Long, consumed: Seq[Expression])

  /** Find one (leftKey, rightKey) pair whose delta `r − l` is bounded on
    * BOTH sides by the conjuncts; returns the tightest band and which
    * conjuncts it absorbs. */
  private def findBand(conjuncts: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Option[Band] = {
    // per (leftAttr, rightAttr) pair: (maxLo, minHi, consumed conjuncts)
    val acc = scala.collection.mutable.LinkedHashMap
      .empty[(Long, Long), (AttributeReference, AttributeReference,
        Option[Long], Option[Long], Vector[Expression])]
    conjuncts.foreach { c =>
      asLeq(c).foreach { case ((pa, pc), (qa, qc)) =>
        // p ≤ q. delta = rAttr − lAttr.
        val entry =
          if (left.outputSet.contains(pa) && right.outputSet.contains(qa))
            // lAttr + pc ≤ rAttr + qc  →  delta ≥ pc − qc
            Some((pa, qa, Some(pc - qc), None))
          else if (right.outputSet.contains(pa) && left.outputSet.contains(qa))
            // rAttr + pc ≤ lAttr + qc  →  delta ≤ qc − pc
            Some((qa, pa, None, Some(qc - pc)))
          else None
        entry.foreach { case (l, r, lo, hi) =>
          val key = (l.exprId.id, r.exprId.id)
          val (_, _, lo0, hi0, cs) = acc.getOrElse(key,
            (l, r, None: Option[Long], None: Option[Long],
              Vector.empty[Expression]))
          acc(key) = (l, r,
            (lo0 ++ lo).reduceOption(_ max _),
            (hi0 ++ hi).reduceOption(_ min _),
            cs :+ c)
        }
      }
    }
    acc.values.collectFirst {
      case (l, r, Some(lo), Some(hi), cs)
          if hi >= lo && hi - lo + 1 <= maxWidth =>
        Band(l, r, lo, hi, cs)
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        val conjuncts = splitConjuncts(cond)
        findBand(conjuncts, left, right) match {
          case Some(Band(lAttr, rAttr, lo, hi, consumed)) =>
            val offs: Seq[Expression] = (lo to hi).map { o =>
              if (lAttr.dataType == LongType) Literal(o)
              else Literal(o.toInt)
            }
            val offAttr = AttributeReference("_band_off", lAttr.dataType,
              nullable = false)()
            val exploded = Generate(Explode(CreateArray(offs)),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(offAttr), child = left)
            val eq = EqualTo(Add(lAttr, offAttr), rAttr)
            val rest = conjuncts.filterNot(c => consumed.exists(_ eq c))
            val newCond = (eq +: rest).reduce(
              org.apache.spark.sql.catalyst.expressions.And(_, _))
            // keep the original output (hide _band_off from parents)
            Project(j.output.map(a => a: NamedExpression),
              Join(exploded, right, Inner, Some(newCond), hint))
          case None => j
        }
    }
  }
}
