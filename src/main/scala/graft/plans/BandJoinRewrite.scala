package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, AttributeReference, CreateArray, EqualTo, Explode, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, NamedExpression, Subtract}
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
  * Semantics preserved (unlike [[SelfJoinRewrite]], no data assumption
  * is needed, so the rule defaults ON when registered) — with ONE
  * documented caveat: long keys within `maxWidth` of the int64 edge,
  * where wrapping `aKey + off` can disagree with the original band
  * comparison (see the LONG-keys paragraph below). Everywhere else:
  *  - each qualifying pair matches exactly ONE offset (integer delta) —
  *    no duplicates introduced;
  *  - a NULL key makes the original band predicate null-false and makes
  *    `aKey + off` null, which an equi-join drops — same rows out;
  *  - every conjunct not absorbed into [lo, hi] stays in the join
  *    condition (extra equi keys make the join cheaper still);
  *  - multiple lower (upper) bounds collapse to the tightest, which
  *    implies the rest.
  * The rule fires on LONG keys only. `aKey + off` uses non-ANSI
  * wrapping arithmetic, so keys within `maxWidth` of the int64 edge
  * could in principle wrap — corpus ids never live there, and the
  * width guard keeps the window tiny. 32-bit keys are excluded
  * outright: ints near 2³¹ are realistic, and there the original
  * comparison's wrapped arithmetic and the enumerated offsets would
  * disagree. Bound arithmetic is overflow-safe (BigInt accumulation,
  * guarded strict-bound shifts), so pathological literal constants
  * leave the join untouched rather than mis-rewriting it.
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

  /** Decompose `e` as `attr + c` (LONG attr only, literal offset).
    * Int keys are deliberately excluded: a 32-bit key can plausibly
    * live near 2³¹, where the original comparison's wrapped arithmetic
    * and the rewrite's enumerated offsets diverge; for longs the wrap
    * window (within maxWidth of 2⁶³) holds no realistic keys. Handles
    * `a + c`, `c + a` and `a - c`. */
  private def linear(e: Expression): Option[(AttributeReference, Long)] =
    e match {
      case a: AttributeReference if a.dataType == LongType =>
        Some((a, 0L))
      case Add(a: AttributeReference, IntLit(c), _)
          if a.dataType == LongType => Some((a, c))
      case Add(IntLit(c), a: AttributeReference, _)
          if a.dataType == LongType => Some((a, c))
      case Subtract(a: AttributeReference, IntLit(c), _)
          if a.dataType == LongType && c != Long.MinValue =>
        Some((a, -c))
      case _ => None
    }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(a, b) =>
      splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /** Shift a strict bound's constant by one (integer domains) — None
    * on Long overflow rather than a silently wrapped bound. */
  private def inc(p: (AttributeReference, Long))
      : Option[(AttributeReference, Long)] =
    if (p._2 == Long.MaxValue) None else Some((p._1, p._2 + 1))

  /** Normalise a comparison conjunct to `p ≤ q` over attr+const sides
    * (strict forms shift the constant — integer domains). */
  private def asLeq(e: Expression)
      : Option[((AttributeReference, Long), (AttributeReference, Long))] =
    e match {
      case LessThanOrEqual(x, y) =>
        for (a <- linear(x); b <- linear(y)) yield (a, b)
      case LessThan(x, y) =>
        for (a <- linear(x); b <- linear(y); a1 <- inc(a)) yield (a1, b)
      case GreaterThanOrEqual(x, y) =>
        for (a <- linear(x); b <- linear(y)) yield (b, a)
      case GreaterThan(x, y) =>
        for (a <- linear(x); b <- linear(y); b1 <- inc(b)) yield (b1, a)
      case _ => None
    }

  private final case class Band(l: AttributeReference, r: AttributeReference,
      lo: Long, hi: Long, consumed: Seq[Expression])

  /** Find one (leftKey, rightKey) pair whose delta `r − l` is bounded on
    * BOTH sides by the conjuncts; returns the tightest band and which
    * conjuncts it absorbs. Bound arithmetic runs in BigInt — two Long
    * constants can subtract past the Long range, and a wrapped bound
    * would silently change which rows the band admits. */
  private def findBand(conjuncts: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Option[Band] = {
    // per (leftAttr, rightAttr) pair: (maxLo, minHi, consumed conjuncts)
    val acc = scala.collection.mutable.LinkedHashMap
      .empty[(Long, Long), (AttributeReference, AttributeReference,
        Option[BigInt], Option[BigInt], Vector[Expression])]
    conjuncts.foreach { c =>
      asLeq(c).foreach { case ((pa, pc), (qa, qc)) =>
        // p ≤ q. delta = rAttr − lAttr.
        val entry =
          if (left.outputSet.contains(pa) && right.outputSet.contains(qa))
            // lAttr + pc ≤ rAttr + qc  →  delta ≥ pc − qc
            Some((pa, qa, Some(BigInt(pc) - BigInt(qc)), None))
          else if (right.outputSet.contains(pa) && left.outputSet.contains(qa))
            // rAttr + pc ≤ lAttr + qc  →  delta ≤ qc − pc
            Some((qa, pa, None, Some(BigInt(qc) - BigInt(pc))))
          else None
        entry.foreach { case (l, r, lo, hi) =>
          val key = (l.exprId.id, r.exprId.id)
          val (_, _, lo0, hi0, cs) = acc.getOrElse(key,
            (l, r, None: Option[BigInt], None: Option[BigInt],
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
          if hi >= lo && hi - lo + 1 <= maxWidth &&
            lo >= BigInt(Long.MinValue) && hi <= BigInt(Long.MaxValue) =>
        Band(l, r, lo.toLong, hi.toLong, cs)
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        val conjuncts = splitConjuncts(cond)
        findBand(conjuncts, left, right) match {
          case Some(Band(lAttr, rAttr, lo, hi, consumed)) =>
            val offs: Seq[Expression] = (lo to hi).map(o => Literal(o))
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
