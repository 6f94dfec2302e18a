package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Join, LogicalPlan, Project, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType, ShortType, TimestampType}

/** Catalyst optimizer rule: rewrite an inner join whose condition is a
  * point-in-interval range predicate
  *
  *   ts >= start AND ts <= end      (ts from one side, bounds from the other)
  *
  * into the binned equi-join `graft.ops.TimeOps.rangeJoin` builds by
  * hand — so a caller who writes the NAIVE `BETWEEN` join (e.g. through
  * plain `spark.sql`) still gets the scalable plan.
  *
  * Why: without an equi-key, Catalyst plans a broadcast-nested-loop (or
  * cartesian + filter) — O(n·m) per key and a non-starter at 100 TB.
  * The rewrite bins time at `spark.graft.rangeJoin.binSec` seconds: the
  * ts side computes one bin id, the interval side explodes into the
  * bins it overlaps (`sequence(start div b, end div b)`), the join gains
  * the `tsBin = bin` equi-conjunct, and the ORIGINAL range conjuncts
  * stay in place as the exact post-filter. Each qualifying pair meets in
  * exactly one bin — the ts row's — so no dedup is needed; a
  * non-qualifying candidate is killed by the retained exact predicate.
  * Monotonicity of truncating division makes the containment argument
  * hold for negative epochs too.
  *
  * Pathologically WIDE intervals (open-ended SCD2 sentinels like
  * end = 9999-12-31) would explode into billions of bins — past 2^31,
  * `sequence` itself throws, turning a working query into a crash. The
  * rewrite therefore SPLITS the interval side on bin span
  * (`spark.graft.rangeJoin.maxBinsPerRow`, default 4096): rows within
  * the cap take the binned equi-join; wider rows keep the original
  * nested-loop condition over just that (normally tiny) slice, and the
  * two joins union — row-identical to the naive join at any width,
  * with fan-out bounded by the cap.
  *
  * Scope and safety:
  *  - OPT-IN: inert unless `spark.graft.rangeJoin.binSec` > 0 (choose a
  *    bin near the typical interval length; fan-out per interval row is
  *    min(len/bin, maxBinsPerRow) + 1).
  *  - Inner joins only; ts/bounds must be timestamp or integral, each
  *    referencing exactly one side. Extra conjuncts (equi keys, other
  *    filters) are preserved untouched.
  *  - Idempotent: the generated `_graft_bin` attribute marks the binned
  *    branch (prefix-shared with TimeOps.rangeJoin's scratch column, so
  *    hand-binned joins are not re-binned), and the span-cap filter
  *    marks the wide branch. Even if a later batch rearranges the wide
  *    branch past that second guard, a re-split stays row-correct — the
  *    guards bound plan growth, they do not protect correctness.
  *  - NULL bounds fail both span filters (NULL predicate); inverted
  *    intervals (`start > end`, negative span) are rejected by the
  *    narrow branch's `span >= 0` conjunct and the wide branch's
  *    `span > cap` — dropped on every path, matching the naive inner
  *    join's empty result for such rows.
  *
  * Registered through `GraftExtensions` (injectOptimizerRule), the
  * extension ladder's whole-plan tier next to the expression-level
  * kernels.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val ConfKey = "spark.graft.rangeJoin.binSec"
  val MaxBinsKey = "spark.graft.rangeJoin.maxBinsPerRow"
  private val BinName = "_graft_bin"

  private def binnable(e: Expression): Boolean = e.dataType match {
    case TimestampType | LongType | IntegerType | ShortType => true
    case _ => false
  }

  private def refsOnly(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val bin =
      try conf.getConfString(ConfKey, "0").toLong
      catch { case _: NumberFormatException => 0L }
    if (bin <= 0) return plan
    val maxBins =
      try math.max(1L, conf.getConfString(MaxBinsKey, "4096").toLong)
      catch { case _: NumberFormatException => 4096L }
    plan.transformUp {
      // prefix match: TimeOps.rangeJoin's hand-binned joins carry a
      // Names.fresh("_graft_bin") scratch column (possibly suffixed) —
      // re-binning an already-binned join would square its fan-out
      case j @ Join(left, right, Inner, Some(_), _)
          if !left.output.exists(_.name.startsWith(BinName)) &&
            !right.output.exists(_.name.startsWith(BinName)) =>
        rewrite(j, bin, maxBins).getOrElse(j)
    }
  }

  private def rewrite(j: Join, bin: Long, maxBins: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(j.condition.get)
    // `ts >= bound` in either spelling
    def lower(c: Expression): Option[(Expression, Expression)] = c match {
      case GreaterThanOrEqual(a, b) => Some((a, b))
      case LessThanOrEqual(a, b)    => Some((b, a))
      case _                        => None
    }
    // `ts <= bound` in either spelling
    def upper(c: Expression): Option[(Expression, Expression)] = c match {
      case LessThanOrEqual(a, b)    => Some((a, b))
      case GreaterThanOrEqual(a, b) => Some((b, a))
      case _                        => None
    }
    // TimeZoneAwareExpressions (Cast, Sequence) built after analysis must
    // carry their zone explicitly — ResolveTimeZone has already run, and
    // a zoneless instance reads as unresolved to the plan validator
    val tz = Some(conf.sessionLocalTimeZone)
    // no no-op casts: SimplifyCasts (same fixed-point batch) strips a
    // Long->Long cast, which would make the planted wide-branch guard
    // no longer semanticEquals the one we rebuild next iteration -- the
    // rule would then re-split every iteration until maxIterations
    def binOf(e: Expression): Expression = {
      val asLong = if (e.dataType == LongType) e else Cast(e, LongType, tz)
      IntegralDivide(asLong, Literal(bin))
    }

    // find (ts, start, end) with ts on `tsSide` and both bounds on
    // `ivlSide`; first match wins (extra ranges stay as plain filters)
    def orient(tsSide: LogicalPlan, ivlSide: LogicalPlan)
        : Option[(Expression, Expression, Expression)] = {
      val cands = for {
        lc <- conjuncts.iterator
        (lts, st) <- lower(lc).iterator
        if binnable(lts) && refsOnly(lts, tsSide) &&
          binnable(st) && refsOnly(st, ivlSide)
        uc <- conjuncts.iterator if uc ne lc
        (uts, en) <- upper(uc).iterator
        if uts.semanticEquals(lts) && binnable(en) && refsOnly(en, ivlSide)
      } yield (lts, st, en)
      cands.nextOption()
    }

    def build(ts: Expression, st: Expression, en: Expression,
        ivlOnLeft: Boolean): Option[LogicalPlan] = {
      val ivl = if (ivlOnLeft) j.left else j.right
      val span = Subtract(binOf(en), binOf(st))
      val wideGuard = GreaterThan(span, Literal(maxBins))
      // idempotence for the wide branch: if EVERY row of the interval
      // side is already span-capped, this IS the wide branch of a
      // previous application — leave it as the intended nested loop.
      // Tested through plan CONSTRAINTS, not a subtree scan: the planted
      // guard holds for all ivl rows, so it survives in `constraints`
      // wherever pushdown migrates the Filter (even below a Union — it
      // is pushed into every branch, and Union intersects). A
      // semantically-equal guard buried in a NESTED, previously
      // rewritten range join over the same bounds does NOT propagate:
      // that join's Union intersects its wide branch (span > cap) with
      // its binned branch (span <= cap) and the guard dies there — so it
      // cannot veto this join's rewrite (the subtree-scan form read it
      // as "already split" and silently left the outer join as a nested
      // loop). With constraint propagation disabled there is nothing to
      // read, so fall back to the conservative whole-subtree scan —
      // correct, possibly skipping a nested-join rewrite.
      val alreadySplit =
        if (conf.constraintPropagationEnabled)
          ivl.constraints.exists(_.semanticEquals(wideGuard))
        else ivl.exists {
          case Filter(c, _) =>
            splitConjunctivePredicates(c).exists(_.semanticEquals(wideGuard))
          case _ => false
        }
      if (alreadySplit) None else {
        // binned branch over rows within the span cap (NULL spans fail
        // the predicate and drop — they cannot match an inner join)
        val binAttr = AttributeReference(BinName, LongType, nullable = false)()
        // span >= 0 matters: an INVERTED interval (start > end) has a
        // negative span that passes span <= maxBins alone, and
        // Sequence(big, small) would then build a huge DESCENDING array
        // -- such rows can never satisfy the inner-join predicate, so
        // they are dropped here (the naive join emits nothing for them)
        val narrow = Filter(And(GreaterThanOrEqual(span, Literal(0L)),
          LessThanOrEqual(span, Literal(maxBins))), ivl)
        val gen = Generate(Explode(new Sequence(binOf(st), binOf(en), None, tz)),
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Seq(binAttr), child = narrow)
        val binnedCond = (conjuncts :+ EqualTo(binOf(ts), binAttr)).reduce(And)
        val binnedJoin =
          if (ivlOnLeft) j.copy(left = gen, condition = Some(binnedCond))
          else j.copy(right = gen, condition = Some(binnedCond))
        // wide branch: original condition over just the over-cap rows
        val wide = Filter(wideGuard, ivl)
        val wideJoin =
          if (ivlOnLeft) j.copy(left = wide) else j.copy(right = wide)
        // both branches project to the original output attributes
        Some(Union(Seq(Project(j.output, binnedJoin), Project(j.output, wideJoin))))
      }
    }

    orient(j.left, j.right).flatMap { case (ts, st, en) => build(ts, st, en, ivlOnLeft = false) }
      .orElse(orient(j.right, j.left).flatMap { case (ts, st, en) => build(ts, st, en, ivlOnLeft = true) })
  }
}
