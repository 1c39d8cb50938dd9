package graft.plans

import graft.functions.JaroWinkler
import org.apache.spark.sql.catalyst.expressions.{And, Cast, Expression,
  GreaterThan, GreaterThanOrEqual, Greatest, Least, Length, Literal,
  Multiply}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: in front of an expensive `jaro_winkler(a,b) >= t`
  * predicate, inject a cheap byte-length prefilter implied by the
  * threshold, so the O(|a|·|b|) kernel never runs on pairs a length check
  * already rules out.
  *
  * Derivation (kernel semantics in [[graft.functions.JaroWinklerImpl]]):
  * matches m ≤ min(l1,l2), so jaro ≤ (2 + min/max) / 3, and the Winkler
  * boost (prefix ≤ 4, weight 0.1) gives jw ≤ 0.6·jaro + 0.4. Hence
  * jw ≥ t forces min/max ≥ 5t − 4 — a bound that only bites for
  * t > 0.8, which is exactly the high-precision linkage regime where the
  * blocked candidate join is large. The lengths here are CHARACTER
  * lengths (`length`, a linear numChars scan — cheap next to the
  * O(|a|·|b|) kernel), the exact quantity the derivation is stated in, so
  * the injected conjunct `length(min) ≥ (5t−4)·length(max)` is tight AND
  * sound for any UTF-8 input (an octet-length variant would need a 4×
  * slack for 4-byte code points, forfeiting most of the pruning at
  * t≈0.9). It is codegen'd arithmetic evaluated before the kernel (And
  * short-circuits), and — like every sound pushed predicate — never
  * changes the result.
  *
  * Registered by `GraftExtensions` (injectOptimizerRule); runs in the
  * operator-optimization fixpoint batch, so the rewrite is idempotent: a
  * predicate whose filter already contains the semantically-equal bound
  * is left alone.
  */
object JaroWinklerPrefilter extends Rule[LogicalPlan] {

  private def bound(a: Expression, b: Expression, t: Double): Expression = {
    val la = Cast(Length(a), DoubleType)
    val lb = Cast(Length(b), DoubleType)
    GreaterThanOrEqual(
      Least(Seq(la, lb)),
      Multiply(Greatest(Seq(la, lb)), Literal(5.0 * t - 4.0)))
  }

  /** Is `e` the (possibly optimized) length of `x`? Covers the bound as
    * injected (`Cast(Length(x), Double)`), a bare `Length(x)`, and the
    * ConstantFolding result when `x` is a literal string (the whole
    * length collapses to a number — recognized only when `x` is in fact
    * foldable, so a folded literal never masks a DIFFERENT column pair's
    * missing bound).
    */
  private def isLenOf(e: Expression, x: Expression): Boolean = e match {
    case Cast(Length(y), DoubleType, _, _) => y.semanticEquals(x)
    case Length(y) => y.semanticEquals(x)
    case Literal(_, _) => x.foldable
    case _ => false
  }

  /** A bound for threshold `t` ON THIS ARGUMENT PAIR is already present
    * if a conjunct keeps the GTE(Least(…), Greatest(…)·(5t−4)) skeleton
    * AND every length argument inside it is a/b's length. Matching the
    * shape — not `semanticEquals` on the freshly-built bound — keeps the
    * rule idempotent across the fixpoint batch even after ConstantFolding
    * rewrites a literal argument's `length(…)` into a number; matching
    * the ARGUMENTS keeps a second `jaro_winkler(c,d) >= t` predicate at
    * the same threshold from being silently left unprefiltered because
    * the (a,b) bound already matched the shape.
    */
  private def hasBound(cond: Expression, t: Double, a: Expression,
      b: Expression): Boolean = cond.exists {
    case GreaterThanOrEqual(Least(ls),
        Multiply(Greatest(gs), Literal(v: Double, DoubleType), _)) =>
      v == 5.0 * t - 4.0 &&
        (ls ++ gs).forall(e => isLenOf(e, a) || isLenOf(e, b))
    case _ => false
  }

  /** Add the bound in front of every qualifying comparison inside `cond`
    * (idempotent: a condition that already carries the bound — this
    * batch runs to fixpoint — is returned unchanged).
    */
  private def rewrite(cond: Expression): Expression = cond.transformUp {
    case ge @ GreaterThanOrEqual(jw: JaroWinkler, Literal(t: Double, DoubleType))
        if t > 0.8 && !hasBound(cond, t, jw.left, jw.right) =>
      And(bound(jw.left, jw.right, t), ge)
    case gt @ GreaterThan(jw: JaroWinkler, Literal(t: Double, DoubleType))
        if t > 0.8 && !hasBound(cond, t, jw.left, jw.right) =>
      And(bound(jw.left, jw.right, t), gt)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // both shapes matter: the predicate starts in a Filter, but pushdown
    // may fold it into a Join condition before this rule runs
    case f @ Filter(cond, child) =>
      val newCond = rewrite(cond)
      if (newCond fastEquals cond) f else Filter(newCond, child)
    case j @ Join(_, _, _, Some(cond), _) =>
      val newCond = rewrite(cond)
      if (newCond fastEquals cond) j else j.copy(condition = Some(newCond))
  }
}
