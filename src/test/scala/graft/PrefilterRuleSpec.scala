package graft

import graft.functions.GraftFunctions
import graft.plans.JaroWinklerPrefilter
import org.apache.spark.sql.functions._

/** The Jaro-Winkler length-prefilter rule: high-threshold predicates gain
  * a character-length bound ahead of the O(l²) kernel; results never
  * change; low thresholds (where the bound is vacuous) are left alone;
  * and the tight bound prunes strictly more candidates than the old
  * 3×-slack octet formulation did.
  */
class PrefilterRuleSpec extends SparkSpec {

  private def pairs() = {
    import spark.implicits._
    val names = Seq("alpha", "alphabet", "al", "alpine", "alphonse",
      "x", "alphabets").toDF("n1")
    names.crossJoin(names.toDF("n2"))
  }

  test("jaro_winkler >= t>0.8 gains a char-length prefilter, same rows") {
    GraftFunctions.ensureRegistered(spark)
    val jw = call_function("jaro_winkler", col("n1"), col("n2"))
    val before = pairs().where(jw >= 0.9).collect().toSet // rule absent
    spark.experimental.extraOptimizations = Seq(JaroWinklerPrefilter)
    try {
      val q = pairs().where(jw >= 0.9)
      val opt = q.queryExecution.optimizedPlan.toString
      assert(opt.contains("length"), "bound not injected:\n" + opt)
      assert(q.collect().toSet == before, "prefilter changed the result")
      // strict > works too; idempotent under the fixpoint batch (one copy)
      val strict = pairs().where(jw > 0.9)
      val sopt = strict.queryExecution.optimizedPlan.toString
      assert("length\\(".r.findAllIn(sopt).size <= 4, sopt)
      assert(sopt.contains("length("), sopt)
      // t <= 0.8: min/max >= 5t-4 is vacuous — no rewrite
      val low = pairs().where(jw >= 0.5)
      assert(!low.queryExecution.optimizedPlan.toString
        .contains("length("))
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("the bound itself is sound: a ruled-out pair really scores below t") {
    GraftFunctions.ensureRegistered(spark)
    // min/max = 1/9 < 5*0.9-4 = 0.5 -> prefilter drops it; kernel agrees
    val r = spark.sql("SELECT jaro_winkler('x', 'abcdefghi') AS s").head()
    assert(r.getDouble(0) < 0.9)
  }

  test("tight bound prunes strictly more pairs than the old 3x slack") {
    // t = 0.9 -> k = 5t-4 = 0.5. Tight: min >= k*max. Old: 3*min >= k*max
    // (admits length ratios down to ~1/6). On the linkage fixture the
    // tight bound must keep every true match (soundness, shown above) AND
    // survive on strictly fewer candidate pairs — i.e. the pruning the
    // derivation promises actually happens.
    val k = 5.0 * 0.9 - 4.0
    val lo = least(length(col("n1")), length(col("n2"))).cast("double")
    val hi = greatest(length(col("n1")), length(col("n2"))).cast("double")
    val tight = pairs().where(lo >= hi * k).count()
    val loose = pairs().where(lo * 3.0 >= hi * k).count()
    assert(tight < loose,
      s"tight bound kept $tight pairs, old slack bound kept $loose")
    // and the tight bound still admits every pair the kernel accepts
    GraftFunctions.ensureRegistered(spark)
    val jw = call_function("jaro_winkler", col("n1"), col("n2"))
    val accepted = pairs().where(jw >= 0.9)
    assert(accepted.where(lo < hi * k).count() == 0,
      "tight bound dropped a true match")
  }

  test("two same-threshold predicates BOTH get bounds (per-pair guard)") {
    GraftFunctions.ensureRegistered(spark)
    // non-foldable columns: a literal relation would be constant-folded
    // away before the rule could prove anything
    val df = spark.range(5).selectExpr(
      "concat('alpha', id) AS a", "concat('alphabet', id) AS b",
      "concat('alpine', id) AS c", "concat('alphons', id) AS d")
    val jw1 = call_function("jaro_winkler", col("a"), col("b"))
    val jw2 = call_function("jaro_winkler", col("c"), col("d"))
    spark.experimental.extraOptimizations = Seq(JaroWinklerPrefilter)
    try {
      // a shape-only already-present guard would let the (a,b) bound
      // suppress injection for (c,d), leaving the second kernel unguarded
      val opt = (df.where(jw1 >= 0.9 && jw2 >= 0.9))
        .queryExecution.optimizedPlan.toString
      val n = "least\\(".r.findAllIn(opt.toLowerCase).size
      assert(n >= 2, s"expected a length bound per predicate, got $n:\n$opt")
    } finally spark.experimental.extraOptimizations = Nil
  }
}
