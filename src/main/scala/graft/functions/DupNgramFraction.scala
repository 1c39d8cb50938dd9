package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: fraction of token `n`-gram occurrences that
  * duplicate an earlier gram in the same string — the Gopher-style
  * repetition/boilerplate signal (`1 − distinct/total`).
  *
  * Why an Expression: the HOF formulation
  * (`transform(sequence(...), i => array_join(slice(split(text,' '),...)))`
  * + `array_distinct`) dispatches an interpreted lambda per gram and
  * allocates the token array, one gram string per position, and the
  * distinct array — it was the slowest hot path in the engine (q33_repetition,
  * 5.7 s at sf0.1). This expression makes one pass over the UTF-8 bytes:
  * token boundaries are byte offsets (a space can never occur inside a
  * multi-byte UTF-8 sequence), each gram is a zero-copy [[UTF8String]] view
  * over the shared byte array, and distinctness is an exact byte-equality
  * `HashSet` — no hash-only shortcut that could miscount on collision.
  *
  * Semantics are bit-identical to the HOF it replaced (the queries are
  * oracle-paired — the hash must not change):
  *   - tokens = `split(text, " ")` with Java `limit = -1` semantics:
  *     consecutive spaces yield empty tokens, leading/trailing spaces kept;
  *   - gram `i` (for `i` in `0 .. max(numToks − n, 0)`) joins tokens
  *     `i .. min(i+n−1, numToks−1)` with a single space — which is exactly
  *     the original substring spanning those tokens, because the join
  *     separator equals the split separator;
  *   - a string shorter than `n` tokens yields ONE truncated gram (score 0);
  *   - result = `1 − distinct/total` in exact-input IEEE double division.
  */
case class DupNgramFraction(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"dup_ngram_frac expects a string, got ${left.dataType.sql}")
    else if (right.dataType != IntegerType || !right.foldable)
      TypeCheckResult.TypeCheckFailure("dup_ngram_frac n must be an int literal")
    else {
      val n = right.eval()
      if (n != null && n.asInstanceOf[Int] >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"dup_ngram_frac n must be >= 1, got $n")
    }
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dup_ngram_frac"

  override protected def nullSafeEval(t: Any, n: Any): Any =
    DupNgrams.compute(t.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) =>
      s"${ev.value} = graft.functions.DupNgrams.compute($t, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DupNgramFraction =
    copy(left = newLeft, right = newRight)
}

/** Static helper the generated code calls (standalone object → the compiler
  * emits a Java-callable static forwarder; one static call per row, the
  * loop body JITs like hand-written Java).
  */
object DupNgrams {
  def compute(text: UTF8String, n: Int): Double = {
    val b = text.getBytes
    val len = b.length
    // token starts: offset 0 plus the byte after every 0x20. UTF-8
    // continuation bytes are >= 0x80, so scanning bytes is exact.
    var numToks = 1
    var i = 0
    while (i < len) { if (b(i) == ' '.toByte) numToks += 1; i += 1 }
    val starts = new Array[Int](numToks + 1)
    var t = 1
    i = 0
    while (i < len) {
      if (b(i) == ' '.toByte) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(numToks) = len + 1 // sentinel: end of token k = starts(k+1) − 1
    val gramCount = if (numToks > n) numToks - n + 1 else 1
    val seen = new java.util.HashSet[UTF8String](gramCount * 2)
    var distinct = 0
    var g = 0
    while (g < gramCount) {
      val lastTok = math.min(g + n - 1, numToks - 1)
      val st = starts(g)
      val gramLen = starts(lastTok + 1) - 1 - st
      if (seen.add(UTF8String.fromBytes(b, st, gramLen))) distinct += 1
      g += 1
    }
    1.0 - distinct.toDouble / gramCount.toDouble
  }
}
