package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-row hashed-lexicon classifier profile: `ARRAY<BIGINT>
  * [n_tok, n_dist, score_num, n_pos, n_neg]` over a token array in ONE
  * generated-code pass, where each token's weight is the feature-hashed
  * lexicon value `pmod(polyhash(tok), 2001) - 1000` shared by every
  * text_clf_* operator ([[PolyHash]] fold, non-negative, so pmod is a
  * plain remainder).
  *
  * This is [[TokenProfile]]'s sibling for the classifier family
  * (r13 optimization round): the former spelling exploded the token
  * stream and aggregated per doc — and the variants needing a distinct
  * count (`countDistinct(tok)`) paid Spark's two-level distinct rewrite,
  * whose FIRST exchange carries the full (doc, token) grid. Carrying a
  * per-row `size(array_distinct(...))` through the explode instead is an
  * optimizer trap: Catalyst collapses the projection ABOVE the Generate,
  * re-evaluating the distinct over the whole array once per token row
  * (plan-audited — O(len²) per doc). The native profile computes all
  * five integers in one pass per row, so per-doc scoring is map-only.
  *
  * Value parity with the exploded aggregation form (pinned by
  * ClfProfileSpec): n_tok counts every element (as `count(1)` over
  * exploded rows did), n_dist counts distinct NON-null tokens (as
  * `countDistinct(tok)` did — split output never contains nulls, so the
  * null conventions are unobservable; a defensive null element is
  * excluded from n_dist and carries no weight, like `strHash(null)`'s
  * null weight under sum/when), and score/n_pos/n_neg fold the exact
  * integer weights.
  *
  * NON-NULL-text invariant (r13 ADVICE, documented r14): a null input
  * ARRAY yields a null profile ROW-PRESERVINGLY, whereas the exploded
  * groupBy form this replaced dropped null-text docs entirely (no
  * exploded rows → no group). The graft corpus guarantees `text` is
  * non-null (generator + TablesSchemaDriftSpec surface), so the two
  * conventions are unobservable today; a caller feeding nullable text
  * must `filter(col("text").isNotNull)` first to keep the old contract.
  */
case class ClfProfile(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_clf_profile expects ARRAY<STRING>, got ${other.catalogString}")
  }

  protected override def nullSafeEval(input: Any): Any =
    ClfProfile.profile(input.asInstanceOf[ArrayData])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.plans.ClfProfile.profile($arr);")

  override protected def withNewChildInternal(newChild: Expression): ClfProfile =
    copy(child = newChild)
}

object ClfProfile {
  /** Shared by interpreted eval and generated code (static forwarder —
    * the TokenProfile pattern). */
  def profile(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val seen = new java.util.HashSet[UTF8String](math.max(4, n))
    var score = 0L
    var nPos = 0L
    var nNeg = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val tok = arr.getUTF8String(i)
        seen.add(tok)
        val w = PolyHash.hash(tok.toString) % 2001L - 1000L
        score += w
        if (w > 0L) nPos += 1L
        else if (w < 0L) nNeg += 1L
      }
      i += 1
    }
    new GenericArrayData(Array(n.toLong, seen.size.toLong, score, nPos, nNeg))
  }

  /** Column form for direct library use (no registration needed). */
  def column(c: Column): Column = GraftShim.column(ClfProfile(GraftShim.expression(c)))
}
