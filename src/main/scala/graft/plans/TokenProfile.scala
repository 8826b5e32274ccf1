package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-row token-frequency profile: `ARRAY<BIGINT>
  * [n_tok, n_dist, top_cnt]` over a token array in ONE generated-code
  * pass — total elements, distinct elements, and the highest per-token
  * frequency (empty-string tokens counted like any other, exactly as
  * `explode(split(text, ' '))` emits them).
  *
  * This is the Gopher repetition-quality triple
  * (text_repetition / corpus_manifest semantics) WITHOUT the
  * explode → groupBy(doc, token) → groupBy(doc) double shuffle: at
  * 100 TB the exploded (doc, token) pair stream is orders of magnitude
  * larger than the corpus, while this profile is map-only — the shape
  * [[graft.streaming.Streaming.curateBatch]] wants at ingest cadence,
  * where the verdict (not the per-token table) is the output. Values
  * are IDENTICAL to the aggregation form; CurateIngestSpec pins the
  * kept set against the manifest verdict and TokenProfileSpec pins the
  * triple itself on planted arrays.
  */
case class TokenProfile(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_token_profile expects ARRAY<STRING>, got ${other.catalogString}")
  }

  protected override def nullSafeEval(input: Any): Any =
    TokenProfile.profile(input.asInstanceOf[ArrayData])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.plans.TokenProfile.profile($arr);")

  override protected def withNewChildInternal(newChild: Expression): TokenProfile =
    copy(child = newChild)
}

object TokenProfile {
  /** Shared by interpreted eval and generated code (static forwarder —
    * the SimHash60.fingerprint pattern). Null elements (impossible in
    * `split` output, but legal in the array type) are counted as one
    * shared pseudo-token, matching what a groupBy over exploded rows
    * would do with its NULL group. */
  def profile(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val counts = new java.util.HashMap[UTF8String, Array[Long]](math.max(4, n))
    var nulls = 0L
    var top = 0L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        nulls += 1
        if (nulls > top) top = nulls
      } else {
        var c = counts.get(arr.getUTF8String(i))
        if (c == null) { c = Array(0L); counts.put(arr.getUTF8String(i), c) }
        c(0) += 1
        if (c(0) > top) top = c(0)
      }
      i += 1
    }
    val nDist = counts.size.toLong + (if (nulls > 0) 1L else 0L)
    new GenericArrayData(Array(n.toLong, nDist, top))
  }

  /** Column form for direct library use (no registration needed). */
  def column(c: Column): Column = GraftShim.column(TokenProfile(GraftShim.expression(c)))
}
