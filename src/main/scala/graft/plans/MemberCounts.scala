package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native membership counter over a token array: returns
  * `ARRAY<BIGINT> [countInA, countInB, nonEmptyTokens]` in ONE pass.
  *
  * The declarative form — `size(filter(toks, _.isin(wordsA)))` twice plus
  * a `size(filter(toks, _ =!= ""))` — is three interpreted higher-order
  * functions per row (ArrayFilter is CodegenFallback), each scanning the
  * token array against a 14-element isin list. This expression is one
  * generated-code loop over two hash sets; counts are identical (the
  * lexicons contain no empty string, so membership is unaffected by the
  * empty-token drop, and null elements — which `isin` maps to null →
  * filtered out — are skipped). Used by the sentiment scorer
  * ([[graft.enrich.Enrich.LexiconScorer]]); parity is spec-asserted.
  */
case class MemberCounts(child: Expression, wordsA: Seq[String], wordsB: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_member_counts expects ARRAY<STRING>, got ${other.catalogString}")
  }

  @transient private lazy val sets = MemberCounts.Sets(wordsA, wordsB)

  protected override def nullSafeEval(input: Any): Any =
    MemberCounts.count(input.asInstanceOf[ArrayData], sets)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mcSets", sets, classOf[MemberCounts.Sets].getName)
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.plans.MemberCounts.count($arr, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): MemberCounts =
    copy(child = newChild)
}

object MemberCounts {
  /** Pre-built UTF8String hash sets, shared across rows. */
  final case class Sets(wordsA: Seq[String], wordsB: Seq[String]) {
    @transient lazy val a: java.util.HashSet[UTF8String] = build(wordsA)
    @transient lazy val b: java.util.HashSet[UTF8String] = build(wordsB)
    private def build(ws: Seq[String]): java.util.HashSet[UTF8String] = {
      val s = new java.util.HashSet[UTF8String](ws.size * 2)
      ws.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }
  }

  def count(toks: ArrayData, sets: Sets): ArrayData = {
    val n = toks.numElements()
    var inA = 0L
    var inB = 0L
    var nonEmpty = 0L
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        if (t.numBytes() > 0) {
          nonEmpty += 1
          if (sets.a.contains(t)) inA += 1
          if (sets.b.contains(t)) inB += 1
        }
      }
      i += 1
    }
    new GenericArrayData(Array[Any](inA, inB, nonEmpty))
  }

  def column(toks: Column, wordsA: Seq[String], wordsB: Seq[String]): Column =
    GraftShim.column(MemberCounts(GraftShim.expression(toks), wordsA, wordsB))
}
