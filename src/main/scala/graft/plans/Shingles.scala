package graft.plans

import graft.Qh
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native token-3-gram shingle hashes from a token-hash array:
  * g_i = ((th_i·31 + th_{i+1}) mod P)·31 + th_{i+2} mod P, optionally
  * de-duplicated preserving first occurrence (matching `array_distinct`).
  *
  * The declarative form ([[graft.operators.Dedup.shingles3]] decl
  * variants) is two chained `zip_with` lambdas plus `filter` +
  * `array_distinct` — all CodegenFallback, re-walking the array with a
  * lambda frame per element for EVERY document of the corpus in the
  * shingle-family queries (contamination, boilerplate, n-gram Jaccard,
  * MinHash-LSH). This expression is one fused loop; parity with the
  * declarative chain is spec-asserted (PolyHashSpec).
  *
  * Null/shape semantics replicate the HOF chain exactly: arrays shorter
  * than 3 tokens → empty result (the zip_with windows are empty after the
  * trailing-null filter); a null ELEMENT poisons the windows it overlaps
  * — those window results are null and are filtered out, exactly like
  * `filter(_.isNotNull)` drops them. */
case class Shingles3(child: Expression, distinct: Boolean) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles expects ARRAY<BIGINT>, got ${other.catalogString}")
  }

  protected override def nullSafeEval(input: Any): Any =
    Shingles3.shingles(input.asInstanceOf[ArrayData], distinct)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.plans.Shingles3.shingles($arr, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): Shingles3 =
    copy(child = newChild)
}

object Shingles3 {
  val P: Long = Qh.HashP

  /** Shared by interpreted eval and generated code. */
  def shingles(th: ArrayData, distinct: Boolean): ArrayData = {
    val n = th.numElements()
    if (n < 3) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n - 2)
    var m = 0
    var i = 0
    while (i < n - 2) {
      if (!(th.isNullAt(i) || th.isNullAt(i + 1) || th.isNullAt(i + 2))) {
        val g = (((th.getLong(i) * 31 + th.getLong(i + 1)) % P) * 31 + th.getLong(i + 2)) % P
        out(m) = g
        m += 1
      }
      i += 1
    }
    if (!distinct) return new GenericArrayData(java.util.Arrays.copyOf(out, m))
    // first-occurrence de-dup, preserving order like array_distinct
    val seen = new java.util.HashSet[java.lang.Long](m * 2)
    val ded = new Array[Long](m)
    var k = 0
    var j = 0
    while (j < m) {
      if (seen.add(out(j))) { ded(k) = out(j); k += 1 }
      j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(ded, k))
  }

  def column(c: Column, distinct: Boolean): Column =
    GraftShim.column(Shingles3(GraftShim.expression(c), distinct))
}
