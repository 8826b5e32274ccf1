package graft.plans

import graft.Qh
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression computing the full 8-hash MinHash signature
  * of a token-hash array in ONE pass: signature[i] = min over tokens h of
  * (h·Ai + Bi) mod HashP (constants MUST match
  * [[graft.operators.Dedup.hashParams]]; parity is spec-asserted).
  *
  * The declarative formulation — eight `withColumn(array_min(transform(
  * th, ...)))` folds — inlines the token-hash pipeline into every one of
  * the eight projections after CollapseProject, so the generated code
  * carries the whole transform 8×: janino compilation of those classes
  * costs seconds of one-time latency on whichever LSH query runs first,
  * and execution walks the array eight times. This expression is one
  * tight loop, one small generated class.
  *
  * Empty input → an all-null signature, matching `array_min([])` = null
  * element-wise in both Spark and the DuckDB oracle fragment.
  */
case class MinHashSig(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_minhash expects ARRAY<BIGINT>, got ${other.catalogString}")
    }

  protected override def nullSafeEval(input: Any): Any =
    MinHashSig.signature(input.asInstanceOf[ArrayData])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.plans.MinHashSig.signature($arr);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  val Hashes = 8
  val P: Long = Qh.HashP
  // MUST match graft.operators.Dedup.hashParams
  val A: Array[Long] = Array.tabulate(Hashes)(i => ((2 * i + 1) * 104729L) % P)
  val B: Array[Long] = Array.tabulate(Hashes)(i => (7919L * i + 12345L) % P)

  /** Shared by interpreted eval and generated code. Null token hashes are
    * skipped (a null lambda result cannot be the array_min in the
    * declarative form either). */
  def signature(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val mins = Array.fill(Hashes)(Long.MaxValue)
    var seen = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        seen = true
        val h = arr.getLong(i)
        var j = 0
        while (j < Hashes) {
          val g = (h * A(j) + B(j)) % P
          if (g < mins(j)) mins(j) = g
          j += 1
        }
      }
      i += 1
    }
    if (!seen) new GenericArrayData(Array.fill[Any](Hashes)(null))
    else new GenericArrayData(mins.map(Long.box(_): Any))
  }

  /** Column form for direct library use (no registration needed). */
  def column(c: Column): Column = GraftShim.column(MinHashSig(GraftShim.expression(c)))
}
