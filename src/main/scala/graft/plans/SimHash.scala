package graft.plans

import graft.Qh
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression for the 60-bit SimHash fingerprint of a
  * token-hash array (see [[graft.operators.Dedup.simhash]] for the
  * declarative definition and constants; band j of 4 draws 15 bits from
  * the affine re-hash g_j = (h·Aj + Bj) mod HashP of each token hash h).
  *
  * The declarative `aggregate`/`zip_with` formulation walks an interpreted
  * expression tree per (token × bit-slot) — higher-order functions are
  * CodegenFallback — costing ~60 lambda evaluations per token. This is the
  * same computation as two tight codegen'd loops: 4 affine ops + 60
  * add/subtracts per token. Values are IDENTICAL to the declarative form
  * and to the DuckDB oracle fragment ([[graft.operators.Dedup.simhashSql]]).
  *
  * Null array elements contribute -1 to every slot, matching the
  * declarative form's `when(null === 1, 1).otherwise(-1)` semantics.
  */
case class SimHash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_simhash expects ARRAY<BIGINT>, got ${other.catalogString}")
    }

  protected override def nullSafeEval(input: Any): Any =
    SimHash60.fingerprint(input.asInstanceOf[ArrayData])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.plans.SimHash60.fingerprint($arr);")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object SimHash60 {
  val Bits = 60
  val BandBits = 15
  val Bands: Int = Bits / BandBits
  val P: Long = Qh.HashP
  // MUST match graft.operators.Dedup.simParams
  val A: Array[Long] = Array.tabulate(Bands)(j => (2 * j + 3) * 130363L % P)
  val B: Array[Long] = Array.tabulate(Bands)(j => (9973L * j + 54321L) % P)

  /** Shared by interpreted eval and generated code (a static call keeps
    * the generated method tiny and JIT-friendly). */
  def fingerprint(arr: ArrayData): Long = {
    val sums = new Array[Int](Bits)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        var b = 0
        while (b < Bits) { sums(b) -= 1; b += 1 }
      } else {
        val h = arr.getLong(i)
        var j = 0
        while (j < Bands) {
          val g = (h * A(j) + B(j)) % P
          var r = 0
          while (r < BandBits) {
            if (((g >> r) & 1L) == 1L) sums(BandBits * j + r) += 1
            else sums(BandBits * j + r) -= 1
            r += 1
          }
          j += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < Bits) {
      if (sums(b) > 0) fp |= 1L << b
      b += 1
    }
    fp
  }

  /** Column form for direct library use (no registration needed). */
  def column(c: Column): Column = GraftShim.column(SimHash60(GraftShim.expression(c)))
}
