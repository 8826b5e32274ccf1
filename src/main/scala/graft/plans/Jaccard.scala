package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}

/** Native Catalyst expression for the exact Jaccard similarity of two
  * token/shingle set columns (`ARRAY<BIGINT>` or `ARRAY<STRING>`, both
  * sides alike), rounded to 4 decimals:
  * `round(|a ∩ b| / (|a| + |b| - |a ∩ b|), 4)`.
  *
  * This is the verification step of every near-dup operator — it runs once
  * per candidate pair, which in the exact-baseline queries (q28a) means
  * millions of evaluations. The declarative `size(array_intersect(a, b))`
  * materializes the intersection array and its deduplication structures
  * per pair; this expression only counts, with one hash set per pair.
  *
  * Semantics are IDENTICAL to the declarative form
  * ([[graft.operators.Dedup.jaccardDecl]], spec-asserted) and the DuckDB
  * oracle fragment FOR NULL-FREE ELEMENTS (all token/shingle producers
  * declare containsNull=false; null elements here are skipped, whereas
  * array_intersect would count a null shared by both sides): the
  * intersection is counted over DISTINCT common elements, sizes are the
  * raw array lengths, and rounding is HALF_UP like Spark's `round`. Two
  * empty arrays yield NULL defensively (the ANSI declarative form would
  * raise DIVIDE_BY_ZERO; operator pipelines never produce empty sets).
  */
case class JaccardSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // empty ∪ empty → null, like x/0
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_jaccard expects both sides ARRAY<BIGINT> or both ARRAY<STRING>, " +
          s"got (${l.catalogString}, ${r.catalogString})")
    }

  private def isLongElems: Boolean = left.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  protected override def nullSafeEval(a: Any, b: Any): Any =
    if (isLongElems) JaccardSim.simLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else JaccardSim.simObj(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isLongElems) "simLong" else "simObj"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val res = ctx.freshName("gjRes")
      s"""
      |java.lang.Double $res = graft.plans.JaccardSim.$fn($a, $b);
      |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res.doubleValue(); }
      |""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JaccardSim =
    copy(left = newLeft, right = newRight)
}

object JaccardSim {

  private def finish(inter: Long, na: Int, nb: Int): java.lang.Double = {
    val denom = na.toLong + nb - inter
    if (denom == 0) null
    else {
      val raw = inter.toDouble / denom
      java.math.BigDecimal.valueOf(raw).setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    }
  }

  /** Long-array variant. Hashes the smaller side; counts distinct common
    * elements by removing matched members so duplicates in the probe side
    * cannot double-count. */
  def simLong(a: ArrayData, b: ArrayData): java.lang.Double = {
    val na = a.numElements()
    val nb = b.numElements()
    val (small, probe) = if (na <= nb) (a, b) else (b, a)
    val set = new java.util.HashSet[java.lang.Long](small.numElements() * 2)
    var i = 0
    while (i < small.numElements()) {
      if (!small.isNullAt(i)) set.add(small.getLong(i))
      i += 1
    }
    var inter = 0L
    i = 0
    while (i < probe.numElements()) {
      if (!probe.isNullAt(i) && set.remove(probe.getLong(i))) inter += 1
      i += 1
    }
    finish(inter, na, nb)
  }

  /** String-array variant (UTF8String equality — binary, like Spark). */
  def simObj(a: ArrayData, b: ArrayData): java.lang.Double = {
    val na = a.numElements()
    val nb = b.numElements()
    val (small, probe) = if (na <= nb) (a, b) else (b, a)
    val set = new java.util.HashSet[AnyRef](small.numElements() * 2)
    var i = 0
    while (i < small.numElements()) {
      if (!small.isNullAt(i)) set.add(small.getUTF8String(i))
      i += 1
    }
    var inter = 0L
    i = 0
    while (i < probe.numElements()) {
      if (!probe.isNullAt(i) && set.remove(probe.getUTF8String(i))) inter += 1
      i += 1
    }
    finish(inter, na, nb)
  }

  /** Column form for direct library use (no registration needed). */
  def column(a: Column, b: Column): Column =
    GraftShim.column(JaccardSim(GraftShim.expression(a), GraftShim.expression(b)))
}
