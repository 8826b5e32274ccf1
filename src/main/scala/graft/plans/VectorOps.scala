package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expressions for the vector-similarity hot path.
  *
  * The declarative forms ([[graft.operators.Similarity.dotDDecl]] etc.)
  * are `aggregate`/`zip_with`/`transform` higher-order functions — all
  * CodegenFallback in Spark, i.e. interpreted closures allocating a
  * lambda frame per element, running once per CANDIDATE PAIR in the ANN /
  * embedding-dedup queries. These expressions are the same IEEE operation
  * sequence as the declarative folds (left-to-right accumulation from
  * 0.0), so results are bit-identical — spec-asserted in PolyHashSpec —
  * but run as one tight generated-code loop.
  *
  * Null/shape semantics replicate the HOF forms exactly:
  *  - [[DotProd]]: length mismatch or any null element → NULL (zip_with
  *    pads the shorter side with null; `acc + null` poisons the fold).
  *  - [[SumSq]]: any null element → NULL.
  *  - [[LshBucket64]]: any null element or length ≠ 64 → every plane's
  *    dot is null → `when(null > 0)` contributes 0 → bucket 0.
  */
object VectorOps {
  private[plans] def isFloatElem(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private[plans] def checkVec(name: String, dts: DataType*): TypeCheckResult =
    if (dts.forall {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name expects ARRAY<FLOAT> or ARRAY<DOUBLE> inputs, got ${dts.map(_.catalogString).mkString(", ")}")
}

/** Sequential-fold dot product — bit-identical to
  * `aggregate(zip_with(a, b, (x, y) => x.cast(double) * y.cast(double)), 0.0, _ + _)`. */
case class DotProd(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    VectorOps.checkVec("graft_dot", left.dataType, right.dataType)

  private def aF = VectorOps.isFloatElem(left.dataType)
  private def bF = VectorOps.isFloatElem(right.dataType)

  protected override def nullSafeEval(a: Any, b: Any): Any =
    DotProd.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aF, bF)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val res = ctx.freshName("gdRes")
      s"""
      |java.lang.Double $res = graft.plans.DotProd.dot($a, $b, $aF, $bF);
      |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res.doubleValue(); }
      |""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProd =
    copy(left = newLeft, right = newRight)
}

object DotProd {
  /** Shared by interpreted eval and generated code. */
  def dot(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  def column(a: Column, b: Column): Column =
    GraftShim.column(DotProd(GraftShim.expression(a), GraftShim.expression(b)))
}

/** Sequential-fold sum of squares — bit-identical to
  * `aggregate(transform(a, x => x.cast(double) * x.cast(double)), 0.0, _ + _)`.
  * `sqrt(SumSq(a))` is the L2 norm used by every cosine query. */
case class SumSq(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    VectorOps.checkVec("graft_sumsq", child.dataType)

  private def cF = VectorOps.isFloatElem(child.dataType)

  protected override def nullSafeEval(input: Any): Any =
    SumSq.sumSq(input.asInstanceOf[ArrayData], cF)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val res = ctx.freshName("gsRes")
      s"""
      |java.lang.Double $res = graft.plans.SumSq.sumSq($arr, $cF);
      |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res.doubleValue(); }
      |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SumSq =
    copy(child = newChild)
}

object SumSq {
  def sumSq(a: ArrayData, aF: Boolean): java.lang.Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      acc += x * x
      i += 1
    }
    acc
  }

  def column(c: Column): Column = GraftShim.column(SumSq(GraftShim.expression(c)))
}

/** Random-hyperplane LSH bucket id over a 64-dim embedding — bit-identical
  * to the declarative 8-plane fold ([[graft.operators.Similarity.lshBucketDecl]]):
  * per plane j the dot with the integer-derived coefficients is the same
  * left-to-right double fold, `dot > 0` sets bit j.
  *
  * `table` selects one of [[LshBucket64.Tables]] INDEPENDENT hash tables —
  * table t uses planes t*8..t*8+7 of the same integer-derived coefficient
  * stream, so adding a table never changes table 0's buckets. Multiple
  * tables are the standard LSH recall lever: a near-neighbor missed by one
  * table's banding is recovered by another (union of candidates). */
case class LshBucket64(child: Expression, table: Int = 0) extends UnaryExpression {
  require(table >= 0 && table < LshBucket64.Tables,
    s"LSH table index $table out of range [0, ${LshBucket64.Tables})")
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable // null ARRAY → null; degenerate arrays → bucket 0
  override def checkInputDataTypes(): TypeCheckResult =
    VectorOps.checkVec("graft_lsh_bucket", child.dataType)

  private def cF = VectorOps.isFloatElem(child.dataType)

  protected override def nullSafeEval(input: Any): Any =
    LshBucket64.bucket(input.asInstanceOf[ArrayData], cF, table)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.plans.LshBucket64.bucket($arr, $cF, $table);")

  override protected def withNewChildInternal(newChild: Expression): LshBucket64 =
    copy(child = newChild)
}

object LshBucket64 {
  val Planes = 8
  val Dim = 64
  val Tables = 2

  /** Hyperplane coefficients: table t, plane j, dim i at k = (t*8+j)*64+i
    * is (((1103515245*k + 12345) % 2001) - 1000)/1000 — all-integer
    * generation over one continuous stream, identical in the DuckDB
    * oracle fragment ([[graft.operators.Similarity.lshBucketSql]]). */
  val Coeffs: Array[Double] =
    Array.tabulate(Tables * Planes * Dim)(k =>
      (((1103515245L * k + 12345L) % 2001L) - 1000L).toDouble / 1000.0)

  def bucket(v: ArrayData, vF: Boolean, table: Int): Long = {
    if (v.numElements() != Dim) return 0L
    var i = 0
    while (i < Dim) { // a null element nulls every plane's dot → bucket 0
      if (v.isNullAt(i)) return 0L
      i += 1
    }
    val off = table * Planes * Dim
    var b = 0L
    var j = 0
    while (j < Planes) {
      var acc = 0.0
      var k = 0
      while (k < Dim) {
        val x = if (vF) v.getFloat(k).toDouble else v.getDouble(k)
        acc += x * Coeffs(off + j * Dim + k)
        k += 1
      }
      if (acc > 0) b += (1L << j)
      j += 1
    }
    b
  }

  def column(c: Column, table: Int = 0): Column =
    GraftShim.column(LshBucket64(GraftShim.expression(c), table))
}
