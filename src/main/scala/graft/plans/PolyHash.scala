package graft.plans

import graft.Qh
import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's polynomial rolling hash
  * `fold(h, c) = (h*31 + c) mod 1000003` over a string's characters — the
  * hot inner loop of every text-dedup/fingerprint operator.
  *
  * The declarative formulation (`aggregate(split(s, ""), ...)`) allocates
  * a per-character array and evaluates a lambda per element; this
  * expression is a tight codegen'd loop (whole-stage compatible via
  * doGenCode), ~10× less work per row. Values are IDENTICAL to the
  * declarative form and to the DuckDB oracle fragment
  * ([[graft.Qh.strHashSql]]), so it can be swapped into any oracle-checked
  * query.
  */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_hash expects STRING, got ${child.dataType.catalogString}")
  }

  protected override def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String].toString)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("phStr")
      val i = ctx.freshName("phI")
      s"""
         |String $s = $c.toString();
         |long ${ev.value}L0 = 0L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  ${ev.value}L0 = (${ev.value}L0 * 31L + (long) $s.charAt($i)) % ${PolyHash.Mod}L;
         |}
         |${ev.value} = ${ev.value}L0;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  val Mod: Long = Qh.HashP

  def hash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      h = (h * 31L + s.charAt(i)) % Mod
      i += 1
    }
    h
  }

  /** Column form for direct library use (no registration needed). */
  def column(c: Column): Column = GraftShim.column(PolyHash(GraftShim.expression(c)))
}

/** SparkSessionExtensions installer: makes `graft_hash` available to SQL
  * (incl. inside SQL lambda expressions) on sessions built with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`, or
  * imperatively via [[GraftExtensions.register]]. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.graftHash)
    ext.injectFunction(GraftExtensions.graftSimHash)
    ext.injectFunction(GraftExtensions.graftMinHash)
  }
}

object GraftExtensions {
  val graftHash: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_hash"),
    new ExpressionInfo(classOf[PolyHash].getName, "graft_hash"),
    (children: Seq[Expression]) => PolyHash(children.head))

  val graftSimHash: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_simhash"),
    new ExpressionInfo(classOf[SimHash60].getName, "graft_simhash"),
    (children: Seq[Expression]) => SimHash60(children.head))

  val graftMinHash: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_minhash"),
    new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash"),
    (children: Seq[Expression]) => MinHashSig(children.head))

  /** Imperative registration for sessions we did not build (e.g. the
    * driver's t1 session calling SparkEntry.entry). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      graftHash._1, graftHash._2, graftHash._3)
    spark.sessionState.functionRegistry.registerFunction(
      graftSimHash._1, graftSimHash._2, graftSimHash._3)
    spark.sessionState.functionRegistry.registerFunction(
      graftMinHash._1, graftMinHash._2, graftMinHash._3)
  }
}
