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
  * `fold(h, c) = (h*31 + c) mod 1000003` over a string's Unicode CODE
  * POINTS — the hot inner loop of every text-dedup/fingerprint operator.
  *
  * The declarative formulation (`aggregate(split(s, ""), ...)`) allocates
  * a per-character array and evaluates a lambda per element; this
  * expression is a tight codegen'd loop (whole-stage compatible via
  * doGenCode), ~10× less work per row. Values are IDENTICAL to the
  * declarative form and to the DuckDB oracle fragment
  * ([[graft.Qh.strHashSql]]), so it can be swapped into any oracle-checked
  * query.
  *
  * Code points, not UTF-16 units: the DuckDB mirror's
  * `string_split(s,'') → ascii(c)` yields one code point per element, so
  * folding `charAt` units would silently break Spark/oracle parity on any
  * supplementary-plane character (emoji in crawled text) — exactly the
  * divergence the gzip digest fixed in r10 (Multimodal code-point fold).
  * For BMP-only strings the two folds are identical, so this is
  * value-neutral on the ASCII/Latin test corpus; PolyHashSpec pins the
  * non-BMP case against a hand-computed code-point fold.
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
      val cp = ctx.freshName("phCp")
      s"""
         |String $s = $c.toString();
         |long ${ev.value}L0 = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  ${ev.value}L0 = (${ev.value}L0 * 31L + (long) $cp) % ${PolyHash.Mod}L;
         |  $i += java.lang.Character.charCount($cp);
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
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  /** Column form for direct library use (no registration needed). */
  def column(c: Column): Column = GraftShim.column(PolyHash(GraftShim.expression(c)))
}

/** The 58-bit WIDE sibling of [[PolyHash]]: identical code-point fold but
  * mod [[graft.Qh.WinHashP]] (~2^58) — for ROW DIGESTS, where [[PolyHash]]'s
  * ~20-bit modulus collides at anti-entropy scale (q62: a changed row
  * whose old/new digests collide is mis-reported 'unchanged'; at mod 1e6
  * that is ~1e-6 per changed row — near-certain over 100 TB — vs ~3e-18
  * here). The fold stays exact in signed 64-bit in BOTH engines by the
  * [[graft.Qh.WinHashP]] construction: 31·(P−1) + maxCodePoint < 2^63−1.
  * DuckDB mirror: [[graft.Qh.strHashWideSql]]. */
case class PolyHash58(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_hash58 expects STRING, got ${child.dataType.catalogString}")
  }

  protected override def nullSafeEval(input: Any): Any =
    PolyHash58.hash(input.asInstanceOf[UTF8String].toString)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("phwStr")
      val i = ctx.freshName("phwI")
      val cp = ctx.freshName("phwCp")
      s"""
         |String $s = $c.toString();
         |long ${ev.value}L0 = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  ${ev.value}L0 = (${ev.value}L0 * 31L + (long) $cp) % ${PolyHash58.Mod}L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = ${ev.value}L0;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash58 =
    copy(child = newChild)
}

object PolyHash58 {
  val Mod: Long = Qh.WinHashP

  def hash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  /** Column form for direct library use (no registration needed). */
  def column(c: Column): Column = GraftShim.column(PolyHash58(GraftShim.expression(c)))
}

/** SparkSessionExtensions installer: makes `graft_hash` available to SQL
  * (incl. inside SQL lambda expressions) on sessions built with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`, or
  * imperatively via [[GraftExtensions.register]]. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach(ext.injectFunction)
}

object GraftExtensions {
  private type FnDef = (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def fn(name: String, cls: Class[_], build: Seq[Expression] => Expression): FnDef =
    (FunctionIdentifier(name), new ExpressionInfo(cls.getName, name), build)

  val graftHash: FnDef = fn("graft_hash", classOf[PolyHash], c => PolyHash(c.head))
  val graftHash58: FnDef = fn("graft_hash58", classOf[PolyHash58], c => PolyHash58(c.head))
  val graftSimHash: FnDef = fn("graft_simhash", classOf[SimHash60], c => SimHash60(c.head))
  val graftMinHash: FnDef = fn("graft_minhash", classOf[MinHashSig], c => MinHashSig(c.head))
  val graftJaccard: FnDef = fn("graft_jaccard", classOf[JaccardSim], c => JaccardSim(c(0), c(1)))
  val graftDot: FnDef = fn("graft_dot", classOf[DotProd], c => DotProd(c(0), c(1)))
  val graftSumSq: FnDef = fn("graft_sumsq", classOf[SumSq], c => SumSq(c.head))
  val graftLshBucket: FnDef = fn("graft_lsh_bucket", classOf[LshBucket64], c => LshBucket64(c.head))
  // second independent LSH hash table (planes 8..15); SQL function args
  // must be expressions, so each table gets its own name rather than a
  // non-foldable int parameter
  val graftLshBucket2: FnDef = fn("graft_lsh_bucket2", classOf[LshBucket64], c => LshBucket64(c.head, table = 1))
  val graftShingles: FnDef = fn("graft_shingles", classOf[Shingles3], c => Shingles3(c.head, distinct = true))
  val graftJsonRepair: FnDef = fn("graft_json_repair", classOf[JsonRepair], c => JsonRepair(c.head))
  val graftTokenProfile: FnDef = fn("graft_token_profile", classOf[TokenProfile], c => TokenProfile(c.head))
  val graftClfProfile: FnDef = fn("graft_clf_profile", classOf[ClfProfile], c => ClfProfile(c.head))

  val all: Seq[FnDef] = Seq(graftHash, graftHash58, graftSimHash, graftMinHash,
    graftJaccard, graftDot, graftSumSq, graftLshBucket, graftLshBucket2, graftShingles,
    graftJsonRepair, graftTokenProfile, graftClfProfile) ++
    DuckCompat.all // DuckDB-dialect aliases so oracle texts run verbatim in spark.sql

  /** Imperative registration for sessions we did not build (e.g. the
    * driver's t1 session calling SparkEntry.entry). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    all.foreach { case (id, info, build) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, build)
    }
}
