package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Native Bloom-filter membership probe over a LONG key — the codegen form
  * of [[graft.functions.Bloom.mightContainDecl]]'s k stacked column tests.
  *
  * The probe runs once per EXPLODED SHINGLE of the corpus side in
  * text_decontam_bloom / the streaming decontamination gate — the hottest
  * per-row predicate the curation path has. The declarative form is k
  * (element_at ∘ div ∘ shiftleft ∘ pmod ∘ xxhash64) expression trees; this
  * is one generated call computing both xxhash64 values once and
  * short-circuiting on the first cleared bit. Hash discipline is identical
  * (Kirsch–Mitzenmauer double hashing over Spark's XXH64 with the
  * xxhash64() column function's seeding), so results are bit-identical —
  * spec-asserted (PolyHashSpec pattern).
  *
  * The bitset rides in the expression as a plain `long[]` reference
  * object, NOT a child literal: codegen references one array, and the
  * plan tree doesn't stringify megabytes of constants.
  */
case class BloomContains(child: Expression, words: Array[Long], mBits: Int, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  // NEVER null — parity with the declarative form: Spark hash expressions
  // SKIP null inputs (xxhash64(NULL) is the bare seed), so a null key has
  // well-defined positions and build() inserts them; returning NULL here
  // would false-negative a key the witness says was inserted.
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_contains expects a BIGINT key, got ${child.dataType.catalogString}")

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val g = child.eval(input)
    if (g == null) BloomContains.containsNullKey(words, mBits, k)
    else BloomContains.contains(g.asInstanceOf[Long], words, mBits, k)
  }

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val ref = ctx.addReferenceObj("bloomWords", words, "long[]")
    val childGen = child.genCode(ctx)
    val nullCall = s"graft.plans.BloomContains.containsNullKey($ref, $mBits, $k)"
    val valCall = s"graft.plans.BloomContains.contains(${childGen.value}, $ref, $mBits, $k)"
    ev.copy(
      code = code"""
        ${childGen.code}
        boolean ${ev.value} = ${childGen.isNull} ? $nullCall : $valCall;
        """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): BloomContains =
    copy(child = newChild)
}

object BloomContains {
  private def pmod(a: Long, m: Long): Long = { val r = a % m; if (r < 0) r + m else r }

  /** Shared by interpreted eval and generated code. Seeding replicates the
    * xxhash64() column function exactly: seed 42, and multi-argument calls
    * chain the running hash as the next seed — so
    * `xxhash64(g, lit(1L)) == hashLong(1L, hashLong(g, 42))`. */
  def contains(g: Long, words: Array[Long], mBits: Int, k: Int): Boolean =
    probe(XXH64.hashLong(g, 42L), words, mBits, k)

  /** NULL-key probe — Spark hash expressions SKIP null children, so
    * `xxhash64(NULL)` is the bare seed 42 and `xxhash64(NULL, 1L)` is
    * `hashLong(1L, 42)`. Keeps the native form bit-identical to the
    * declarative witness on null input too. */
  def containsNullKey(words: Array[Long], mBits: Int, k: Int): Boolean =
    probe(42L, words, mBits, k)

  private def probe(h1raw: Long, words: Array[Long], mBits: Int, k: Int): Boolean = {
    val m = mBits.toLong
    val h1 = pmod(h1raw, m)
    val h2 = pmod(XXH64.hashLong(1L, h1raw), m) * 2L + 1L
    var i = 0
    while (i < k) {
      val p = pmod(h1 + i * h2, m)
      if ((words((p >>> 6).toInt) & (1L << (p & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def column(g: Column, words: Array[Long], mBits: Int, k: Int): Column =
    GraftShim.column(BloomContains(GraftShim.expression(g), words, mBits, k))
}
