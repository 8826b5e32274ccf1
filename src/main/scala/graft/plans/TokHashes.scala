package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression fusing tokenize → (distinct) → polyhash:
  * the first stage of every text dedup/similarity operator.
  *
  * Declaratively this is `transform(array_distinct(split(text, " ")),
  * t -> graft_hash(t))` (or without the distinct for the order-sensitive
  * shingle path) — three expression layers that materialize a string
  * array, a deduplicated string array, and only then the hash array, and
  * that get INLINED into every operator position that references the
  * token column after projection collapse (both sides of a verify join,
  * the signature computation, ...). This expression does one pass over
  * the string per position.
  *
  * Exact-parity notes (spec-asserted against the declarative form):
  *   - split on the literal single space, limit -1: consecutive spaces
  *     yield empty tokens, leading/trailing spaces yield empty tokens at
  *     the ends — all hashed (PolyHash("") = 0);
  *   - `distinct` dedups by token STRING (first occurrence kept, order
  *     preserved), NOT by hash — two different tokens that collide mod
  *     HashP must keep both occurrences, exactly like
  *     `array_distinct(split(...))` followed by hashing;
  *   - hashing is per Unicode CODE POINT, identical to [[PolyHash.hash]]
  *     and to the DuckDB `string_split(t,'') → ascii(c)` mirror (r11:
  *     was per UTF-16 unit, which diverged from the oracle fragment on
  *     supplementary-plane characters). Splitting on ' ' by charAt is
  *     still safe: U+0020 can never be a surrogate half.
  */
case class TokHashes(child: Expression, distinct: Boolean) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_tok_hashes expects STRING, got ${child.dataType.catalogString}")

  protected override def nullSafeEval(input: Any): Any =
    TokHashes.hashes(input.asInstanceOf[UTF8String].toString, distinct)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.TokHashes.hashes($s.toString(), $distinct);")

  override protected def withNewChildInternal(newChild: Expression): TokHashes =
    copy(child = newChild)
}

object TokHashes {
  val P: Long = PolyHash.Mod

  /** Shared by interpreted eval and generated code. */
  def hashes(s: String, distinct: Boolean): ArrayData = {
    val out = new java.util.ArrayList[Any]()
    val seen = if (distinct) new java.util.HashSet[String]() else null
    var start = 0
    var i = 0
    val n = s.length
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (seen == null || seen.add(s.substring(start, i))) {
          var h = 0L
          var j = start
          while (j < i) {
            val cp = s.codePointAt(j)
            h = (h * 31L + cp) % P
            j += Character.charCount(cp)
          }
          out.add(h)
        }
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  def column(c: Column, distinct: Boolean): Column =
    GraftShim.column(TokHashes(GraftShim.expression(c), distinct))
}
