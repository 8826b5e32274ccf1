package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the T18 LLM-output JSON repair
  * (reference topic_generation.go:174-198): strip markdown ``` / ```json
  * fences, normalize curly quotes to straight quotes, and trim to the
  * first `\{.*\}` regex match (greedy, `.` excluding line terminators) —
  * all in ONE character pass plus one segment scan.
  *
  * The declarative chain this replaces
  * (regexp_replace → translate → regexp_extract,
  * [[graft.functions.Functions.jsonRepairDeclarative]]) re-scans every
  * string once per stage and pays regex-engine dispatch per row — it was
  * the 8th slowest bench entry (1.75 s judge at sf0.1) for what is a
  * linear scan. Values are IDENTICAL to the declarative form (including
  * Java's line-terminator set for the backtick-dot exclusion: n, r,
  * U+0085, U+2028, U+2029) and to the DuckDB oracle fragment
  * ([[graft.functions.Functions.jsonRepairSql]]) on \n-terminated or
  * terminator-free text; FunctionsSpec pins the parity corpus- and
  * planted-case-wide.
  */
case class JsonRepair(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_json_repair expects STRING, got ${child.dataType.catalogString}")
  }

  protected override def nullSafeEval(input: Any): Any =
    JsonRepair.repair(input.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.JsonRepair.repair($c);")

  override protected def withNewChildInternal(newChild: Expression): JsonRepair =
    copy(child = newChild)
}

object JsonRepair {

  private val Empty = UTF8String.fromBytes(Array.emptyByteArray)

  /** Shared by interpreted eval and generated code (static forwarder —
    * the SimHash60.fingerprint pattern).
    *
    * Works directly on the UTF-8 BYTES — no String decode, no
    * StringBuilder, no re-encode. Safe because every character the repair
    * inspects has a unique byte signature in valid UTF-8: the ASCII
    * punctuation (backtick, braces, \n, \r, "json") cannot appear inside
    * a multi-byte sequence (continuation bytes are >= 0x80), the curly
    * quotes are exactly E2 80 9C/9D/98/99, and the non-ASCII Java line
    * terminators are C2 85 (NEL) and E2 80 A8/A9 (LS/PS). Equivalence
    * with the char-level declarative chain holds for valid UTF-8 input —
    * the only kind Spark strings carry. */
  def repair(u: UTF8String): UTF8String = {
    val b = u.getBytes
    val n = b.length
    // Pass 1: drop ``` / ```json fences, map curly → straight quotes.
    // regexp_replace("```(json)?") consumes "```" then greedily the
    // optional "json", and resumes AFTER the consumed text — mirrored by
    // the i += 3 / i += 4 skips.
    val out = new Array[Byte](n)
    var o = 0
    var i = 0
    while (i < n) {
      val c = b(i)
      if (c == 0x60 && i + 2 < n && b(i + 1) == 0x60 && b(i + 2) == 0x60) {
        i += 3 // ```
        if (i + 4 <= n && b(i) == 'j' && b(i + 1) == 's' && b(i + 2) == 'o' && b(i + 3) == 'n')
          i += 4
      } else if (c == 0xE2.toByte && i + 2 < n && b(i + 1) == 0x80.toByte &&
          (b(i + 2) == 0x9C.toByte || b(i + 2) == 0x9D.toByte)) {
        out(o) = '"'; o += 1; i += 3 // “ ”
      } else if (c == 0xE2.toByte && i + 2 < n && b(i + 1) == 0x80.toByte &&
          (b(i + 2) == 0x98.toByte || b(i + 2) == 0x99.toByte)) {
        out(o) = '\''; o += 1; i += 3 // ‘ ’
      } else {
        out(o) = c; o += 1; i += 1
      }
    }
    // Pass 2: first match of `\{.*\}`. A match cannot cross a Java line
    // terminator (\n \r NEL LS PS — what `.` excludes), so scan
    // terminator-delimited segments in order; within a segment the regex
    // engine picks the earliest '{' that still has a '}' after it, and
    // greedy `.*` backtracks to the LAST '}' — i.e. the first segment
    // whose first '{' precedes its last '}' wins, matching from that '{'
    // to that '}'. No match → "" (regexp_extract contract).
    var segStart = 0
    var j = 0
    while (j <= o) {
      var termLen = 0
      if (j == o) termLen = 1 // virtual end-of-input terminator
      else {
        val c = out(j)
        if (c == '\n' || c == '\r') termLen = 1
        else if (c == 0xC2.toByte && j + 1 < o && out(j + 1) == 0x85.toByte) termLen = 2
        else if (c == 0xE2.toByte && j + 2 < o && out(j + 1) == 0x80.toByte &&
            (out(j + 2) == 0xA8.toByte || out(j + 2) == 0xA9.toByte)) termLen = 3
      }
      if (termLen > 0) {
        var first = -1
        var last = -1
        var k = segStart
        while (k < j) {
          val ck = out(k)
          if (ck == '{') {
            if (first < 0) first = k
          } else if (ck == '}') last = k
          k += 1
        }
        if (first >= 0 && first < last) {
          val res = new Array[Byte](last + 1 - first)
          System.arraycopy(out, first, res, 0, res.length)
          return UTF8String.fromBytes(res)
        }
        segStart = j + termLen
        j += termLen
      } else j += 1
    }
    Empty
  }

  /** Column form for direct library use (no registration needed). */
  def column(c: Column): Column = GraftShim.column(JsonRepair(GraftShim.expression(c)))
}
