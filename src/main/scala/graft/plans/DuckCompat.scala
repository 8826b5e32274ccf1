package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.{ArrayType, IntegerType}

/** DuckDB-dialect compatibility functions for `spark.sql`.
  *
  * The engine's oracle texts are written once and run by BOTH engines:
  * DuckDB grades them (the driver's correctness gate) and Spark runs
  * them verbatim through `spark.sql` (SqlSurfaceSpec) to prove the SQL
  * face of the library. DuckDB spells several portable operations with
  * its own names (`list_transform`, `string_split`, `len`, ...); each
  * alias below maps one of those names onto the equivalent Spark
  * builtin(s) so the SAME text parses and evaluates identically in both
  * engines. With one exception (`regexp_replace`, below) only names
  * ABSENT from Spark's registry are aliased, and every mapping is
  * semantics-exact for the value domains the oracle texts use
  * (documented per alias).
  *
  * Deliberately NOT aliased (dialect features with no verbatim-safe
  * Spark twin): the `//` integer-division operator and `:=` struct_pack
  * syntax (parser-level — oracle texts spell them `divide()` and a
  * row_number window instead), 1-based `list[i]` indexing (Spark
  * brackets are 0-based — silently off by one, the worst failure mode;
  * texts use `list_extract`/`list_slice`), and the table-valued
  * `generate_series` (texts use `unnest(generate_series(...))`, the
  * scalar form).
  *
  * One builtin IS shadowed, strictly additively: `regexp_replace` gains
  * DuckDB's `'g'` flag as a 4th argument (below). */
object DuckCompat {
  private type FnDef = (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def fn(name: String, build: Seq[Expression] => Expression): FnDef =
    (FunctionIdentifier(name), new ExpressionInfo(DuckCompat.getClass.getName, name), build)

  private def call(name: String, args: Expression*): Expression =
    UnresolvedFunction(name, args, isDistinct = false)

  /** DuckDB `len` works on lists and strings alike; Spark splits that
    * into `size` and `length`. Dispatch on the resolved child type. */
  case class DuckLen(child: Expression) extends UnaryExpression with RuntimeReplaceable {
    override lazy val replacement: Expression = child.dataType match {
      case _: ArrayType => Size(child, legacySizeOfNull = false)
      case _ => Length(child)
    }
    override protected def withNewChildInternal(newChild: Expression): DuckLen =
      copy(child = newChild)
  }

  private def lambda(f: Expression): LambdaFunction = f match {
    case lf: LambdaFunction => lf
    case other => throw new IllegalArgumentException(
      s"expected a lambda argument, got ${other.sql}")
  }

  val all: Seq[FnDef] = Seq(
    // --- list functions: same lambda syntax, different names ---------
    // Lambda-taking aliases must return HigherOrderFunction nodes
    // DIRECTLY: the analyzer rejects a LambdaFunction argument handed to
    // anything else (NON_HIGHER_ORDER_FUNCTION), so delegating through a
    // nested UnresolvedFunction("transform", ...) never gets to resolve.
    fn("list_transform", { case Seq(l, f) => ArrayTransform(l, lambda(f)) }),
    fn("list_filter", { case Seq(l, f) => ArrayFilter(l, lambda(f)) }),
    // list_reduce(l, f): fold with l[0] as the initial accumulator.
    // Spark's aggregate() wants an explicit init: feed it element 1 and
    // the rest of the list. Empty-list behavior differs (DuckDB errors),
    // but every oracle use prepends its init so the list is non-empty.
    fn("list_reduce", { case Seq(l, f) =>
      ArrayAggregate(
        call("slice", l, Literal(2), call("greatest",
          Subtract(call("size", l), Literal(1)), Literal(0))),
        call("element_at", l, Literal(1)), lambda(f), LambdaFunction.identity)
    }),
    fn("list_prepend", { case Seq(x, l) =>
      call("concat", call("array", x), l) }),
    // Ordering caveat: DuckDB list_distinct is unordered, Spark's
    // array_distinct keeps first-occurrence order — the oracle texts only
    // use distinct lists in order-insensitive folds (min/sum/size), the
    // library-wide rule, so the value difference is unobservable.
    fn("list_distinct", a => call("array_distinct", a: _*)),
    // Spark's reverse() covers both strings and arrays; DuckDB needs the
    // list_ name for the array form.
    fn("list_reverse", a => call("reverse", a: _*)),
    fn("list_min", a => call("array_min", a: _*)),
    fn("list_contains", a => call("array_contains", a: _*)),
    fn("list_intersect", a => call("array_intersect", a: _*)),
    fn("list_concat", a => call("concat", a: _*)),
    fn("list_sort", a => call("array_sort", a: _*)),
    // 1-based, exactly like Spark's element_at — the portable spelling
    // of DuckDB's `l[i]` brackets (Spark brackets are 0-based).
    fn("list_extract", a => call("element_at", a: _*)),
    // list_slice(l, b, e): 1-based INCLUSIVE [b, e] -> slice(l, b, len).
    fn("list_slice", { case Seq(l, b, e) =>
      call("slice", l, b, Add(Subtract(e, b), Literal(1))) }),
    // list_zip names its struct fields list_1/list_2 and the oracle dot
    // products access them by name — build the same fields via zip_with.
    fn("list_zip", { case Seq(x, y) =>
      val vx = UnresolvedNamedLambdaVariable(Seq("duck_zx"))
      val vy = UnresolvedNamedLambdaVariable(Seq("duck_zy"))
      ZipWith(x, y, LambdaFunction(
        CreateNamedStruct(Seq(Literal("list_1"), vx, Literal("list_2"), vy)),
        Seq(vx, vy)))
    }),

    // --- string functions --------------------------------------------
    // string_split's separator is a LITERAL, Spark split's is a regex —
    // equivalent for the separators the oracle texts use (' ' is
    // regex-safe; '' yields the character list WITHOUT a trailing empty
    // in BOTH engines: Spark's UTF8String.split special-cases the empty
    // pattern exactly like DuckDB, which PropertySpec's strHashDecl
    // parity witness depends on).
    fn("string_split", a => call("split", a: _*)),
    fn("string_split_regex", a => call("split", a: _*)),
    fn("len", { case Seq(c) => DuckLen(c) }),
    fn("sha256", { case Seq(x) => call("sha2", x, Literal(256)) }),

    // --- generators / sequences --------------------------------------
    // range(a, b[, step]) is HALF-OPEN and empty when b <= a; sequence's
    // (a, b-1) would run DESCENDING in that case, so clamp via slice
    // length. The 3-arg form (positive step only, matching every oracle
    // use) has ceil((b-a)/step) elements.
    fn("range", {
      case Seq(a, b) =>
        call("slice",
          call("sequence", a, call("greatest", Subtract(b, Literal(1)), a)),
          Literal(1), call("greatest", Subtract(b, a), Literal(0)))
      case Seq(a, b, st) =>
        call("slice",
          call("sequence", a, call("greatest", Subtract(b, Literal(1)), a), st),
          Literal(1),
          call("greatest",
            Cast(IntegralDivide(
              Add(Subtract(b, a), Subtract(st, Literal(1))), st), IntegerType),
            Literal(0)))
    }),
    fn("unnest", { case Seq(l) => Explode(l) }),

    // --- scalar odds and ends ----------------------------------------
    // divide(a, b) is DuckDB's FUNCTION form of the `//` operator
    // (integer division on integer args) — `//` itself is parser-level
    // and unportable, so oracle texts spell it divide() and Spark maps
    // it to `div` (IntegralDivide). Both are exact 64-bit integer ops —
    // no float detour. Caveat: on NEGATIVE operands DuckDB floors while
    // Spark div truncates toward zero; every oracle use is
    // non-negative, where the two agree.
    fn("divide", a => call("div", a: _*)),
    // list_value('a','b') is the function form of DuckDB's ['a','b']
    // literal (which Spark cannot parse).
    fn("list_value", a => CreateArray(a)),
    fn("array_to_string", a => call("array_join", a: _*)),
    // quantile_cont = Spark's exact `percentile`: both linearly
    // interpolate between adjacent order statistics.
    fn("quantile_cont", a => call("percentile", a: _*)),
    // scalar generate_series(a, b[, step]): INCLUSIVE upper bound in
    // DuckDB, exactly Spark's sequence(). (DuckDB's table-valued form
    // can't be aliased here — oracle texts use unnest(generate_series).)
    fn("generate_series", a => call("sequence", a: _*)),
    // regexp_replace: the one SHADOWED builtin. DuckDB's 4th arg is an
    // options string ('g' = global); Spark's is a start POSITION. A
    // literal 'g' would only ever cast-error in stock Spark, so mapping
    // it to plain global replacement adds behavior without changing any
    // working call: 3-arg and integer-position forms rebuild the
    // builtin node unchanged. (Engines still differ on the 3-arg form —
    // DuckDB replaces the FIRST match only — so oracle texts always
    // pass 'g'; the library's own builders use the Column API.)
    fn("regexp_replace", {
      case Seq(a, b, c, Literal(g: org.apache.spark.unsafe.types.UTF8String, _))
          if g.toString == "g" => RegExpReplace(a, b, c)
      case Seq(a, b, c) => RegExpReplace(a, b, c)
      case Seq(a, b, c, pos) => RegExpReplace(a, b, c, pos)
    }),
    // json_extract_string(j, '$.path') is the function form of DuckDB's
    // ->> operator; Spark's get_json_object takes the same $-rooted
    // path and likewise returns NULL for a missing key. (Engines differ
    // on MALFORMED json — DuckDB raises, Spark yields NULL — so texts
    // guard casts with json_valid when the input can be malformed.)
    fn("json_extract_string", a => call("get_json_object", a: _*)),
    // json_valid(x) ≈ "the root path extracts": NULL-safe parse probe.
    // Spark has no direct twin; get_json_object(x, '$') is NULL exactly
    // when x fails to parse (and for a NULL input, where DuckDB's
    // json_valid(NULL) is NULL — both falsy under CASE WHEN).
    fn("json_valid", { case Seq(x) =>
      IsNotNull(call("get_json_object", x, Literal("$"))) }),
    fn("xor", { case Seq(a, b) => BitwiseXor(a, b) }),
    // starts_with: DuckDB's literal-prefix test; Spark spells it
    // startswith. Oracle texts use it where LIKE 'pfx%' would be wrong
    // because the prefix itself contains LIKE metachars ('_' is a
    // single-char wildcard — the 'utm_' tracking-param trap).
    fn("starts_with", a => call("startswith", a: _*)),
    // epoch(ts): DOUBLE seconds (fraction kept) — micros over 1e6.
    fn("epoch", { case Seq(t) =>
      Divide(call("unix_micros", t), Literal(1000000.0)) }),
    fn("epoch_us", a => call("unix_micros", a: _*)),
    // isodow: Mon=1..Sun=7; Spark dayofweek: Sun=1..Sat=7.
    fn("isodow", { case Seq(d) =>
      Add(call("pmod", Add(call("dayofweek", d), Literal(5)), Literal(7)), Literal(1)) })
  )
}
