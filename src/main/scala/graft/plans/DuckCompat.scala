package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.ArrayType

/** DuckDB-dialect compatibility functions for `spark.sql`.
  *
  * The engine's oracle texts are written once and run by BOTH engines:
  * DuckDB grades them (the driver's correctness gate) and Spark runs
  * them verbatim through `spark.sql` (SqlSurfaceSpec) to prove the SQL
  * face of the library. DuckDB spells several portable operations with
  * its own names (`list_transform`, `string_split`, `len`, ...); each
  * alias below maps one of those names onto the equivalent Spark
  * builtin(s) so the SAME text parses and evaluates identically in both
  * engines. Only names ABSENT from Spark's registry are aliased — no
  * builtin is shadowed — and every mapping is semantics-exact for the
  * value domains the oracle texts use (documented per alias).
  *
  * Deliberately NOT aliased (dialect features with no verbatim-safe
  * Spark twin): the `//` integer-division operator and `:=` struct_pack
  * syntax (parser-level), 1-based `list[i]` indexing (Spark brackets are
  * 0-based — silently off by one, the worst failure mode), DuckDB
  * `regexp_replace(..., 'g')` (Spark is global-by-default with no flag
  * arg), `quantile_cont`, and the `generate_series` table function. */
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
    // range(a, b) is HALF-OPEN and empty when b <= a; sequence(a, b-1)
    // would run DESCENDING in that case, so clamp via slice length.
    fn("range", { case Seq(a, b) =>
      call("slice",
        call("sequence", a, call("greatest", Subtract(b, Literal(1)), a)),
        Literal(1), call("greatest", Subtract(b, a), Literal(0)))
    }),
    fn("unnest", { case Seq(l) => Explode(l) }),

    // --- scalar odds and ends ----------------------------------------
    fn("xor", { case Seq(a, b) => BitwiseXor(a, b) }),
    // epoch(ts): DOUBLE seconds (fraction kept) — micros over 1e6.
    fn("epoch", { case Seq(t) =>
      Divide(call("unix_micros", t), Literal(1000000.0)) }),
    fn("epoch_us", a => call("unix_micros", a: _*)),
    // isodow: Mon=1..Sun=7; Spark dayofweek: Sun=1..Sat=7.
    fn("isodow", { case Seq(d) =>
      Add(call("pmod", Add(call("dayofweek", d), Literal(5)), Literal(7)), Literal(1)) })
  )
}
