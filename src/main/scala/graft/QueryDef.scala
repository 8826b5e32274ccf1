package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One engine query: a Spark build function plus (optionally) the
  * equivalent ANSI SQL the driver runs in DuckDB as the correctness
  * oracle. Column names/types must match between the two exactly.
  */
final case class QueryDef(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

/** Shared expression helpers.
  *
  * Numeric-parity discipline (Spark vs DuckDB — see SURVEY.md §7.4 risk 3):
  *  - Money columns in the testdata carry exactly 2 decimals, so we sum in
  *    integer cents / basis points: order-independent, bit-identical across
  *    engines, and the final `CAST(sum AS DOUBLE)/100.0` division is the
  *    same IEEE op on the same integer in both engines.
  *  - Never `round(x, k)` with k < 2: binary doubles cannot tie at >=2
  *    decimals, so HALF_UP (Spark) vs HALF_EVEN differences cannot bite.
  *  - Sort keys are always unique and never NULL (explicit `NULLS FIRST`
  *    where a nullable key is unavoidable).
  */
object Qh {
  /** Modulus for the deterministic polynomial token hash (prime ~1e6). */
  val HashP = 1000003L

  /** Modulus for WINDOW rolling hashes (dedup_substring family): the
    * largest prime P with 31·(P−1) + maxTokenHash < 2^63−1, so the
    * rolling fold `h·31 + x mod P` stays exact in signed 64-bit in BOTH
    * engines — ANSI Spark throws on long overflow and DuckDB BIGINT
    * errors too, so "unreduced 64-bit wraparound" is not portable; a
    * ~2^58 prime is the largest exactly-mirrorable state. Collision
    * precision: for W total windows corpus-wide, expected cross-window
    * collisions ≈ W²/2P — ~1.7e8 on a 10^13-window (100 TB) corpus,
    * i.e. a ~2e-5 false-positive rate, vs ~certainty at the ~20-bit
    * [[HashP]] this replaced. */
  val WinHashP = 297528130221057283L

  /** Gopher-style repetition-quality thresholds, exact integer permille:
    * a document passes when its duplicate-token mass (n_tok - n_distinct)
    * is at most [[GopherDupMilli]]‰ of n_tok AND its most frequent token
    * is at most [[GopherTopMilli]]‰ of n_tok. Declared here (dependency-
    * free object) and interpolated by BOTH text_repetition and
    * corpus_manifest — Spark exprs and oracle texts alike — so the two
    * queries can never drift apart on a threshold change. Kept in Qh, not
    * TextOps/Dedup, because those objects' `defs` reference each other's
    * helpers: a constant living in either would be read mid-init (as 0)
    * by the other, silently corrupting the interpolated oracle SQL. */
  val GopherDupMilli = 500L
  val GopherTopMilli = 100L

  def tbl(s: SparkSession, d: String, n: String): DataFrame = Tables(s, d, n)

  /** Exact integer cents of a 2-decimal money column. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Exact revenue in basis points: cents * (100 - discount%). */
  def revenueBp(price: Column, discount: Column): Column =
    cents(price) * (lit(100L) - cents(discount))

  /** Deterministic polynomial rolling hash of a string, mod HashP —
    * a native codegen'd Expression ([[graft.plans.PolyHash]]).
    * Identical fold in DuckDB:
    * list_reduce(list_prepend(CAST(0 AS BIGINT),
    *   list_transform(string_split(s,''), c -> CAST(ascii(c) AS BIGINT))),
    *   (h, c) -> (h*31 + c) % 1000003)
    */
  def strHash(c: Column): Column = graft.plans.PolyHash.column(c)

  /** The declarative formulation of [[strHash]] (same values; kept for the
    * native-expression parity test). */
  def strHashDecl(c: Column): Column =
    aggregate(split(c, ""), lit(0L), (h, ch) => pmod(h * 31 + ascii(ch), lit(HashP)))

  /** SQL fragment computing the same hash for a token expression `e`. */
  def strHashSql(e: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($e, ''), c -> CAST(ascii(c) AS BIGINT))), " +
      s"(h, c) -> (h*31 + c) % ${HashP})"

  /** Distinct whitespace tokens of `text`. */
  def toks(c: Column): Column = array_distinct(split(c, " "))
}
