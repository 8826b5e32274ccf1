package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Custom function surface (SURVEY §2.3).
  *
  * - [[WeightedSentiment]]: the one demonstration UDAF — upvote-weighted
  *   mean sentiment (weight source: RedditPost.upvotes,
  *   models/reddit.models.go:11). Internally integer basis points so the
  *   aggregation is order-independent and cross-engine exact.
  * - [[jsonRepair]]: T18 LLM-output JSON repair
  *   (topic_generation.go:174-198): strip ```json fences, trim to the
  *   outermost {...}, normalize curly quotes — as codegen-friendly column
  *   ops, with a DuckDB-equivalent fragment for oracle checks.
  */
object Functions {

  /** Input: (score in [-1,1], weight). Buffer: (sum of score basis points
    * × weight, sum of weights) — all integer, order-independent. Output:
    * weighted mean score as double (one final division). */
  object WeightedSentiment extends Aggregator[(Double, Long), (Long, Long), Double] {
    override def zero: (Long, Long) = (0L, 0L)
    override def reduce(b: (Long, Long), a: (Double, Long)): (Long, Long) =
      (b._1 + math.floor(a._1 * 10000).toLong * a._2, b._2 + a._2)
    override def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(r: (Long, Long)): Double =
      if (r._2 == 0) 0.0 else r._1.toDouble / 10000.0 / r._2
    override def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** The UDAF as a Column aggregate (use inside groupBy().agg()). */
  def weightedSentiment(score: Column, weight: Column): Column =
    udaf(WeightedSentiment, Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
      .apply(score, weight)

  /** SQL computing the identical value (for oracles/cross-checks). */
  def weightedSentimentSql(score: String, weight: String): String =
    s"CASE WHEN SUM($weight) = 0 THEN 0.0 ELSE " +
      s"CAST(SUM(CAST(floor($score * 10000) AS BIGINT) * $weight) AS DOUBLE) / 10000.0 / SUM($weight) END"

  /** T18 JSON repair: 1) strip markdown code fences, 2) normalize curly
    * quotes to straight quotes, 3) trim to the outermost {...} (drops any
    * LLM chatter around the object). Returns NULL-safe empty string when
    * no object is present. Backed by the native single-pass codegen
    * expression [[graft.plans.JsonRepair]] — the three-stage regex chain
    * ([[jsonRepairDeclarative]]) re-scans each string per stage and was
    * the 8th slowest bench entry; values are identical (JsonRepairSpec
    * pins parity on planted edge cases and the events corpus). */
  def jsonRepair(c: Column): Column = graft.plans.JsonRepair.column(c)

  /** The original declarative formulation of [[jsonRepair]] (same values;
    * kept for the native-expression parity test, the strHashDecl
    * pattern). */
  def jsonRepairDeclarative(c: Column): Column = {
    val noFence = regexp_replace(c, "```(json)?", "")
    val straight = translate(noFence, "“”‘’", "\"\"''")
    regexp_extract(straight, "(\\{.*\\})", 1)
  }

  /** DuckDB fragment with identical semantics. The braces are matched
    * via character classes (`[{]`), not backslash escapes: Spark's
    * string literals eat the backslash and Java regex then rejects the
    * bare `{` as an illegal repetition, while `[{]` is valid and
    * identical in both engines' regex dialects. */
  def jsonRepairSql(e: String): String =
    s"regexp_extract(replace(replace(replace(replace(regexp_replace($e, '```(json)?', '', 'g'), " +
      "'“', '\"'), '”', '\"'), '‘', ''''), '’', ''''), '([{].*[}])', 1)"
}
