package graft

import org.apache.spark.sql.DataFrame

/** The SQL face of the engine: for queries whose oracle text is
  * engine-neutral ANSI (no DuckDB-only list functions or integer-div
  * operator), the very same SQL string must run through `spark.sql` over
  * the registered table views and produce the DataFrame builder's rows
  * exactly. Proves a reference user can keep their SQL while switching
  * engines (SURVEY §0) — and that the oracle texts describe the queries,
  * not a DuckDB-only paraphrase.
  */
class SqlSurfaceSpec extends SparkSpec {

  // ANSI-compatible subset (hand-picked: no //, list_*, epoch_us, VALUES
  // row constructors, or lateral aliases).
  private val ansiQueries = Seq(
    "q02_filter", "q04_join_inner", "q06_join_left_outer", "q08_join_semi",
    "q10_agg_hash", "q11_distinct_count", "q16_window_rank", "q18_topk",
    "q26_conditional")

  test("ANSI oracle SQL runs unchanged through spark.sql and matches the DataFrame builder") {
    Tables.registerAll(spark, Sf0001)
    val failures = ansiQueries.flatMap { name =>
      val sqlText = SparkEntry.oracleSql(name)
      val viaSql: DataFrame = spark.sql(sqlText)
      val viaDf: DataFrame = SparkEntry.queries(name)(spark, Sf0001)
      val cols = viaDf.columns.sorted.toIndexedSeq
      val a = viaSql.select(cols.map(org.apache.spark.sql.functions.col): _*).collect().toSeq
      val b = viaDf.select(cols.map(org.apache.spark.sql.functions.col): _*).collect().toSeq
      if (a == b) None else Some(s"$name: ${a.size} vs ${b.size} rows or value mismatch")
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }
}
