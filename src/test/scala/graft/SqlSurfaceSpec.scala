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

  // ANSI-compatible subset — every oracle text whose functions exist in
  // both engines with identical semantics runs here verbatim. Excluded
  // (DuckDB-only surface, verified by running them): q17 (quoted
  // datediff unit), q31 (quantile_cont), q38 (generate_series TVF), and
  // everything using //, list_*, unnest, VALUES rows, or struct_pack.
  private val ansiQueries = Seq(
    "q01_scan_project", "q02_filter", "q03_length_route",
    "q04_join_inner", "q05_join_broadcast_dim", "q06_join_left_outer",
    "q07_join_anti", "q08_join_semi", "q09_join_multiway",
    "q10_agg_hash", "q11_distinct_count", "q13_rollup", "q14_cube",
    "q16_window_rank", "q18_topk", "q19_setops",
    "q22_math_funcs", "q26_conditional", "q29_pivot", "q30_unpivot",
    "q32_asof_join", "q35_funnel",
    "q41_interval_join", "skew_salted_agg", "skew_salted_join")

  test("ANSI oracle SQL runs unchanged through spark.sql and matches the DataFrame builder") {
    Tables.registerAll(spark, Sf0001)
    val failures = ansiQueries.flatMap { name =>
      try {
        val sqlText = SparkEntry.oracleSql(name)
        val viaSql: DataFrame = spark.sql(sqlText)
        val viaDf: DataFrame = SparkEntry.queries(name)(spark, Sf0001)
        val cols = viaDf.columns.sorted.toIndexedSeq
        val a = viaSql.select(cols.map(org.apache.spark.sql.functions.col): _*).collect().toSeq
        val b = viaDf.select(cols.map(org.apache.spark.sql.functions.col): _*).collect().toSeq
        if (a == b) None else Some(s"$name: ${a.size} vs ${b.size} rows or value mismatch")
      } catch {
        case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} ${e.getMessage.take(120)}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
