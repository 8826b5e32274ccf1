package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * One parquet file per table under `\$dir/\$name.parquet`. We always go
  * through `spark.read.parquet` (no schema inference cost, columnar scan,
  * predicate pushdown + column pruning land in the scan node for free).
  *
  * `events.ts` has shipped in two physical layouts across testdata
  * generations, so the loader is schema-adaptive:
  *
  *   - parquet TIMESTAMP(NANOS): Spark's reader rejects it unless
  *     `spark.sql.legacy.parquet.nanosAsLong=true` is set on the session
  *     (every graft session builder does: Bench/Verify/Smoke/SparkSpec);
  *     we then see a LongType and truncate ns→µs with INTEGER division
  *     (`div` — a double division would lose precision at ~1.7e18 ns).
  *     DuckDB truncates ns→us identically on cast.
  *   - parquet TIMESTAMP(MICROS) without tz: Spark infers TIMESTAMP_NTZ.
  *     The generator writes UTC wall-clock values, so we interpret the NTZ
  *     wall-clock AS UTC and produce a session-zone TIMESTAMP carrying the
  *     same instant. A bare `cast("timestamp")` would interpret the
  *     wall-clock in the SESSION timezone and silently shift every instant
  *     on a non-UTC session; routing through `convert_timezone('UTC',
  *     sessionTz, ·)` first makes the instant session-tz-invariant
  *     (TablesSchemaDriftSpec proves both layouts agree under a non-UTC
  *     zone). On a UTC session the conversion is the identity.
  *
  * The loader itself is side-effect free and never mutates session config.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df =
      try spark.read.parquet(s"$dir/$name.parquet")
      catch {
        // A NANOS file without the legacy flag dies inside Parquet footer
        // conversion (before the schema is inspectable) with an inscrutable
        // "Illegal Parquet type: INT64 (TIMESTAMP(NANOS,false))" — rethrow
        // with actionable guidance. External sessions calling into
        // SparkEntry must opt in; the loader stays side-effect free.
        case e: Exception
            if String.valueOf(e.getMessage).contains("Illegal Parquet type") &&
              String.valueOf(e.getMessage).contains("NANOS") =>
          throw new IllegalStateException(
            s"$name.parquet carries TIMESTAMP(NANOS); build the SparkSession with " +
              ".config(\"spark.sql.legacy.parquet.nanosAsLong\", \"true\") " +
              "(all graft session builders do)", e)
      }
    if (name == "events") df.withColumn("ts", normalizeTs(spark, df, "ts"))
    else df
  }

  /** Normalize a timestamp column that may arrive as ns-as-long (legacy
    * NANOS layout under nanosAsLong), TIMESTAMP_NTZ (µs layout, no tz), or
    * already-correct TIMESTAMP, to session-zone TIMESTAMP with identical
    * instants in all three cases.
    */
  private def normalizeTs(spark: SparkSession, df: DataFrame, colName: String) =
    df.schema(colName).dataType match {
      case LongType =>
        timestamp_micros(expr(s"$colName div 1000"))
      case TimestampNTZType =>
        // NTZ wall-clock is UTC by generator contract. Rewrite the wall
        // clock into the session zone, then cast — the cast's session-tz
        // interpretation then lands on the original UTC instant no matter
        // what the session timezone is. (Sub-risk: DST-ambiguous local
        // times exist only on non-UTC sessions, one hour per year; the
        // driver gate always runs UTC where the path is exact identity.)
        val tz = spark.conf.get("spark.sql.session.timeZone")
        convert_timezone(lit("UTC"), lit(tz), col(colName)).cast(TimestampType)
      case TimestampType => col(colName)
      case other =>
        throw new IllegalStateException(
          s"unsupported physical type for $colName: $other " +
            "(expected INT64 nanos, TIMESTAMP_NTZ, or TIMESTAMP)")
    }

  /** Register every table as a temp view (used by tests / SQL surface). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
