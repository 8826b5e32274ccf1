package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * One parquet file per table under `\$dir/\$name.parquet`. We always go
  * through `spark.read.parquet` (no schema inference cost, columnar scan,
  * predicate pushdown + column pruning land in the scan node for free).
  *
  * `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
  * reader rejects; we read it as a long (nanosAsLong) and truncate to
  * micros with INTEGER division (`div`) — a double division would lose
  * precision at ~1.7e18 ns. DuckDB truncates ns→us identically on cast.
  * `spark.sql.legacy.parquet.nanosAsLong=true` must be set ON THE SESSION
  * (every graft session builder does: Bench/Verify/Smoke/SparkSpec) — the
  * loader itself is side-effect free and never mutates session config.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events" &&
        spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").forall(_ != "true"))
      // Fail fast with guidance: without the flag the read dies later in
      // Parquet footer conversion with an inscrutable "Illegal Parquet
      // type: INT64 (TIMESTAMP(NANOS,false))". External sessions calling
      // into SparkEntry must opt in — the loader stays side-effect free.
      throw new IllegalStateException(
        "events.parquet carries TIMESTAMP(NANOS); build the SparkSession with " +
          ".config(\"spark.sql.legacy.parquet.nanosAsLong\", \"true\") " +
          "(all graft session builders do)")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Register every table as a temp view (used by tests / SQL surface). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
