package graft

import java.nio.file.Files
import java.time.{LocalDateTime, ZoneOffset}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** The driver regenerates /root/testdata between rounds and has already
  * shipped `events.ts` in two different physical layouts (parquet
  * TIMESTAMP(NANOS) read as long under nanosAsLong, then plain
  * TIMESTAMP(MICROS) without tz → TIMESTAMP_NTZ). Round 6 lost 21
  * previously-green queries to that drift. This spec pins the loader's
  * schema-adaptive contract so the NEXT regeneration cannot produce a red
  * round: every layout must load, carry the same instants, and agree on
  * `date_trunc` — including under a non-UTC session timezone, where a naive
  * NTZ cast would silently shift every event by the zone offset.
  */
class TablesSchemaDriftSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic instants (µs since epoch), including one 23:30 UTC so
    * UTC and Berlin disagree on the day — a shifted NTZ cast cannot hide.
    */
  private val micros: Seq[Long] = Seq(
    LocalDateTime.of(2026, 1, 15, 8, 0, 0).toEpochSecond(ZoneOffset.UTC) * 1000000L + 123456L,
    LocalDateTime.of(2026, 1, 15, 23, 30, 0).toEpochSecond(ZoneOffset.UTC) * 1000000L,
    LocalDateTime.of(2026, 6, 1, 0, 0, 1).toEpochSecond(ZoneOffset.UTC) * 1000000L + 999999L,
    0L)

  private def tmpDir(): String =
    Files.createTempDirectory("graft_drift_").toFile.getAbsolutePath

  /** Layout A: INT64 nanoseconds (what the NANOS layout becomes under
    * spark.sql.legacy.parquet.nanosAsLong=true).
    */
  private lazy val nsDir: String = {
    val d = tmpDir()
    micros.zipWithIndex.map { case (us, i) => (i.toLong, us * 1000L) }
      .toDF("event_id", "ts").coalesce(1).write.parquet(s"$d/events.parquet")
    d
  }

  /** Layout B: TIMESTAMP(MICROS) isAdjustedToUTC=false → TIMESTAMP_NTZ,
    * wall-clock written as UTC (the generator's contract).
    */
  private lazy val ntzDir: String = {
    val d = tmpDir()
    micros.zipWithIndex.map { case (us, i) =>
      (i.toLong, LocalDateTime.ofEpochSecond(us / 1000000L, (us % 1000000L).toInt * 1000, ZoneOffset.UTC))
    }.toDF("event_id", "ts").coalesce(1).write.parquet(s"$d/events.parquet")
    d
  }

  /** Layout C: TIMESTAMP(MICROS) isAdjustedToUTC=true → session-zone
    * TIMESTAMP (Spark's own default write of TimestampType).
    */
  private lazy val ltzDir: String = {
    val d = tmpDir()
    micros.zipWithIndex.map { case (us, i) => (i.toLong, us) }
      .toDF("event_id", "us")
      .select($"event_id", timestamp_micros($"us").as("ts"))
      .coalesce(1).write.parquet(s"$d/events.parquet")
    d
  }

  private def observed(dir: String): Seq[(Long, Long, String)] = {
    val df: DataFrame = Tables(spark, dir, "events")
    assert(df.schema("ts").dataType == TimestampType,
      s"loader must normalize to TIMESTAMP, got ${df.schema("ts").dataType} for $dir")
    df.select($"event_id", unix_micros($"ts"),
        date_format(date_trunc("day", $"ts"), "yyyy-MM-dd HH:mm:ss"))
      .as[(Long, Long, String)].collect().toSeq.sortBy(_._1)
  }

  private def withSessionTz[A](tz: String)(body: => A): A = {
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", tz)
    try body finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("all three physical layouts load and carry identical instants (UTC session)") {
    val Seq(a, b, c) = Seq(nsDir, ntzDir, ltzDir).map(observed)
    assert(a == b, "ns-as-long vs µs-NTZ disagree under UTC")
    assert(a == c, "ns-as-long vs µs-LTZ disagree under UTC")
    assert(a.map(r => (r._1, r._2)) == micros.zipWithIndex.map { case (us, i) => (i.toLong, us) },
      "instants drifted from the written values")
  }

  test("layouts agree under a non-UTC session timezone (NTZ cast must not shift instants)") {
    val utcInstants = observed(ntzDir).map(r => (r._1, r._2))
    withSessionTz("Europe/Berlin") {
      val Seq(a, b, c) = Seq(nsDir, ntzDir, ltzDir).map(observed)
      assert(a == b, "ns-as-long vs µs-NTZ disagree under Europe/Berlin")
      assert(a == c, "ns-as-long vs µs-LTZ disagree under Europe/Berlin")
      assert(b.map(r => (r._1, r._2)) == utcInstants,
        "NTZ instants changed with the session timezone — naive cast regression")
      // Sanity: the 23:30Z row really does land on the NEXT local day in
      // Berlin — proving the date_trunc comparison is zone-sensitive and a
      // wall-clock-preserving (instant-shifting) bug could not pass above.
      assert(b.find(_._1 == 1L).get._3.startsWith("2026-01-16"))
    }
  }

  test("q14/q21-style derivations match across layouts at the value level") {
    // The 21 queries lost in round 6 all route through date_trunc /
    // unix_timestamp on events.ts; assert the exact derivation shapes used
    // there agree across layouts.
    def derive(dir: String) =
      Tables(spark, dir, "events")
        .select($"event_id",
          date_trunc("month", $"ts").cast("date").as("m"),
          unix_timestamp($"ts").as("sec"),
          hour($"ts").as("h"))
        .as[(Long, java.sql.Date, Long, Int)].collect().toSeq.sortBy(_._1)
    val Seq(a, b, c) = Seq(nsDir, ntzDir, ltzDir).map(derive)
    assert(a == b && a == c)
  }

  test("every table loads at every sf with its contract columns (regeneration canary)") {
    // The round-6 red round came from a driver-side testdata regeneration;
    // this canary makes ANY table/column-level drift a single obvious
    // failure instead of 20 cryptic query errors. Columns listed are the
    // ones the query surface actually references.
    val contract: Map[String, Seq[String]] = Map(
      "region" -> Seq("r_regionkey", "r_name"),
      "nation" -> Seq("n_nationkey", "n_name", "n_regionkey"),
      "customer" -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
      "supplier" -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
      "part" -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
      "orders" -> Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate"),
      "events" -> Seq("event_id", "ts", "user_id", "event_type", "value", "props"),
      "documents" -> Seq("doc_id", "text", "lang", "source", "n_chars"),
      "embeddings" -> Seq("vec_id", "embedding", "label"))
    for (sf <- Seq(Sf0001, Sf001, "/root/testdata/sf0.1"); (t, cols) <- contract) {
      val df = Tables(spark, sf, t)
      val missing = cols.filterNot(df.columns.contains)
      assert(missing.isEmpty, s"$sf/$t missing columns: $missing")
      assert(df.limit(1).count() == 1, s"$sf/$t is empty")
    }
    // events.ts must arrive watermark-able regardless of physical layout
    for (sf <- Seq(Sf0001, Sf001))
      assert(Tables(spark, sf, "events").schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampType)
  }
}
