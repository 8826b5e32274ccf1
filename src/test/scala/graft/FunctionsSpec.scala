package graft

import graft.functions.Functions
import graft.streaming.Streaming
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** UDAF, json_repair, and the stateful-dedup custom state operator. */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("weighted sentiment UDAF equals the plain-SQL formula") {
    val df = Seq((0.5, 10L), (-0.25, 30L), (1.0, 0L), (0.3333, 7L))
      .toDF("score", "w")
    val viaUdaf = df.agg(Functions.weightedSentiment(col("score"), col("w"))).head().getDouble(0)
    df.createOrReplaceTempView("ws_in")
    val viaSql = spark.sql(
      s"SELECT ${Functions.weightedSentimentSql("score", "w")} FROM ws_in").head().getDouble(0)
    assert(viaUdaf == viaSql)
    // hand value: floor(.5e4)*10 + floor(-.25e4)*30 + floor(1e4)*0 + floor(.3333e4)*7
    val expected = (5000L * 10 + -2500L * 30 + 3333L * 7).toDouble / 10000.0 / 47
    assert(viaUdaf == expected)
  }

  test("weighted sentiment: zero total weight yields 0.0, not NaN") {
    val df = Seq((0.9, 0L)).toDF("score", "w")
    assert(df.agg(Functions.weightedSentiment(col("score"), col("w"))).head().getDouble(0) == 0.0)
  }

  test("json_repair strips fences, chatter and curly quotes (T18)") {
    val dirty = Seq(
      """Sure! ```json {“k“: 42} ``` done""",
      """{"k": 7}""",
      """no json here""").toDF("s")
    val out = dirty.select(Functions.jsonRepair(col("s")).as("r"),
      get_json_object(Functions.jsonRepair(col("s")), "$.k").cast("int").as("k")).collect()
    assert(out(0).getString(0) == """{"k": 42}""" && out(0).getInt(1) == 42)
    assert(out(1).getString(0) == """{"k": 7}""" && out(1).getInt(1) == 7)
    assert(out(2).getString(0) == "")
  }

  test("dedupFirstStateful: keep-first per key across micro-batches, state TTL via watermark") {
    val ms = MemoryStream[Ev](spark)
    val out = Streaming.dedupFirstStateful(ms.toDF(), "event_id", "ts")
    val q = out.writeStream.format("memory").queryName("fmgws_dedup")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 ${m / 60}%02d:${m % 60}%02d:00")
    ms.addData(Ev(1, t(5), 1, "click", 1.0), Ev(2, t(6), 1, "click", 2.0))
    q.processAllAvailable()
    ms.addData(Ev(1, t(7), 1, "click", 9.0)) // duplicate key within TTL
    q.processAllAvailable()
    ms.addData(Ev(3, t(10), 2, "buy", 3.0))
    q.processAllAvailable()
    q.stop()
    val keys = spark.table("fmgws_dedup").select("k").as[String].collect().sorted.toSeq
    assert(keys == Seq("1", "2", "3"), s"got $keys")
  }
}
