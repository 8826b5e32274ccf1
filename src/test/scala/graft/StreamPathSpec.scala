package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Streaming

/** Streaming order-2 path mining (`Streaming.pathTrigramIngest`) —
  * q112's stateful stream twin. Pins: batch ≡ stream at ANY split point
  * under the per-user ordered-feed contract, constant last-2 state
  * (never history buffering — proven by the split equivalence itself:
  * a split right after a trigram's first event only works if the state
  * carries it), and at-least-once redelivery idempotence (a replayed
  * batch emits nothing new thanks to the (ts, event_id) high-water
  * mark).
  */
class StreamPathSpec extends SparkSpec {
  import spark.implicits._

  private def events(): Seq[Ev] =
    Tables(spark, Sf0001, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .orderBy(col("ts"), col("event_id")) // the ordered-feed contract
      .as[Ev].collect().toSeq

  private def batchCounts(): Map[String, Long] =
    SparkEntry.queries("q112_path_3gram")(spark, Sf0001)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap

  private def run(name: String, batches: Seq[Seq[Ev]]): Map[String, Long] = {
    val ms = MemoryStream[Ev](spark)
    val q = Streaming.pathTrigramIngest(ms.toDF())
      .writeStream.format("memory").queryName(name).outputMode("append")
      .start()
    // one processAllAvailable per add = a REAL micro-batch boundary
    // (AvailableNow would coalesce every pending add into one batch,
    // silently testing nothing about state straddles).
    batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    q.stop()
    spark.table(name).groupBy("path").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("stream trigram counts ≡ the q112 batch rollup at one-batch, " +
      "three-batch, and per-37-row splits") {
    val all = events()
    val expected = batchCounts()
    assert(expected.nonEmpty, "batch reference must be non-trivial")
    for ((size, tag) <- Seq(all.length -> "one", all.length / 3 -> "three", 37 -> "37"))
      assert(run(s"ptri_$tag", all.grouped(size).toSeq) == expected,
        s"$tag-batch split must reproduce the batch rollup")
  }

  test("redelivered rows emit nothing (at-least-once idempotence) and a " +
      "cross-batch trigram straddle is stitched by the last-2 state") {
    def ev(id: Long, u: Long, sec: Long, t: String) =
      Ev(id, new java.sql.Timestamp(sec * 1000L), u, t, 1.0)
    // user 1: a(1) b(2) | c(3) d(4) — the straddle: b>?>? needs state.
    val b1 = Seq(ev(1, 1, 10, "a"), ev(2, 1, 20, "b"))
    val b2 = Seq(ev(3, 1, 30, "c"), ev(4, 1, 40, "d"))
    val out = run("ptri_straddle", Seq(b1, b2))
    assert(out == Map("a>b>c" -> 1L, "b>c>d" -> 1L),
      s"both straddling trigrams must be stitched from state: $out")
    // redelivery: feed batch 2 AGAIN — high-water mark must swallow it.
    val out2 = run("ptri_replay", Seq(b1, b2, b2))
    assert(out2 == Map("a>b>c" -> 1L, "b>c>d" -> 1L),
      s"replayed batch must emit nothing new: $out2")
  }

  test("idleTtl evicts idle keys: the window AND the high-water mark restart after the gap") {
    def ev(id: Long, u: Long, sec: Long, t: String) =
      Ev(id, new java.sql.Timestamp(sec * 1000L), u, t, 1.0)
    // ProcessingTimeTimeout makes shouldRunAnotherBatch true on EVERY
    // trigger (timers may always fire), so `noNewData` is never signaled
    // and processAllAvailable NEVER RETURNS once a timer is registered —
    // triggered or not (jstack-verified; the untriggered variant was the
    // r9 hang). A TTL'd query must therefore be driven by a real
    // processing-time trigger and observed by deadline-bounded POLLING of
    // the sink table and state-store metrics, never awaited.
    val ms = MemoryStream[Ev](spark)
    val q = Streaming.pathTrigramIngest(ms.toDF(), idleTtl = Some("2 seconds"))
      .writeStream.format("memory").queryName("ptri_ttl").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("250 milliseconds"))
      .start()
    def await(what: String)(cond: => Boolean): Unit = {
      val deadline = System.currentTimeMillis() + 60000
      while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(200)
      assert(cond, s"timed out waiting for $what")
    }
    def stateRows(): Long = Option(q.lastProgress)
      .flatMap(p => p.stateOperators.headOption).map(_.numRowsTotal).getOrElse(-1L)
    def sunk(): Seq[String] =
      spark.table("ptri_ttl").collect().map(_.getString(1)).toSeq.sorted
    try {
      ms.addData(Seq(ev(1, 1, 100, "a"), ev(2, 1, 200, "b"), ev(3, 1, 300, "c")))
      await("the pre-gap trigram")(sunk() == Seq("a>b>c"))
      // the idle timer fires in a trigger-scheduled empty batch; observe
      // the eviction as the state store draining
      await("the TTL eviction")(stateRows() == 0L)
      // Post-gap rows sit BELOW the pre-gap high-water (ts 300, id 3): had
      // the mark survived eviction they would all drop as late and d>e>f
      // could never appear. And the first two post-gap events must emit
      // no trigram — the sliding window restarts (the documented trade:
      // the gap IS a session break).
      ms.addData(Seq(ev(4, 1, 10, "d"), ev(5, 1, 20, "e")))
      await("the post-gap state rebuild")(stateRows() == 1L)
      assert(sunk() == Seq("a>b>c"),
        "the first two post-gap events must emit no trigram")
      ms.addData(Seq(ev(6, 1, 30, "f")))
      await("the post-gap trigram")(sunk() == Seq("a>b>c", "d>e>f"))
    } finally q.stop()
    assert(sunk() == Seq("a>b>c", "d>e>f"),
      s"eviction must restart the window and reset the high-water mark; got ${sunk()}")
  }
}
