package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streaming

/** LEFT OUTER stream-stream interval join (`Streaming.intervalJoinOuter`)
  * — SQ11's attribution-grade sibling. Pins the three semantics that
  * differ from the inner join: (1) a click with a purchase in horizon
  * emits the joined row; (2) a click with NO purchase emits a null-padded
  * row, but ONLY once the global watermark passes its horizon (forced
  * here by a sentinel batch on both sides); (3) a click whose horizon the
  * watermark has not yet passed stays pending — a stopped stream does not
  * fabricate "unconverted" verdicts early.
  */
class StreamOuterJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, u: Long, sec: Long, t: String, v: Double = 1.0) =
    Ev(id, new java.sql.Timestamp(sec * 1000L), u, t, v)

  test("matched clicks join, expired unmatched clicks null-pad, " +
      "in-horizon clicks stay pending") {
    val msC = MemoryStream[Ev](spark)
    val msP = MemoryStream[Ev](spark)
    val name = s"oj${System.nanoTime()}"
    val q = Streaming.intervalJoinOuter(msC.toDF(), msP.toDF())
      .writeStream.format("memory").queryName(name).outputMode("append")
      .start()
    // batch 1: u1 clicks at t=1000 with NO purchase; u2 clicks at t=2000
    // and purchases at t=2500 (in horizon).
    msC.addData(Seq(ev(1, 1, 1000, "click"), ev(2, 2, 2000, "click")))
    msP.addData(Seq(ev(10, 2, 2500, "purchase", 9.0)))
    q.processAllAvailable()
    // batch 2: sentinel events FAR in the future on BOTH sides advance
    // the global watermark past click@1000's horizon (1000 + 3600 s) +
    // the 1 h watermark delay — forcing the unconverted verdict out.
    val far = 1000L + 3600L + 3600L + 100000L
    msC.addData(Seq(ev(3, 9, far, "click")))
    msP.addData(Seq(ev(11, 9, far, "purchase")))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table(name)
      .collect().map(r => (r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    assert(rows.contains((2L, Some(10L))), s"matched click must join: $rows")
    assert(rows.contains((1L, None)),
      s"expired unmatched click must null-pad: $rows")
    // the sentinel click (id 3) is matched by sentinel purchase 11 at the
    // same instant — it may legitimately emit as matched; what it must
    // NEVER do is emit as unmatched (its horizon is still open).
    assert(!rows.contains((3L, None)),
      s"in-horizon click must not fabricate an unconverted verdict: $rows")
  }
}
