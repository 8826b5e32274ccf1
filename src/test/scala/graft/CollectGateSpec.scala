package graft

import org.apache.spark.sql.functions._

/** Structural gate on driver-side reads (the r9 verdict's task 3).
  *
  * Every `.collect()` / `.head()` in operator code was, until r10, a
  * bounded control-plane read BY INSPECTION only — nothing stopped a new
  * entry from collecting a full table. The window/Expand plan gates exist
  * precisely because inspection doesn't scale across rounds; this is the
  * same discipline for driver reads:
  *
  *  1. every operator-side read goes through [[Qh.boundedCollect]] /
  *     [[Qh.boundedHead]], which declare a cap + reason and RAISE when
  *     the read exceeds the cap at runtime;
  *  2. this spec grep-sweeps the main sources and fails on any raw
  *     Dataset driver-read call outside the sanctioned impl line, so the
  *     convention is machine-enforced for entry #222 onward.
  */
class CollectGateSpec extends SparkSpec {
  import spark.implicits._

  test("boundedCollect raises past its declared cap (planted over-cap read)") {
    val df = spark.range(10).toDF("id")
    val e = intercept[IllegalStateException] {
      Qh.boundedCollect(df, 5, "planted over-cap case")
    }
    assert(e.getMessage.contains("planted over-cap case"))
    assert(e.getMessage.contains("5-row bound"))
  }

  test("boundedCollect under the cap returns all rows; boundedHead reads one") {
    val rows = Qh.boundedCollect(spark.range(7).toDF("id"), 16, "in-bound read")
    assert(rows.length == 7)
    val h = Qh.boundedHead(spark.range(100).toDF("id").agg(max(col("id"))),
      "global aggregate")
    assert(h.getLong(0) == 99L)
    val e = intercept[IllegalStateException] {
      Qh.boundedHead(spark.range(5).filter(col("id") > 10).toDF(), "empty argmax")
    }
    assert(e.getMessage.contains("got none"))
    // insane caps are rejected outright, not silently honored
    intercept[IllegalArgumentException] {
      Qh.boundedCollect(spark.range(1).toDF("id"), 0, "zero cap")
    }
  }

  test("grep gate: no raw Dataset driver reads in operator sources") {
    // Harness mains (Bench/Verify/Smoke/SqlSweep/Explain/StreamBench and
    // the SparkEntry registry) drive queries and legitimately collect
    // results for printing/diffing; everything else — operators,
    // functions, plans, streaming, pipeline, enrich, sources, schema,
    // multimodal, QueryDef — is library code and must go through the
    // bounded helpers.
    val harness = Set("Bench.scala", "Verify.scala", "Smoke.scala",
      "SqlSweep.scala", "Explain.scala", "StreamBench.scala",
      "SparkEntry.scala")
    val patterns = Seq(".collect()", ".head()", ".first()", ".head.",
      ".first.", "collectAsList", "toLocalIterator")
    val root = new java.io.File("src/main/scala/graft")
    assert(root.isDirectory, s"sweep root missing: ${root.getAbsolutePath}")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".scala")) Seq(f) else Nil
    val offenders = for {
      f <- walk(root)
      if !harness.contains(f.getName)
      (line, idx) <- scala.io.Source.fromFile(f, "UTF-8").getLines().zipWithIndex.toSeq
      t = line.trim
      // comments may NAME the patterns (docstrings explaining the gate)
      if !t.startsWith("*") && !t.startsWith("//") && !t.startsWith("/*")
      if !line.contains("sanctioned raw collect") // the boundedCollect impl itself
      p <- patterns
      if line.contains(p)
    } yield s"${f.getPath}:${idx + 1}: [$p] $t"
    assert(offenders.isEmpty,
      "raw driver reads found — route them through Qh.boundedCollect/boundedHead:\n" +
        offenders.mkString("\n"))
  }
}
