package graft

/** Structural gate on NONDETERMINISTIC expressions in library code.
  *
  * At 100 TB, task retries and speculative execution are routine: any
  * lost executor re-runs its partitions from lineage. An operator built
  * on `rand()`, `uuid()`, `monotonically_increasing_id()`,
  * `spark_partition_id()` or `input_file_name()` produces DIFFERENT rows
  * on the retried attempt than the original attempt produced — downstream
  * stages that already consumed the first attempt's output now disagree
  * with the retry, which is silent corruption, not a crash. That is why
  * every sampling/salting operator in the repo derives its "randomness"
  * from `hash(...)` of row CONTENT (Skew.scala's deterministic salt,
  * TextOps' hash-deterministic samplers): content-derived values replay
  * identically under retry.
  *
  * Until now that discipline was inspection-only. Same machine-enforced
  * shape as CollectGateSpec's driver-read sweep: this spec greps the main
  * source tree and fails on any nondeterministic-expression call outside
  * the sanctioned sites, so entry #222 cannot regress it.
  *
  * Sanctioned wall-clock sites (grep'd tightly, not whole-file-excluded):
  * the TTL upsert sinks stamp `expires_at` with `current_timestamp()` —
  * that mirrors the reference's DynamoDB TTL contract (item expiry is
  * ingest-wall-clock by definition) and the stamp happens ONCE at the
  * sink write, never inside a retryable transform consumed downstream.
  * Harness mains (profilers/benchmarks) may read the JVM clock to time
  * jobs; they never put it in query results.
  */
class DeterminismGateSpec extends SparkSpec {

  private def walk(f: java.io.File): Seq[java.io.File] =
    if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
    else if (f.getName.endsWith(".scala")) Seq(f) else Nil

  /** `patterns` are REGEXES (r12 ADVICE: naive substrings both
    * false-red on identifiers like `operand(` and false-green on
    * `util.Random`); `sanctioned(file, line, ctx)` sees the line plus
    * its immediate neighbors, so a sanction can require its evidence
    * (e.g. the `expires_at` TTL column) adjacent to the match instead
    * of whole-file-excluding. */
  private def sweep(patterns: Seq[String],
      sanctioned: (java.io.File, String, String) => Boolean): Seq[String] = {
    val root = new java.io.File("src/main/scala/graft")
    assert(root.isDirectory, s"sweep root missing: ${root.getAbsolutePath}")
    val compiled = patterns.map(p => p -> p.r)
    for {
      f <- walk(root)
      lines = scala.io.Source.fromFile(f, "UTF-8").getLines().toVector
      (line, idx) <- lines.zipWithIndex
      t = line.trim
      // docstrings/comments may NAME the patterns (explaining this gate)
      if !t.startsWith("*") && !t.startsWith("//") && !t.startsWith("/*")
      ctx = lines.slice(math.max(0, idx - 1), math.min(lines.length, idx + 2))
        .mkString("\n")
      if !sanctioned(f, line, ctx)
      (p, rx) <- compiled
      if rx.findFirstIn(line).isDefined
    } yield s"${f.getPath}:${idx + 1}: [$p] $t"
  }

  test("grep gate: no retry-unsafe nondeterministic expressions in main sources") {
    // No sanctioned site exists for these anywhere in main — a content
    // hash (pmod(hash(...), n)) expresses every legitimate use. Word
    // boundaries keep identifiers like `operand(` from false-redding;
    // `util.Random` / `new Random` catch driver-side RNG the SQL-surface
    // patterns would miss.
    val offenders = sweep(
      Seq("""\brandn?\(""", "monotonically_increasing_id",
        "input_file_name", "spark_partition_id", """\buuid\(\)""",
        """\bshuffle\(""", """util\.Random""", """\bnew\s+Random\b"""),
      sanctioned = (_, _, _) => false)
    assert(offenders.isEmpty,
      "retry-unsafe nondeterministic expressions found — derive values from " +
        "content hashes instead (see Skew.scala's deterministic salt):\n" +
        offenders.mkString("\n"))
  }

  test("grep gate: wall-clock reads only at TTL sinks and harness timers") {
    val harness = Set("Bench.scala", "Verify.scala", "Smoke.scala",
      "SqlSweep.scala", "Explain.scala", "StreamBench.scala",
      "StreamProfile.scala", "Scaling.scala", "ConfigSweep.scala")
    val offenders = sweep(
      Seq("current_timestamp", "current_date", """unix_timestamp\(\)""",
        "System.currentTimeMillis", "System.nanoTime", "Instant.now",
        "LocalDate.now", "LocalDateTime.now", "new java.util.Date"),
      sanctioned = (f, _, ctx) =>
        harness.contains(f.getName) ||
          // the TTL upsert sink family: expiry is ingest-wall-clock by the
          // reference's DynamoDB TTL contract (SURVEY §2.1 K3/K4). The
          // sanction requires the TTL column itself within one line of
          // the wall-clock read — a future non-TTL current_timestamp()
          // in these files REDS the gate (r12 ADVICE: the old
          // `|| line.contains("current_timestamp()")` arm made the
          // expires_at condition vacuous).
          ((f.getName == "Sources.scala" || f.getName == "Streaming.scala") &&
            ctx.contains("expires_at")))
    assert(offenders.isEmpty,
      "wall-clock read outside the sanctioned TTL-sink/harness sites:\n" +
        offenders.mkString("\n"))
  }
}
