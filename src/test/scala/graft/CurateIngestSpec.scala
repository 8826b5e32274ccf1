package graft

import java.nio.file.Files

import graft.streaming.Streaming
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Top-level for Encoder derivation (see [[Doc]]). */
case class CDoc(doc_id: Long, source: String, text: String)

/** One-call streaming curation gate ([[Streaming.curateIngest]]):
  * decontamination + exact canonicalization + quality, replay-idempotent,
  * equivalent to the batch corpus_manifest verdict on the same corpus. */
class CurateIngestSpec extends SparkSpec {
  import spark.implicits._

  test("single-pass streaming curation ≡ the batch manifest's canonical ∧ quality ∧ ¬contaminated verdict") {
    val root = Files.createTempDirectory("graft_curate_").toFile.getAbsolutePath
    val docs = Tables(spark, Sf0001, "documents")
    val evalDocs = docs.filter(col("doc_id") % 97 === 0)
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), col("source"), col("text"))

    val ms = MemoryStream[CDoc](spark)
    ms.addData(corpus.as[CDoc].collect().toSeq)
    val q = Streaming.curateIngest(ms.toDF(), evalDocs, s"$root/fp", s"$root/kept",
      s"$root/ckpt", trigger = Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamKept = spark.read.parquet(s"$root/kept")
      .select("doc_id").as[Long].collect().toSeq.sorted

    val manifestKept = SparkEntry.queries("corpus_manifest")(spark, Sf0001)
      .filter(col("keep")).select("doc_id").as[Long].collect().toSeq.sorted
    assert(streamKept == manifestKept,
      s"stream kept ${streamKept.size} vs manifest ${manifestKept.size}; " +
        s"diff ${(streamKept.toSet -- manifestKept.toSet).take(5)} / " +
        s"${(manifestKept.toSet -- streamKept.toSet).take(5)}")
  }

  test("cross-batch canonicalization, contaminated-doc fp retention, and replay idempotence") {
    val root = Files.createTempDirectory("graft_curate2_").toFile.getAbsolutePath
    val good = "a perfectly reasonable document with plenty of distinct informative tokens " +
      "covering spark catalyst tungsten shuffles partitions and adaptive execution"
    val evalText = "benchmark evaluation passage that must never leak into training data ever"
    val evalDocs = Seq((9000L, evalText)).toDF("doc_id", "text")

    val ms = MemoryStream[CDoc](spark)
    // batch 0: a good doc, an eval-overlapping doc, and a low-quality doc
    // (one token repeated — fails the Gopher top-token gate)
    ms.addData(Seq(
      CDoc(1, "s", good),
      CDoc(2, "s", evalText + " plus some extra trailing context"),
      CDoc(3, "s", Seq.fill(40)("spam").mkString(" "))))
    val start = () => Streaming.curateIngest(ms.toDF(), evalDocs, s"$root/fp",
      s"$root/kept", s"$root/ckpt", trigger = Trigger.AvailableNow()).start()
    val q0 = start(); q0.awaitTermination()
    val kept0 = spark.read.parquet(s"$root/kept").select("doc_id").as[Long].collect().toSeq.sorted
    assert(kept0 == Seq(1L), s"batch 0 kept $kept0")

    // batch 1: exact duplicates of all three batch-0 docs (higher ids) plus
    // one novel doc — only the novel doc may pass: the good doc's dup
    // dedups against the store, and the contaminated/low-quality docs'
    // dups must find their RETAINED fingerprints (kept-or-not, fps persist)
    ms.addData(Seq(
      CDoc(11, "s", good),
      CDoc(12, "s", evalText + " plus some extra trailing context"),
      CDoc(13, "s", Seq.fill(40)("spam").mkString(" ")),
      CDoc(14, "s", "an entirely novel narrative mentioning watermarks checkpoints and state stores")))
    val q1 = start(); q1.awaitTermination()
    val keptAll = spark.read.parquet(s"$root/kept").select("doc_id").as[Long].collect().toSeq.sorted
    assert(keptAll == Seq(1L, 14L), s"after batch 1 kept $keptAll")

    // replay batch 1 (checkpoint recovery): same input, same batch id —
    // output must be rewritten in place, not duplicated, and must not
    // self-match against its own previous fingerprint write
    val replayBatch = Seq(
      CDoc(11, "s", good),
      CDoc(12, "s", evalText + " plus some extra trailing context"),
      CDoc(13, "s", Seq.fill(40)("spam").mkString(" ")),
      CDoc(14, "s", "an entirely novel narrative mentioning watermarks checkpoints and state stores"))
      .toDF("doc_id", "source", "text")
    Streaming.curateBatch(replayBatch, evalDocs, s"$root/fp", s"$root/kept", 1L)
    val keptReplay = spark.read.parquet(s"$root/kept").select("doc_id").as[Long].collect().toSeq.sorted
    assert(keptReplay == Seq(1L, 14L), s"replay kept $keptReplay")
  }
}
