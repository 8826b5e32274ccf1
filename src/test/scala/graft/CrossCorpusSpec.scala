package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Pins the r13-optimization dedup_cross_corpus rewrite (in-bucket
  * verification with first-colliding-band dedup) against the definition
  * it must preserve: the exact verified pair list
  * P = { (a, b, round(J(tk_a, tk_b), 4)) : a even, b odd, some band
  *        bucket contains both, round(J, 4) ≥ 0.8 }.
  *
  * The reference is the PRE-rewrite formulation itself — band self-join
  * across the even/odd split, corpus-wide candidate distinct, token-set
  * fetch joins, the genuine [[Dedup.jaccard]] column — sharing nothing
  * with the code under test past the banding/tokenizing primitives both
  * must agree on. The planted corpus stresses every reduction the
  * rewrite makes: pairs colliding in MULTIPLE bands (first-band dedup
  * must emit exactly once, never twice or zero times), same-parity
  * near-dups (must not appear), an exact-threshold J = 0.8 pair, a
  * size-prune boundary pair, empty documents, and an ambient-similar
  * block (small vocabulary → dense collision set, the regime where the
  * pre-rewrite shape shuffled pair rows carrying token arrays).
  */
class CrossCorpusSpec extends SparkSpec {
  import spark.implicits._

  private def referencePairs(docs: DataFrame): Set[(Long, Long, Double)] = {
    val base = docs.select(col("doc_id"), Dedup.tokHashes(col("text")).as("tk"))
    val sig = base.withColumn("mhs", Dedup.minhashSig(col("tk")))
    val banded = Dedup.bandExplode(sig, "mhs", Seq("doc_id"))
    val a = banded.filter(col("doc_id") % 2 === 0).withColumnRenamed("doc_id", "a")
    val b = banded.filter(col("doc_id") % 2 === 1).withColumnRenamed("doc_id", "b")
    val cand = a.join(b, Seq("band", "bkey")).select("a", "b").distinct()
    cand
      .join(base.select(col("doc_id").as("a"), col("tk").as("ta")), Seq("a"))
      .join(base.select(col("doc_id").as("b"), col("tk").as("tb")), Seq("b"))
      .withColumn("jaccard", Dedup.jaccard(col("ta"), col("tb")))
      .filter(col("jaccard") >= 0.8)
      .select("a", "b", "jaccard").as[(Long, Long, Double)].collect().toSet
  }

  private def plantedCorpus: DataFrame = {
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String)]
    var nextEven = 100L
    var nextOdd = 101L
    def addEven(text: String): Long = { val i = nextEven; nextEven += 2; rows += ((i, "s0", text)); i }
    def addOdd(text: String): Long = { val i = nextOdd; nextOdd += 2; rows += ((i, "s0", text)); i }

    // near-identical cross-parity pair: collides in ALL bands (identical
    // signature) — the first-band dedup's prime duplicate-emission case
    val alpha = "mercury venus earth mars jupiter saturn uranus neptune pluto ceres eris"
    addEven(alpha); addOdd(alpha)

    // same-parity near-dups: must NEVER be emitted despite colliding
    addEven(alpha + " haumea"); addEven(alpha + " haumea")
    addOdd(alpha + " makemake"); addOdd(alpha + " makemake")

    // exact-threshold pair: |A| = |B| = 9, |A∩B| = 8 → J = 8/10 = 0.8000
    addEven("t1 t2 t3 t4 t5 t6 t7 t8 onlyA")
    addOdd("t1 t2 t3 t4 t5 t6 t7 t8 onlyB")

    // size-prune boundary: |A| = 8 ⊂ |B| = 10 → J = 0.8 exactly, with
    // min/max = 0.8 > the 0.7999 prune bound — must survive the prune
    addEven("u1 u2 u3 u4 u5 u6 u7 u8")
    addOdd("u1 u2 u3 u4 u5 u6 u7 u8 u9 u10")
    // ... and a just-under pair |A| = 7 ⊂ |B| = 10 → J = 0.7 — dropped
    addEven("w1 w2 w3 w4 w5 w6 w7")
    addOdd("w1 w2 w3 w4 w5 w6 w7 w8 w9 w10")

    // empty documents (both parities): "" tokenizes to the single empty
    // token (TokHashes("") = [hash("")]), so the two empties are
    // IDENTICAL 1-element sets and must be emitted as a J = 1.0 pair by
    // both formulations (r14: comment corrected per r13 ADVICE — the
    // old note claimed "J undefined → never emitted"; asserted below)
    addEven(""); addOdd("")

    // ambient-similar block: 100 docs over a 14-token vocabulary,
    // hash-derived token choices (deterministic, no RNG) — dense
    // collisions across parities and bands
    val vocab = Array("v0", "v1", "v2", "v3", "v4", "v5", "v6",
      "v7", "v8", "v9", "va", "vb", "vc", "vd")
    (0 until 100).foreach { i =>
      val len = 16 + (i * 7919) % 7
      val toks = (0 until len).map(j => vocab(((i * 29 + j * 13 + (i * j) % 11) % 14 + 14) % 14))
      if (i % 2 == 0) addEven(toks.mkString(" ")) else addOdd(toks.mkString(" "))
    }
    rows.toSeq.toDF("doc_id", "source", "text")
  }

  test("dedup_cross_corpus rewrite ≡ pre-rewrite attach-join formulation") {
    val docs = plantedCorpus.localCheckpoint(true)
    val expect = referencePairs(docs)
    val dir = java.nio.file.Files.createTempDirectory("ccspec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("dedup_cross_corpus")(spark, dir)
      .as[(Long, Long, Double)].collect()
    assert(got.length == got.toSet.size,
      s"first-band dedup emitted a duplicate pair: ${got.groupBy(identity).filter(_._2.length > 1).keys}")
    assert(got.toSet == expect,
      s"pair-set mismatch: missing=${(expect -- got.toSet).take(5)} extra=${(got.toSet -- expect).take(5)}")
    // the planted structure actually materialized
    assert(expect.exists(p => p._1 == 100L && p._2 == 101L), "all-band twin pair present")
    assert(expect.exists(p => p._3 == 0.8), "threshold pair present at exactly 0.8")
    assert(!expect.exists(p => p._1 == 110L && p._2 == 111L), "J = 0.7 containment pair dropped")
    assert(expect.contains((112L, 113L, 1.0)),
      "empty docs tokenize to the single empty token and pair at J = 1.0")
    assert(expect.size > 100, s"ambient block produced a dense pair set (got ${expect.size})")
  }

  // r14 (guide §2.5): a degenerate band bucket ran its whole quadratic
  // verify in one task (261 s straggler at the synthetic sf1 decade).
  // Buckets past spark.graft.dedup.sliceThreshold split into S(S+1)/2
  // slice-pair sub-tasks; every unordered pair must land in EXACTLY one.
  // Forcing the threshold to 4 routes the planted corpus's dense
  // ambient block through the hot path — the emitted pair set must be
  // identical to the single-task path's, with no duplicates.
  test("hot-bucket triangle split emits the identical pair set exactly once") {
    val docs = plantedCorpus.localCheckpoint(true)
    val dir = java.nio.file.Files.createTempDirectory("ccspec_hot").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val coldSet = SparkEntry.queries("dedup_cross_corpus")(spark, dir)
      .as[(Long, Long, Double)].collect().toSet
    spark.conf.set("spark.graft.dedup.sliceThreshold", "4")
    spark.conf.set("spark.graft.dedup.bucketSlices", "3")
    try {
      val hot = SparkEntry.queries("dedup_cross_corpus")(spark, dir)
        .as[(Long, Long, Double)].collect()
      assert(hot.length == hot.toSet.size,
        s"split emitted duplicates: ${hot.groupBy(identity).filter(_._2.length > 1).keys.take(3)}")
      assert(hot.toSet == coldSet,
        s"split pair-set mismatch: missing=${(coldSet -- hot.toSet).take(5)} " +
          s"extra=${(hot.toSet -- coldSet).take(5)}")
    } finally {
      spark.conf.unset("spark.graft.dedup.sliceThreshold")
      spark.conf.unset("spark.graft.dedup.bucketSlices")
    }
  }

  // r14 (VERDICT item 6): the in-bucket verifier buffers one bucket's
  // token arrays in task memory; a degenerate bucket must degrade
  // PREDICTABLY — a loud failure naming spark.graft.dedup.maxBucket —
  // never an executor OOM. The ambient block's buckets exceed a cap of 2.
  test("degenerate LSH bucket trips the declared cap loudly") {
    val docs = plantedCorpus.localCheckpoint(true)
    val dir = java.nio.file.Files.createTempDirectory("ccspec_cap").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    spark.conf.set("spark.graft.dedup.maxBucket", "2")
    try {
      val ex = intercept[Exception] {
        SparkEntry.queries("dedup_cross_corpus")(spark, dir).collect()
      }
      val chain = Iterator.iterate(ex: Throwable)(_.getCause)
        .takeWhile(_ != null).take(10).toSeq
      assert(chain.exists(c => c.getMessage != null &&
          c.getMessage.contains("spark.graft.dedup.maxBucket")),
        s"expected the loud bucket-cap failure, got: $ex")
    } finally spark.conf.unset("spark.graft.dedup.maxBucket")
  }
}
