package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** The containment recall gap and its dedicated-index fix.
  *
  * A short doc quoted inside a long one has containment ≈ 1 but Jaccard
  * ≈ |short|/|long| → 0, so MinHash bands (tuned for J >= 0.8) rarely
  * collide — the documented recall gap of `dedup_containment`. The
  * prefix-filtered inverted index (`Dedup.containmentExact`) has provably
  * exact candidate recall at the threshold, for any corpus.
  */
class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  // Long doc: 300 distinct tokens. Short doc: a 30-token contiguous quote
  // from its middle — all 28 of the short doc's 3-shingles occur in the
  // long doc (containment 1000 permille), while Jaccard is 28/298 ≈ 0.09.
  private val longToks = (0 until 300).map(i => s"tok$i")
  private val shortToks = longToks.slice(100, 130)
  private lazy val planted = Seq(
    ("s0", 1L, shortToks.mkString(" ")),
    ("s0", 2L, longToks.mkString(" "))
  ).toDF("source", "doc_id", "text")

  test("MinHash bands miss the planted short-in-long quote pair") {
    val base = planted
      .select(col("source"), col("doc_id"),
        Dedup.shingles3(Dedup.tokHashesSeq(col("text"))).as("sh"))
      .filter(size(col("sh")) > 0)
    val sig = base.withColumn("mhs", Dedup.minhashSig(col("sh")))
    val banded = Dedup.bandExplode(sig, "mhs", Seq("source", "doc_id"))
    val cand = banded.select(col("source"), col("band"), col("bkey"), col("doc_id").as("a"))
      .join(banded.select(col("source"), col("band"), col("bkey"), col("doc_id").as("b")),
        Seq("source", "band", "bkey"))
      .filter(col("a") < col("b"))
    // The gap this spec documents: banding generates NO candidate for a
    // pair whose Jaccard is far below the banding's design point.
    assert(cand.count() == 0,
      "expected the J≈0.09 quote pair to evade 4x2 MinHash banding")
  }

  test("containmentExact finds the planted pair with exact integer permilles") {
    val rows = Dedup.containmentExact(planted).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("a") == 1L && r.getAs[Long]("b") == 2L)
    assert(r.getAs[Long]("inter") == 28L)
    assert(r.getAs[Long]("na") == 28L)
    assert(r.getAs[Long]("nb") == 298L)
    assert(r.getAs[Long]("cont_ab_milli") == 1000L)
    assert(r.getAs[Long]("cont_ba_milli") == 28L * 1000L / 298L)
  }

  test("prefix filter ≡ brute-force containment on the real sf0.001 corpus") {
    // The no-false-negative proof is arithmetic; this pins the
    // implementation to it on real data: the prefix-filtered join must
    // equal the unfiltered all-pairs containment join, row for row.
    val docs = Tables(spark, Sf0001, "documents")
    val base = docs
      .select(col("source"), col("doc_id"),
        Dedup.shingles3(Dedup.tokHashesSeq(col("text"))).as("sh"))
      .filter(size(col("sh")) > 0)
    val brute = base.select(col("source"), col("doc_id").as("a"), col("sh").as("sa"))
      .join(base.select(col("source"), col("doc_id").as("b"), col("sh").as("sb")), Seq("source"))
      .filter(col("a") < col("b"))
      .select(col("source"), col("a"), col("b"),
        size(array_intersect(col("sa"), col("sb"))).cast("long").as("inter"),
        size(col("sa")).cast("long").as("na"), size(col("sb")).cast("long").as("nb"))
      .withColumn("cont_ab_milli", expr("inter * 1000 div na"))
      .withColumn("cont_ba_milli", expr("inter * 1000 div nb"))
      .filter(greatest(col("cont_ab_milli"), col("cont_ba_milli")) >= 600)
      .collect().map(_.toSeq).toSet
    val pf = Dedup.containmentExact(docs).collect().map(_.toSeq).toSet
    assert(pf == brute)
    assert(pf.nonEmpty, "sf0.001 should contain at least one containment pair")
  }
}
