package graft

import org.apache.spark.sql.functions._

/** graft.plans.ClfProfile — the map-only
  * [n_tok, n_dist, score_num, n_pos, n_neg] classifier profile
  * (r13 optimization round). Planted arrays pin every branch (empty
  * tokens, nulls, zero-weight tokens) against the
  * explode → groupBy(doc) aggregation it replaces in the text_clf_*
  * family, plus full-corpus equivalence at sf0.001 and the SQL
  * registration face. The weight convention is the family's shared
  * feature-hashed lexicon: `pmod(polyhash(tok), 2001) - 1000`.
  */
class ClfProfileSpec extends SparkSpec {
  import spark.implicits._

  private def prof(toks: Seq[String]): Seq[Long] =
    Seq(Tuple1(toks)).toDF("t")
      .select(graft.plans.ClfProfile.column(col("t")).as("p"))
      .head().getSeq[Long](0)

  private def w(tok: String): Long =
    graft.plans.PolyHash.hash(tok) % 2001L - 1000L

  test("planted profiles: counts, score, sign tallies, empty-string tokens") {
    val ws = Seq("a", "b", "a").map(w)
    assert(prof(Seq("a", "b", "a")) == Seq(3L, 2L, ws.sum,
      ws.count(_ > 0L).toLong, ws.count(_ < 0L).toLong))
    // split("", " ") yields [""] — the empty token scores like any other
    assert(prof(Seq("")) == Seq(1L, 1L, w(""),
      if (w("") > 0L) 1L else 0L, if (w("") < 0L) 1L else 0L))
    assert(prof(Seq.empty[String]) == Seq(0L, 0L, 0L, 0L, 0L))
  }

  test("null elements carry no weight and are excluded from n_dist (strHash(null) convention)") {
    val r = Seq(Tuple1(Seq[String]("a", null, "a")))
      .toDF("t").select(graft.plans.ClfProfile.column(col("t")).as("p"))
      .head().getSeq[Long](0)
    assert(r(0) == 3L, "n_tok counts every element like count(1) over exploded rows")
    assert(r(1) == 1L, "n_dist counts distinct non-null like countDistinct(tok)")
    assert(r(2) == 2L * w("a"))
    val nl = Seq(Tuple1(null.asInstanceOf[Seq[String]])).toDF("t")
      .select(graft.plans.ClfProfile.column(col("t"))).head()
    assert(nl.isNullAt(0), "null array → null result")
  }

  test("≡ the explode → groupBy aggregation on the documents corpus (the shape it replaced)") {
    val docs = Tables(spark, Sf0001, "documents").select(col("doc_id"), col("text"))
    val viaExpr = docs
      .select(col("doc_id"), graft.plans.ClfProfile.column(split(col("text"), " ")).as("p"))
      .select(col("doc_id"), col("p")(0).as("n_tok"), col("p")(1).as("n_dist"),
        col("p")(2).as("score"), col("p")(3).as("n_pos"), col("p")(4).as("n_neg"))
    val viaAgg = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"), col("tok"),
        (pmod(Qh.strHash(col("tok")), lit(2001L)) - 1000L).as("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"), countDistinct(col("tok")).as("n_dist"),
        sum(col("w")).as("score"),
        sum(when(col("w") > 0L, 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("w") < 0L, 1L).otherwise(0L)).as("n_neg"))
    assert(viaExpr.exceptAll(viaAgg).isEmpty && viaAgg.exceptAll(viaExpr).isEmpty,
      "ClfProfile must equal the aggregation form on every document")
    // SQL registration face
    val sql = spark.sql("SELECT graft_clf_profile(array('a','a','b'))").head().getSeq[Long](0)
    val expect = Seq("a", "a", "b").map(w)
    assert(sql == Seq(3L, 2L, expect.sum,
      expect.count(_ > 0L).toLong, expect.count(_ < 0L).toLong))
  }
}
