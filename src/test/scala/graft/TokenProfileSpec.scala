package graft

import org.apache.spark.sql.functions._

/** graft.plans.TokenProfile — the map-only [n_tok, n_dist, top_cnt]
  * triple. Planted arrays pin every branch (empty tokens, nulls, ties)
  * against the explode → groupBy aggregation it replaces in
  * curateBatch's Gopher gate, plus interpreted-vs-codegen parity and
  * the split(" ") composition the call site uses.
  */
class TokenProfileSpec extends SparkSpec {
  import spark.implicits._

  private def prof(toks: Seq[String]): (Long, Long, Long) = {
    val r = Seq(Tuple1(toks)).toDF("t")
      .select(graft.plans.TokenProfile.column(col("t")).as("p"))
      .head().getSeq[Long](0)
    (r(0), r(1), r(2))
  }

  test("planted triples: totals, distincts, top frequency, empty-string tokens") {
    assert(prof(Seq("a", "b", "a", "a", "c")) == ((5L, 3L, 3L)))
    assert(prof(Seq("x")) == ((1L, 1L, 1L)))
    // split("", " ") yields [""] — the empty token counts like any other
    assert(prof(Seq("")) == ((1L, 1L, 1L)))
    assert(prof(Seq("a", "", "", "a")) == ((4L, 2L, 2L)))
    assert(prof(Seq.empty[String]) == ((0L, 0L, 0L)))
    // ties: top_cnt is the max frequency, whichever token carries it
    assert(prof(Seq("a", "b", "a", "b")) == ((4L, 2L, 2L)))
  }

  test("null elements count as one shared pseudo-token (the NULL group of a groupBy)") {
    val r = Seq(Tuple1(Seq[String]("a", null, null, "a", "b")))
      .toDF("t").select(graft.plans.TokenProfile.column(col("t")).as("p"))
      .head().getSeq[Long](0)
    assert((r(0), r(1), r(2)) == ((5L, 3L, 2L))) // groups: a×2, null×2, b×1
    // null ARRAY → null result (UnaryExpression null-safety)
    val nl = Seq(Tuple1(null.asInstanceOf[Seq[String]])).toDF("t")
      .select(graft.plans.TokenProfile.column(col("t"))).head()
    assert(nl.isNullAt(0))
  }

  test("≡ the explode → groupBy aggregation on the documents corpus (the gate it replaced)") {
    val docs = Tables(spark, Sf0001, "documents").select(col("doc_id"), col("text"))
    val viaExpr = docs
      .select(col("doc_id"), graft.plans.TokenProfile.column(split(col("text"), " ")).as("p"))
      .select(col("doc_id"), col("p")(0).as("n_tok"), col("p")(1).as("n_dist"),
        col("p")(2).as("top_cnt"))
    val viaAgg = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id").agg(sum("cnt").as("n_tok"),
        count(lit(1)).as("n_dist"), max("cnt").as("top_cnt"))
    assert(viaExpr.exceptAll(viaAgg).isEmpty && viaAgg.exceptAll(viaExpr).isEmpty,
      "TokenProfile must equal the aggregation form on every document")
    // SQL registration face
    val sql = spark.sql("SELECT graft_token_profile(array('a','a','b'))").head().getSeq[Long](0)
    assert((sql(0), sql(1), sql(2)) == ((3L, 2L, 2L)))
  }
}
