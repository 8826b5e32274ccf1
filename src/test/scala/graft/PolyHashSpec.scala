package graft

import graft.plans.{GraftExtensions, PolyHash}
import org.apache.spark.sql.functions._

/** Native PolyHash expression: parity with the declarative fold, codegen
  * path, SQL registration via extensions. */
class PolyHashSpec extends SparkSpec {
  import spark.implicits._

  test("native expression equals the declarative fold on every document") {
    val diff = Tables(spark, Sf0001, "documents")
      .select(Qh.strHash(col("text")).as("native"), Qh.strHashDecl(col("text")).as("decl"))
      .filter(col("native") =!= col("decl"))
    assert(diff.count() == 0)
  }

  test("scala-side hash matches the column on edge cases") {
    val cases = Seq("", "a", "hello world", "ünïcode tëxt", "a" * 5000)
    val fromCol = cases.toDF("s").select(Qh.strHash(col("s"))).as[Long].collect().toSeq
    assert(fromCol == cases.map(PolyHash.hash))
  }

  test("non-BMP strings fold Unicode code points, matching the DuckDB oracle fragment") {
    // Pinned constants computed with DuckDB's own
    //   list_reduce(list_prepend(0, list_transform(string_split(s,''),
    //     c -> ascii(c))), (h,c) -> (h*31+c) % P)
    // — the exact strHashSql/strHashWideSql oracle fragments — on these
    // strings (ascii() yields the CODE POINT: 😀 = 128512). A UTF-16
    // charAt fold diverges on every one of them (r11 ADVICE fix: the
    // 58-bit digest is the exact-dedup key over raw crawled text, where
    // emoji are plausible). BMP strings are unaffected: café pins that.
    import graft.plans.PolyHash58
    val grin = new String(Character.toChars(0x1F600)) // 😀
    val blink = new String(Character.toChars(0x1F601)) // 😁
    val cases = Seq(
      (s"a${grin}b", 77175L, 4077187L),
      (grin, 128512L, 128512L),
      (grin + blink, 112373L, 4112385L),
      ("café", 45912L, 3045921L),
      (s"x $grin$grin y", 30678L, 7417052929L))
    cases.foreach { case (s, p20, p58) =>
      assert(PolyHash.hash(s) == p20, s"PolyHash interpreted on ${s}")
      assert(PolyHash58.hash(s) == p58, s"PolyHash58 interpreted on ${s}")
    }
    // codegen path through the Column form
    val viaCol = cases.map(_._1).toDF("s")
      .select(Qh.strHash(col("s")), Qh.strHashWide(col("s")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaCol == cases.map(c => (c._2, c._3)))
    // fused tokenizer: tokens of "x 😀😀 y" hash per code point too
    val toks = Seq(s"x $grin$grin y").toDF("text")
      .select(graft.operators.Dedup.tokHashes(col("text")))
      .head().getSeq[Long](0)
    assert(toks == Seq(120L, 112372L, 121L))
  }

  test("graft_hash is SQL-callable after imperative registration, incl. in lambdas") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_hash('abc') AS h, transform(split('ab cd', ' '), t -> graft_hash(t)) AS ths")
      .head()
    assert(r.getLong(0) == PolyHash.hash("abc"))
    assert(r.getSeq[Long](1) == Seq(PolyHash.hash("ab"), PolyHash.hash("cd")))
  }

  test("codegen and interpreted paths agree") {
    val df = Tables(spark, Sf0001, "documents").limit(50)
    val viaCodegen = df.select(Qh.strHash(col("text"))).as[Long].collect().toSeq
    val viaEval = df.select(col("text")).as[String].collect().map(PolyHash.hash).toSeq
    assert(viaCodegen == viaEval)
  }

  test("native simhash equals the declarative fold on every document") {
    import graft.operators.Dedup
    val diff = Tables(spark, Sf0001, "documents")
      .select(Dedup.tokHashes(col("text")).as("th"))
      .select(Dedup.simhash(col("th")).as("native"), Dedup.simhashDecl(col("th")).as("decl"))
      .filter(col("native") =!= col("decl"))
    assert(diff.count() == 0)
  }

  test("native minhash signature equals the declarative per-hash folds on every document") {
    import graft.operators.Dedup
    val sig = Tables(spark, Sf0001, "documents")
      .select(Dedup.tokHashes(col("text")).as("th"))
      .select(col("th"), Dedup.minhashSig(col("th")).as("mhs"))
    val anyDiff = (0 until Dedup.MinHashes)
      .map(i => element_at(col("mhs"), i + 1) =!= Dedup.minhash(col("th"), i))
      .reduce(_ || _)
    assert(sig.filter(anyDiff).count() == 0)
  }

  test("native jaccard equals the declarative form on real candidate pairs") {
    import graft.operators.Dedup
    val docs = Tables(spark, Sf0001, "documents")
      .select(col("doc_id"), col("source"), Dedup.tokHashes(col("text")).as("tk"))
    val a = docs.select(col("source"), col("doc_id").as("a"), col("tk").as("ta"))
    val b = docs.select(col("source"), col("doc_id").as("b"), col("tk").as("tb"))
    val pairs = a.join(b, Seq("source")).filter(col("a") < col("b")).limit(20000)
    val diff = pairs.select(
      Dedup.jaccard(col("ta"), col("tb")).as("native"),
      Dedup.jaccardDecl(col("ta"), col("tb")).as("decl"))
      .filter(col("native") =!= col("decl"))
    assert(diff.count() == 0)
  }

  test("native jaccard edge cases: duplicates match array_intersect semantics; empty∪empty is null") {
    import graft.operators.Dedup
    val rows = Seq(
      (Seq.empty[Long], Seq(1L, 2L)),          // 0 / 2
      (Seq(1L, 1L, 2L), Seq(1L, 3L)),          // duplicate in left, raw sizes
      (Seq(1L, 2L, 3L), Seq(3L, 2L, 1L))).toDF("x", "y")
    val diff = rows.select(
      Dedup.jaccard(col("x"), col("y")).as("native"),
      Dedup.jaccardDecl(col("x"), col("y")).as("decl"))
      .filter(col("native") =!= col("decl"))
    assert(diff.count() == 0)
    // 0/0: the ANSI declarative form would raise DIVIDE_BY_ZERO; the
    // native form is defensively null (inputs are never empty upstream)
    val nullRow = Seq((Seq.empty[Long], Seq.empty[Long])).toDF("x", "y")
      .select(Dedup.jaccard(col("x"), col("y")).as("native")).head()
    assert(nullRow.isNullAt(0))
    // string-array variant (the minhash-LSH verify path uses raw tokens)
    val strRows = Seq(
      (Seq("a", "b", "c"), Seq("c", "b", "x")),
      (Seq("a", "a", "b"), Seq("a", "z"))).toDF("x", "y")
    val strDiff = strRows.select(
      Dedup.jaccard(col("x"), col("y")).as("native"),
      Dedup.jaccardDecl(col("x"), col("y")).as("decl"))
      .filter(col("native") =!= col("decl"))
    assert(strDiff.count() == 0)
  }

  test("native fused token-hashes equal the declarative chain on every document") {
    import graft.operators.Dedup
    val diff = Tables(spark, Sf0001, "documents")
      .select(
        Dedup.tokHashes(col("text")).as("nd"), Dedup.tokHashesDecl(col("text")).as("dd"),
        Dedup.tokHashesSeq(col("text")).as("ns"), Dedup.tokHashesSeqDecl(col("text")).as("ds"))
      .filter(col("nd") =!= col("dd") || col("ns") =!= col("ds"))
    assert(diff.count() == 0)
  }

  test("native token-hashes edge cases: empty tokens, hash collisions dedup by string") {
    import graft.operators.Dedup
    // "a b" vs spacing edge cases; repeated tokens; leading/trailing spaces
    val rows = Seq("", " ", "a  b ", "x x y x", "solo").toDF("text")
    val diff = rows.select(
      Dedup.tokHashes(col("text")).as("nd"), Dedup.tokHashesDecl(col("text")).as("dd"),
      Dedup.tokHashesSeq(col("text")).as("ns"), Dedup.tokHashesSeqDecl(col("text")).as("ds"))
      .filter(col("nd") =!= col("dd") || col("ns") =!= col("ds"))
    assert(diff.count() == 0)
  }

  test("graft_simhash is SQL-callable and packs 60 bits") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_simhash(transform(split('ab cd ef', ' '), t -> graft_hash(t))) AS sh").head()
    assert(r.getLong(0) >= 0L && r.getLong(0) < (1L << 60))
  }

  test("vector ops are SQL-callable after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |  graft_sumsq(array(3.0D, 4.0D)) AS s,
        |  graft_jaccard(array(1L, 2L), array(2L, 3L)) AS j""".stripMargin).head()
    assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 25.0 && r.getDouble(2) == 0.3333)
  }

  test("native shingles equal the declarative zip_with chain on every document") {
    import graft.operators.Dedup
    val withEdges = Tables(spark, Sf0001, "documents").select(col("text"))
      .union(Seq("", "a", "a b", "a b c", "x x x x").toDF("text"))
    val th = Dedup.tokHashesSeq(col("text"))
    val diff = withEdges.select(
      Dedup.shingles3(th).as("dn"), Dedup.shingles3Decl(th).as("dd"),
      Dedup.shingles3Raw(th).as("rn"), Dedup.shingles3RawDecl(th).as("rd"))
      .filter(col("dn") =!= col("dd") || col("rn") =!= col("rd"))
    assert(diff.count() == 0)
  }

  test("native lexicon counts equal the declarative HOF forms on every document") {
    import graft.enrich.Enrich.LexiconScorer
    val withEdges = Tables(spark, Sf0001, "documents").select(col("text"))
      .union(Seq("", "  ", " good bad ", "good good GOOD bug").toDF("text"))
    val diff = withEdges.select(
      LexiconScorer.scoreCol(col("text")).as("sn"),
      LexiconScorer.scoreColDecl(col("text")).as("sd"),
      LexiconScorer.confidenceCol(col("text")).as("cn"),
      LexiconScorer.confidenceColDecl(col("text")).as("cd"))
      .filter(col("sn") =!= col("sd") || col("cn") =!= col("cd"))
    assert(diff.count() == 0)
  }

  test("native dot/norm/lsh-bucket equal the declarative HOF folds on every embedding") {
    import graft.operators.Similarity
    val emb = Tables(spark, Sf0001, "embeddings")
    val pairs = emb.select(col("vec_id"), col("embedding").as("a"))
      .join(emb.filter(col("vec_id") < 20).select(col("embedding").as("b")))
    val diff = pairs.select(
      Similarity.dotD(col("a"), col("b")).as("dn"),
      Similarity.dotDDecl(col("a"), col("b")).as("dd"),
      Similarity.normD(col("a")).as("nn"),
      Similarity.normDDecl(col("a")).as("nd"),
      Similarity.lshBucket(col("a")).as("bn"),
      Similarity.lshBucketDecl(col("a")).as("bd"),
      Similarity.lshBucket(col("a"), 1).as("bn1"),
      Similarity.lshBucketDecl(col("a"), 1).as("bd1"))
      .filter(col("dn") =!= col("dd") || col("nn") =!= col("nd") ||
        col("bn") =!= col("bd") || col("bn1") =!= col("bd1"))
    assert(diff.count() == 0)
  }

  test("the two LSH hash tables are genuinely independent bucketings") {
    import graft.operators.Similarity
    val emb = Tables(spark, Sf0001, "embeddings")
      .select(Similarity.lshBucket(col("embedding"), 0).as("b0"),
        Similarity.lshBucket(col("embedding"), 1).as("b1"))
    // If table 1 accidentally reused table 0's planes the columns would be
    // identical; independent tables agree only by chance (~1/256 per row).
    val n = emb.count()
    val agree = emb.filter(col("b0") === col("b1")).count()
    assert(agree < n / 16, s"tables correlate: $agree/$n rows share a bucket id")
  }

  test("native vector-op edge cases match HOF null/shape semantics") {
    import graft.operators.Similarity
    val rows = Seq(
      (Array(1.0f, 2.0f), Array(3.0f, 4.0f)),        // plain
      (Array(0.0f, -0.0f), Array(0.0f, 0.0f)),       // signed zeros
      (Array.empty[Float], Array.empty[Float]))      // empty → dot 0.0
      .toDF("a", "b")
    val got = rows.select(
      Similarity.dotD(col("a"), col("b")).as("dn"),
      Similarity.dotDDecl(col("a"), col("b")).as("dd"),
      Similarity.normD(col("a")).as("nn"),
      Similarity.normDDecl(col("a")).as("nd"))
      .collect()
    got.foreach { r =>
      assert(java.lang.Double.compare(r.getDouble(0), r.getDouble(1)) == 0)
      assert(java.lang.Double.compare(r.getDouble(2), r.getDouble(3)) == 0)
    }
    // length mismatch → null in both forms (zip_with null-padding poisons
    // the fold; the native form returns null explicitly)
    val mm = Seq((Array(1.0f, 2.0f), Array(1.0f)))
      .toDF("a", "b")
      .select(Similarity.dotD(col("a"), col("b")).as("dn"),
        Similarity.dotDDecl(col("a"), col("b")).as("dd"))
      .head()
    assert(mm.isNullAt(0) && mm.isNullAt(1))
    // wrong-dim vector → bucket 0 in both forms
    val wd = Seq(Tuple1(Array(1.0f, 2.0f))).toDF("a")
      .select(Similarity.lshBucket(col("a")).as("bn"),
        Similarity.lshBucketDecl(col("a")).as("bd"))
      .head()
    assert(wd.getLong(0) == 0L && wd.getLong(1) == 0L)
  }
}
