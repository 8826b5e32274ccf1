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

  test("graft_simhash is SQL-callable and packs 60 bits") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_simhash(transform(split('ab cd ef', ' '), t -> graft_hash(t))) AS sh").head()
    assert(r.getLong(0) >= 0L && r.getLong(0) < (1L << 60))
  }
}
