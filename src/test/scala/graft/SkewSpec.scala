package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Salting correctness: salted results must equal unsalted results. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 90% of rows share one hot key — the shape that melts a single reducer
  private lazy val skewed = (1 to 2000).map { i =>
    (if (i % 10 == 0) s"key${i % 7}" else "HOT", i.toLong, i * 1.5)
  }.toDF("k", "id", "v")

  test("saltedSum equals direct aggregation on a skewed key") {
    val direct = skewed.groupBy("k")
      .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
      .orderBy("k").collect().toSeq
    val salted = Skew.saltedSum(skewed, Seq("k"), col("id"), 8,
      "sv" -> sum(col("v")), "n" -> count(lit(1)))
      .orderBy("k").collect().toSeq
    assert(salted == direct)
  }

  test("saltedJoin equals direct join (row multiplicity preserved)") {
    val dim = Seq(("HOT", "hot-dim"), ("key0", "d0"), ("key3", "d3")).toDF("k", "label")
    val direct = skewed.join(dim, Seq("k")).orderBy("id")
      .select("k", "id", "label").collect().toSeq
    val salted = Skew.saltedJoin(skewed, dim, "k", col("id"), 8).orderBy("id")
      .select("k", "id", "label").collect().toSeq
    assert(salted == direct)
  }

  test("saltedJoin spreads the hot key across salt buckets") {
    val salts = skewed.withColumn("__salt", pmod(hash(col("id")), lit(8)))
      .filter(col("k") === "HOT").select("__salt").distinct().count()
    assert(salts == 8, "deterministic salt must use all buckets")
  }
}
