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

  test("saltedAgg with min/max merges equals direct aggregation") {
    val direct = skewed.groupBy("k")
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"), avg(col("v")).as("av"))
      .orderBy("k").collect().toSeq
    // avg is not sum-mergeable: decompose as merged-sum / merged-count
    val salted = Skew.saltedAgg(skewed, Seq("k"), col("id"), 8,
        Skew.SaltedAgg("mn", min(col("v")), min(_)),
        Skew.SaltedAgg("mx", max(col("v")), max(_)),
        Skew.SaltedAgg("sv", sum(col("v")), sum(_)),
        Skew.SaltedAgg("n", count(lit(1)), sum(_)))
      .select(col("k"), col("mn"), col("mx"), (col("sv") / col("n")).as("av"))
      .orderBy("k").collect().toSeq
    assert(salted == direct)
  }

  test("registered skew_salted_agg: first shuffle partitions on (key, salt)") {
    val df = SparkEntry.queries("skew_salted_agg")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    val firstExchange = plan.split("\n").filter(_.contains("hashpartitioning")).lastOption
    // bottom-most exchange (printed last) is phase 1: must carry __salt so
    // the hot key spreads over 8 reducers before the per-key merge
    assert(firstExchange.exists(l => l.contains("__salt") && l.contains("event_type")),
      s"phase-1 shuffle must partition on (event_type, __salt):\n$plan")
  }
}
