package graft

import org.apache.spark.sql.functions._

/** Bucketing: pre-shuffled co-located joins — at 100 TB the repeated
  * join key (content_id / custkey) is bucketed at write time so joins and
  * aggregations on it skip the exchange entirely. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of two tables bucketed on the same key runs with zero exchanges") {
    val orders = Tables(spark, Sf0001, "orders")
    val customer = Tables(spark, Sf0001, "customer")
    orders.write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_b")
    customer.write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("customer_b")
    // Hint SMJ on an input (a hint on the joined result is a no-op) so the
    // co-location actually matters, then check the plan has NO shuffle:
    // the bucket layout satisfies the join distribution.
    val joinedNoBc = spark.table("orders_b").hint("merge")
      .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_name")
    val plan = joinedNoBc.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    // and it is correct
    assert(joinedNoBc.count() == orders.join(customer,
      col("o_custkey") === col("c_custkey")).count())
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
  }

  test("aggregation on the bucket key also skips the exchange") {
    Tables(spark, Sf0001, "orders").write.mode("overwrite")
      .bucketBy(8, "o_custkey").saveAsTable("orders_b2")
    val agg = spark.table("orders_b2").groupBy("o_custkey")
      .agg(sum(col("o_totalprice")).as("s"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed aggregation must not shuffle:\n$plan")
    spark.sql("DROP TABLE IF EXISTS orders_b2")
  }

  test("hive-partitioned corpus write prunes partitions on read") {
    // The curated-corpus layout: partitionBy(source) at write time means a
    // per-domain read touches ONE directory, not the whole corpus — at
    // 100 TB the difference between a metadata lookup and a full scan.
    val dir = java.nio.file.Files.createTempDirectory("graft_pp_").toFile.getAbsolutePath
    Tables(spark, Sf0001, "documents")
      .write.mode("overwrite").partitionBy("source").parquet(dir)
    val one = spark.read.parquet(dir).filter(col("source") === "src3")
    val explained = one.queryExecution.executedPlan.toString
    // The source predicate must surface as a PartitionFilter (planning-
    // time pruning), and the executed scan must actually read ONE file —
    // asserted via the scan's own numFiles metric, since inputFiles
    // reports the relation's full listing, not the pruned selection.
    assert(explained.contains("PartitionFilters") && explained.contains("src3"),
      s"expected a src3 partition filter:\n$explained")
    val expect = Tables(spark, Sf0001, "documents")
      .filter(col("source") === "src3").count()
    // collect() runs through this Dataset's own QueryExecution, so the
    // scan metrics below belong to exactly this materialization (count()
    // would plan and execute a different tree).
    assert(one.collect().length == expect)
    val scan = one.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scan.isDefined, s"expected a file scan leaf:\n$explained")
    assert(scan.get.metrics("numFiles").value == 1,
      s"pruned read must touch 1 file, read ${scan.get.metrics("numFiles").value}")
  }
}
