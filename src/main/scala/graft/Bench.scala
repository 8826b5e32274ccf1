package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line (driver contract). Queries execute against the
  * `noop` sink — a plain count() would let Catalyst prune projections and
  * sorts and under-measure. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: force codegen compilation, shuffle machinery, and
    // the noop sink's commit path once, so the alphabetically-first query
    // doesn't absorb several seconds of one-time JVM initialization.
    spark.range(100000).selectExpr("id % 32 AS k", "id AS v")
      .groupBy("k").count().write.format("noop").mode("overwrite").save()
    val only = args.toSet // optional: bench a subset, with plan dump
    if (only.nonEmpty) SparkEntry.queries.view.filterKeys(only).foreach { case (n, fn) =>
      System.err.println(s"=== $n\n" + fn(spark, sfDir).queryExecution.executedPlan.toString.take(8000))
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(kv => only.isEmpty || only(kv._1)).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}") }
      val dt = (System.nanoTime() - t0) / 1e9
      // isolate queries: a query's cached/checkpointed blocks must not
      // degrade its successors
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      name -> dt
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
