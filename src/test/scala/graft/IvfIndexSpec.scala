package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Materialized IVF index: write-once cell assignment, partition-pruned
  * probes — the vector analog of the persistent LSH band index. */
class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val indexDir = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_").toFile.getAbsolutePath
    Similarity.writeIvfIndex(Tables(spark, Sf0001, "embeddings"), dir)
    dir
  }

  test("probe against the materialized index equals the all-in-plan sim_ann_ivf") {
    val qvec = Tables(spark, Sf0001, "embeddings").filter(col("vec_id") === 0)
      .select("embedding").as[Array[Float]].head()
    val fromIndex = Similarity.ivfProbe(spark, indexDir, qvec, excludeVecId = Some(0L))
      .select("vec_id", "cell", "sim")
      .as[(Long, Long, Double)].collect().toSeq
    val inPlan = SparkEntry.queries("sim_ann_ivf")(spark, Sf0001)
      .as[(Long, Long, Double)].collect().toSeq
    assert(fromIndex == inPlan,
      s"index probe diverged from the in-plan query:\n$fromIndex\nvs\n$inPlan")
  }

  test("probe scan is partition-pruned to the nprobe cells") {
    val qvec = Tables(spark, Sf0001, "embeddings").filter(col("vec_id") === 0)
      .select("embedding").as[Array[Float]].head()
    val probe = Similarity.ivfProbe(spark, indexDir, qvec, nprobe = 4, k = 5)
    val explained = probe.queryExecution.executedPlan.toString
    assert(explained.contains("PartitionFilters"),
      s"expected a cell partition filter:\n$explained")
    assert(probe.collect().length == 5)
    val scan = probe.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scan.isDefined)
    val allFiles = spark.read.parquet(s"$indexDir/cells").inputFiles.length
    val readFiles = scan.get.metrics("numFiles").value
    // 4 of 16 cells probed; each cell holds >= 1 parquet file. The probe
    // must read strictly fewer files than the full index holds.
    assert(readFiles < allFiles,
      s"probe read $readFiles of $allFiles files — no pruning happened")
    val cellDirs = new java.io.File(s"$indexDir/cells").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cellDirs > 4, s"index must span more than nprobe cells, got $cellDirs")
  }

  test("trained index (k-means centroids) keeps the format and probes stay partition-pruned") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_km_").toFile.getAbsolutePath
    Similarity.writeIvfIndex(Tables(spark, Sf0001, "embeddings"), dir, trainIters = 3)
    val idx = spark.read.parquet(s"$dir/cells")
    assert(idx.columns.toSet == Set("vec_id", "label", "embedding", "nrm", "cell"),
      "trained index must keep the exact cells schema")
    assert(spark.read.parquet(s"$dir/centroids").columns.toSet ==
      Set("cent_id", "cvec", "cnorm"), "trained index must keep the centroid schema")
    assert(idx.count() == Tables(spark, Sf0001, "embeddings").count())
    val qvec = Tables(spark, Sf0001, "embeddings").filter(col("vec_id") === 0)
      .select("embedding").as[Array[Float]].head()
    val probe = Similarity.ivfProbe(spark, dir, qvec, nprobe = 4, k = 5)
    assert(probe.collect().length == 5)
    assert(probe.queryExecution.executedPlan.toString.contains("PartitionFilters"),
      "trained-index probes must still partition-prune")
    // training is deterministic: a second run writes byte-identical centroids
    val dir2 = java.nio.file.Files.createTempDirectory("graft_ivf_km2_").toFile.getAbsolutePath
    Similarity.writeIvfIndex(Tables(spark, Sf0001, "embeddings"), dir2, trainIters = 3)
    val c1 = spark.read.parquet(s"$dir/centroids").orderBy("cent_id")
      .as[(Long, Array[Float], Double)].collect().toSeq
    val c2 = spark.read.parquet(s"$dir2/centroids").orderBy("cent_id")
      .as[(Long, Array[Float], Double)].collect().toSeq
    assert(c1.map(_._1) == c2.map(_._1) &&
      c1.zip(c2).forall { case (a, b) => a._2.sameElements(b._2) && a._3 == b._3 },
      "k-means training must be bit-deterministic across runs")
  }

  test("index write partitions by cell and carries precomputed norms") {
    val idx = spark.read.parquet(s"$indexDir/cells")
    assert(idx.columns.toSet == Set("vec_id", "label", "embedding", "nrm", "cell"))
    assert(idx.count() == Tables(spark, Sf0001, "embeddings").count())
    // norms must equal the live normD fold (bit-identical)
    val bad = idx.filter(col("nrm") =!= Similarity.normD(col("embedding"))).count()
    assert(bad == 0, s"$bad stored norms diverge from a live recompute")
  }
}
