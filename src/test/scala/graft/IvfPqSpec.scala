package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Combined IVF+PQ (IVFADC) index: write-once cells carrying 4-bit codes
  * instead of float vectors, partition-pruned ADC probes. */
class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables(spark, Sf0001, "embeddings")

  private lazy val indexDir = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_").toFile.getAbsolutePath
    Similarity.writeIvfPqIndex(emb, dir)
    dir
  }

  private lazy val qvec: Array[Float] =
    emb.filter(col("vec_id") === 0).select("embedding").as[Array[Float]].head()

  test("index cells carry codes only — no float vectors (the 64x shrink)") {
    val idx = spark.read.parquet(s"$indexDir/cells")
    assert(idx.columns.toSet == Set("vec_id", "label", "codes", "cell"),
      s"unexpected cells schema: ${idx.columns.mkString(",")}")
    assert(idx.count() == emb.count())
    assert(spark.read.parquet(s"$indexDir/codebooks").count() ==
      Similarity.PqM.toLong * Similarity.PqK)
  }

  test("probe equals unrestricted ADC ranking filtered to the probed cells") {
    // Recompute the nprobe cell choice with the same public data and the
    // same left-to-right fold, then: probe ≡ full-corpus ADC ranking
    // restricted to vectors assigned to those cells, top-5.
    def fold(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val qn = math.sqrt(fold(qvec, qvec))
    val chosen = spark.read.parquet(s"$indexDir/centroids")
      .select($"cent_id", $"cvec", $"cnorm").as[(Long, Seq[Float], Double)].collect()
      .map { case (id, cv, cn) => (fold(qvec, cv.toArray) / (qn * cn), id) }
      .sortBy { case (s, id) => (-s, id) }.take(4).map(_._2).toSet
    val cellOf = spark.read.parquet(s"$indexDir/cells")
      .select($"vec_id", $"cell").as[(Long, Long)].collect().toMap
    val cb = Similarity.trainPqCodebooks(emb, iters = 2)
    val fullAdc = Similarity.pqAdcTopK(emb, cb, qvec, k = 500, excludeVecId = 0L)
      .select($"vec_id", $"label", $"adc_sim").as[(Long, Long, Double)].collect().toSeq
    val probed = Similarity.ivfPqProbe(spark, indexDir, qvec, excludeVecId = Some(0L))
      .select($"vec_id", $"label", $"adc_sim").as[(Long, Long, Double)].collect().toSeq
    assert(probed.size == 5)
    val expected = fullAdc.filter(r => chosen.contains(cellOf(r._1))).take(5)
    assert(probed == expected,
      s"probe diverged from restricted full ranking:\n$probed\nvs\n$expected")
  }

  test("probe scan is partition-pruned to the nprobe cells") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    // Unlike ivfProbe's exchange-free plan, the ADC join/agg pipeline runs
    // under AQE, so the file scans hide inside query stages — recurse.
    def allScans(p: SparkPlan): Seq[FileSourceScanExec] = p.flatMap {
      case q: QueryStageExec => allScans(q.plan)
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case f: FileSourceScanExec => Seq(f)
      case _ => Nil
    }
    val probe = Similarity.ivfPqProbe(spark, indexDir, qvec, nprobe = 4, k = 5)
    assert(probe.collect().length == 5)
    val scan = allScans(probe.queryExecution.executedPlan)
      .find(f => f.relation.partitionSchema.fieldNames.contains("cell"))
    assert(scan.isDefined, "no partitioned cells scan found in the probe plan")
    assert(scan.get.toString.contains("PartitionFilters"),
      s"expected a cell partition filter:\n${scan.get}")
    val allFiles = spark.read.parquet(s"$indexDir/cells").inputFiles.length
    val readFiles = scan.get.metrics("numFiles").value
    assert(readFiles < allFiles,
      s"probe read $readFiles of $allFiles files — no pruning happened")
  }

  test("index write is deterministic: a second write yields identical codes") {
    val dir2 = java.nio.file.Files.createTempDirectory("graft_ivfpq2_").toFile.getAbsolutePath
    Similarity.writeIvfPqIndex(emb, dir2)
    def codes(d: String) = spark.read.parquet(s"$d/cells")
      .select($"vec_id", $"codes", $"cell").as[(Long, Seq[Long], Long)]
      .collect().toSeq.sortBy(_._1)
    assert(codes(indexDir) == codes(dir2), "IVFPQ index write is nondeterministic")
  }
}
