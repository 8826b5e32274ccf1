package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Product-quantization invariants (sim_pq_adc is rows-only at the driver
  * gate — iterative k-means has no portable SQL form — so this spec IS its
  * correctness gate, the BPE precedent):
  *  - codes are deterministic and partitioning-invariant;
  *  - 2 Lloyd iterations do not worsen reconstruction error vs the seed
  *    codebooks (the k-means objective is non-increasing; micro-quantized
  *    means get an epsilon of slack);
  *  - the distributed ADC score equals the driver-side
  *    q·recon / (‖recon‖‖q‖) identity within nano-quantization tolerance;
  *  - ADC top-k overlaps the exact cosine top-k (recall floor measured on
  *    this corpus — near-random vectors are the hardest case for PQ).
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables(spark, Sf0001, "embeddings")
  private lazy val cb = Similarity.trainPqCodebooks(emb, iters = 2)

  private def cbMap(cbDf: org.apache.spark.sql.DataFrame): Map[(Long, Long), Array[Double]] =
    cbDf.select($"m", $"cent_id", $"cvec").as[(Long, Long, Seq[Float])]
      .collect().map { case (m, c, v) => (m, c) -> v.map(_.toDouble).toArray }.toMap

  private lazy val vecs: Map[Long, Array[Double]] =
    emb.select($"vec_id", $"embedding").as[(Long, Seq[Float])]
      .collect().map { case (id, v) => id -> v.map(_.toDouble).toArray }.toMap

  private def codesOf(e: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
    Similarity.pqEncode(e, cb).as[(Long, Seq[Long])].collect().toMap

  private def recon(codes: Seq[Long], book: Map[(Long, Long), Array[Double]]): Array[Double] =
    codes.zipWithIndex.flatMap { case (c, m) => book((m.toLong, c)) }.toArray

  private def mse(book: Map[(Long, Long), Array[Double]], codes: Map[Long, Seq[Long]]): Double = {
    val errs = vecs.toSeq.map { case (id, v) =>
      val r = recon(codes(id), book)
      v.zip(r).map { case (a, b) => (a - b) * (a - b) }.sum
    }
    errs.sum / errs.size
  }

  test("codes are deterministic, partitioning-invariant, and in the seeded id range") {
    val a = codesOf(emb)
    val b = codesOf(emb.repartition(7))
    assert(a == b, "codes changed with partitioning")
    assert(a.values.forall(c => c.length == Similarity.PqM &&
      c.forall(x => x >= 1 && x <= Similarity.PqK)))
    assert(a.keySet == vecs.keySet, "every vector must be encoded")
  }

  test("2 Lloyd iterations do not worsen reconstruction error vs seed codebooks") {
    val cb0 = Similarity.trainPqCodebooks(emb, iters = 0)
    val mse0 = mse(cbMap(cb0),
      Similarity.pqEncode(emb, cb0).as[(Long, Seq[Long])].collect().toMap)
    val mse2 = mse(cbMap(cb), codesOf(emb))
    assert(mse2 <= mse0 * 1.0001,
      s"training worsened reconstruction: $mse2 vs seed $mse0")
    assert(mse2 < mse0, s"training had no effect at all: $mse2 vs $mse0")
  }

  test("distributed ADC score equals the q·recon/(|recon||q|) identity") {
    val q = vecs(0L)
    val book = cbMap(cb)
    val codes = codesOf(emb)
    val got = Similarity
      .pqAdcTopK(emb, cb, q.map(_.toFloat), k = 500, excludeVecId = 0L)
      .select($"vec_id", $"adc_sim").as[(Long, Double)].collect().toMap
    val qn = math.sqrt(q.map(x => x * x).sum)
    got.foreach { case (id, sim) =>
      val r = recon(codes(id), book)
      val expect = q.zip(r).map { case (a, b) => a * b }.sum /
        (math.sqrt(r.map(x => x * x).sum) * qn)
      assert(math.abs(sim - expect) < 1e-6, s"vec $id: $sim vs $expect")
    }
  }

  test("ADC top-k overlaps the exact cosine top-k (measured recall floor)") {
    val q = vecs(0L)
    val qn = math.sqrt(q.map(x => x * x).sum)
    val exact = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) =>
        (id, q.zip(v).map { case (a, b) => a * b }.sum /
          (math.sqrt(v.map(x => x * x).sum) * qn))
      }
      .sortBy { case (id, s) => (-s, id) }.take(20).map(_._1).toSet
    val adc = Similarity.pqAdcTopK(emb, cb, q.map(_.toFloat), k = 20, excludeVecId = 0L)
      .select($"vec_id").as[Long].collect().toSet
    val recall = exact.intersect(adc).size.toDouble / exact.size
    // Near-random 64-d vectors are PQ's worst case (no cluster structure
    // to exploit); the floor is set from measurement, the AnnRecallSpec
    // calibration practice. A collapse to ~0 means codes carry no signal.
    assert(recall >= 0.15, s"ADC recall@20 collapsed: $recall")
  }
}
