package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Recall@5 gate for the ANN variants vs exact brute force, over ALL
  * query points at sf0.1 — guards silent recall collapse that the
  * one-query-point oracle hash check cannot see.
  *
  * The sweep runs in-JVM over the collected vectors (2000 × 64 floats):
  * the cosine fold replicates [[Similarity.dotD]]'s left-to-right double
  * accumulation bit-for-bit, and buckets/cells come from the SAME Spark
  * columns the registered queries use, so a bridge test pins the JVM
  * replica to the actual `sim_ann_*` query output for query point 0.
  *
  * Floor calibration (measured on this corpus, which is near-random —
  * mean top-1 cosine ≈ 0.41, so high absolute recall is structurally
  * unreachable for any sublinear method; these floors guard REGRESSION):
  *   - LSH single-bucket ≈ 0.05; 1-bit multi-probe ≈ 0.17 at ~3.5% of
  *     the corpus scanned → floors 0.12 and ≥ 2× single.
  *   - IVF nprobe=4 of 16 cells ≈ 0.51 at ~25% scanned → floor 0.40.
  */
class AnnRecallSpec extends SparkSpec {
  import spark.implicits._

  private val Sf01 = "/root/testdata/sf0.1"
  private val K = 5

  // (vec_id ascending) vectors + the Spark-computed LSH bucket per vector
  private lazy val corpus: Array[(Long, Array[Float], Long)] =
    Tables(spark, Sf01, "embeddings")
      .withColumn("bucket", Similarity.lshBucket(col("embedding")))
      .select("vec_id", "embedding", "bucket")
      .as[(Long, Array[Float], Long)]
      .collect().sortBy(_._1)

  /** Left-to-right double fold — the exact arithmetic of Similarity.dotD. */
  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }
  private def nrm(a: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * a(i).toDouble; i += 1 }
    math.sqrt(s)
  }

  private lazy val vecs = corpus.map(_._2)
  private lazy val norms = vecs.map(nrm)
  private lazy val buckets = corpus.map(_._3)
  private def cos(i: Int, j: Int): Double = dot(vecs(i), vecs(j)) / (norms(i) * norms(j))

  /** Top-K candidate indices by (cosine desc, vec_id asc) — the ordering
    * every registered ann query uses. */
  private def topK(q: Int, cands: Iterable[Int]): Seq[Int] =
    cands.filter(_ != q).map(j => (cos(q, j), j)).toSeq
      .sortBy { case (s, j) => (-s, j) }.take(K).map(_._2)

  private lazy val bruteTopK: Array[Seq[Int]] =
    Array.tabulate(vecs.length)(q => topK(q, vecs.indices))

  private def recallOf(candsOf: Int => Iterable[Int]): (Double, Double) = {
    val n = vecs.length
    var hit = 0L; var candTotal = 0L
    for (q <- vecs.indices) {
      val cands = candsOf(q).toSet
      candTotal += cands.size
      hit += bruteTopK(q).count(cands.contains)
    }
    (hit.toDouble / (n.toLong * K), candTotal.toDouble / n)
  }

  private lazy val byBucket: Map[Long, Seq[Int]] =
    vecs.indices.groupBy(buckets(_)).map { case (b, is) => b -> is.toSeq }

  test("multi-probe LSH recall@5 clears the floor and beats single-bucket >= 2x") {
    val (single, _) = recallOf(q => byBucket.getOrElse(buckets(q), Nil))
    val (multi, avgCands) = recallOf { q =>
      val probes = buckets(q) +: (0 until Similarity.LshPlanes).map(j => buckets(q) ^ (1L << j))
      probes.flatMap(byBucket.getOrElse(_, Nil))
    }
    assert(multi >= 0.12, s"multi-probe recall collapsed: $multi")
    assert(multi >= 2 * single, s"multi-probe ($multi) must beat single-bucket ($single) >= 2x")
    assert(avgCands <= vecs.length * 0.10,
      s"multi-probe must stay sublinear: avg $avgCands candidates of ${vecs.length}")
  }

  test("IVF nprobe=4 recall@5 clears the floor while pruning >= half the corpus") {
    // centroids are vec_id 1..16 exactly as sim_ann_ivf defines them;
    // assignment tie-breaks to the smaller centroid id (max(struct) trick)
    val centIdx = (1 to 16).toArray
    def centSims(q: Int): Array[Double] = centIdx.map(c => cos(q, c))
    val assign: Array[Int] = vecs.indices.map { i =>
      val s = centSims(i)
      s.indices.maxBy(c => (s(c), -(c + 1).toDouble))
    }.toArray
    val byCell = vecs.indices.groupBy(assign(_))
    val (recall, avgCands) = recallOf { q =>
      val s = centSims(q)
      val probes = s.indices.sortBy(c => (-s(c), c)).take(4)
      probes.flatMap(byCell.getOrElse(_, Nil))
    }
    assert(recall >= 0.40, s"IVF recall collapsed: $recall")
    assert(avgCands <= vecs.length * 0.50,
      s"IVF nprobe=4/16 must prune: avg $avgCands candidates of ${vecs.length}")
  }

  test("bridge: JVM replica matches the registered sim_ann_lsh and sim_cosine_topk for q=0") {
    val ids = corpus.map(_._1)
    val brute = bruteTopK(0).map(ids(_))
    val sparkBrute = SparkEntry.queries("sim_cosine_topk")(spark, Sf01)
      .select("vec_id").as[Long].collect().toSeq
    assert(sparkBrute == brute, s"brute: spark=$sparkBrute jvm=$brute")

    val probes = (buckets(0) +: (0 until Similarity.LshPlanes).map(j => buckets(0) ^ (1L << j))).toSet
    val lshCands = vecs.indices.filter(i => probes.contains(buckets(i)))
    val lsh = topK(0, lshCands).map(ids(_))
    val sparkLsh = SparkEntry.queries("sim_ann_lsh")(spark, Sf01)
      .select("vec_id").as[Long].collect().toSeq
    assert(sparkLsh == lsh, s"lsh: spark=$sparkLsh jvm=$lsh")
  }
}
