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
  *   - LSH single-bucket ≈ 0.05; 1 table × 1-bit probes ≈ 0.17 at ~7%;
  *     the REGISTERED config (2 tables × 2-bit probes) ≈ 0.55 at ~30%
  *     scanned → floor 0.50.
  *   - IVF nprobe=4 of 16 cells ≈ 0.51 at ~25% scanned → floor 0.40.
  */
class AnnRecallSpec extends SparkSpec {
  import spark.implicits._

  private val Sf01 = "/root/testdata/sf0.1"
  private val K = 5

  // (vec_id ascending) vectors + the Spark-computed LSH bucket per vector
  // in each of the two hash tables
  private lazy val corpus: Array[(Long, Array[Float], Long, Long)] =
    Tables(spark, Sf01, "embeddings")
      .withColumn("b0", Similarity.lshBucket(col("embedding"), 0))
      .withColumn("b1", Similarity.lshBucket(col("embedding"), 1))
      .select("vec_id", "embedding", "b0", "b1")
      .as[(Long, Array[Float], Long, Long)]
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
  private lazy val buckets1 = corpus.map(_._4)
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
  private lazy val byBucket1: Map[Long, Seq[Int]] =
    vecs.indices.groupBy(buckets1(_)).map { case (b, is) => b -> is.toSeq }

  /** The registered probe set: exact + 1-bit + 2-bit flips (probeBuckets2). */
  private def probes2(b: Long): Seq[Long] = {
    val p = Similarity.LshPlanes
    b +: ((0 until p).map(j => b ^ (1L << j)) ++
      (for { j <- 0 until p; k <- j + 1 until p } yield b ^ (1L << j) ^ (1L << k)))
  }

  /** Candidate set of the REGISTERED sim_ann_lsh config: union over both
    * hash tables of the 2-bit probe neighborhoods. */
  private def lshCandidates(q: Int): Seq[Int] =
    (probes2(buckets(q)).flatMap(byBucket.getOrElse(_, Nil)) ++
      probes2(buckets1(q)).flatMap(byBucket1.getOrElse(_, Nil))).distinct

  test("registered LSH config (2 tables x 2-bit probes) recall@5 >= 0.5, sublinear") {
    val (single, _) = recallOf(q => byBucket.getOrElse(buckets(q), Nil))
    val (multi, avgCands) = recallOf(lshCandidates)
    assert(multi >= 0.50, s"registered-config recall collapsed: $multi")
    assert(multi >= 2 * single, s"multi-probe ($multi) must beat single-bucket ($single) >= 2x")
    assert(avgCands <= vecs.length * 0.35,
      s"probing must stay a corpus subset: avg $avgCands candidates of ${vecs.length}")
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

  /** Recall@5 and avg candidate count of an IVF configuration given its
    * centroid vectors (JVM replica of assignCells' cosine arg-max with
    * the same smaller-id tie-break). */
  private def ivfRecall(cents: Array[Array[Float]], nprobe: Int): (Double, Double) = {
    val cnorms = cents.map(nrm)
    def centSims(q: Int): Array[Double] =
      cents.indices.toArray.map(c => dot(vecs(q), cents(c)) / (norms(q) * cnorms(c)))
    val assign: Array[Int] = vecs.indices.map { i =>
      val s = centSims(i)
      s.indices.maxBy(c => (s(c), -(c + 1).toDouble))
    }.toArray
    val byCell = vecs.indices.groupBy(assign(_))
    recallOf { q =>
      val s = centSims(q)
      s.indices.sortBy(c => (-s(c), c)).take(nprobe).flatMap(byCell.getOrElse(_, Nil))
    }
  }

  test("trained IVF centroids: recall@5 at nprobe=4 >= the fixed-seed recall, still pruning") {
    val fixed = (1 to 16).map(vecs(_)).toArray // seeds ARE corpus vectors 1..16
    val trained = Similarity.trainCentroids(Tables(spark, Sf01, "embeddings"))
      .select("cent_id", "cvec").as[(Long, Array[Float])]
      .collect().sortBy(_._1).map(_._2)
    val (recallFixed, _) = ivfRecall(fixed, nprobe = 4)
    val (recallTrained, candsTrained) = ivfRecall(trained, nprobe = 4)
    info(f"fixed=$recallFixed%.3f trained=$recallTrained%.3f avgCands=$candsTrained%.0f/${vecs.length}")
    assert(recallTrained >= recallFixed,
      f"k-means must not lose recall at equal nprobe: trained=$recallTrained%.3f < fixed=$recallFixed%.3f")
    assert(candsTrained <= vecs.length * 0.50,
      s"trained IVF must still prune: avg $candsTrained of ${vecs.length}")
  }

  test("bridge: JVM replica matches the registered sim_ann_lsh and sim_cosine_topk for q=0") {
    val ids = corpus.map(_._1)
    val brute = bruteTopK(0).map(ids(_))
    val sparkBrute = SparkEntry.queries("sim_cosine_topk")(spark, Sf01)
      .select("vec_id").as[Long].collect().toSeq
    assert(sparkBrute == brute, s"brute: spark=$sparkBrute jvm=$brute")

    val lsh = topK(0, lshCandidates(0)).map(ids(_))
    val sparkLsh = SparkEntry.queries("sim_ann_lsh")(spark, Sf01)
      .select("vec_id").as[Long].collect().toSeq
    assert(sparkLsh == lsh, s"lsh: spark=$sparkLsh jvm=$lsh")
  }
}
