package graft.multimodal

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns — images/audio/video as opaque `binary` columns with
  * typed metadata (the north-star training-data-pipeline mandate).
  *
  * The Spark-side plumbing is real: fixed schemas, typed Datasets,
  * partition-preserving `mapPartitions` with explicit batch shape (the
  * Scala analogue of an iterator-of-batches Pandas UDF — each underlying
  * codec call amortizes over `batchSize` records, mirroring how a
  * vectorized UDF receives Arrow batches). The CODEC itself is stubbed:
  * this container has no image/audio libraries, so `decodeStub` derives a
  * deterministic feature vector from the bytes — swap [[MediaCodec]] for a
  * real implementation in production; nothing else changes.
  */
object Multimodal {

  /** Typed metadata carried alongside the opaque payload. */
  final case class MediaMeta(
      mime: String,
      width: Int,
      height: Int,
      sample_rate: Int,
      duration_ms: Long)

  /** One media object: id + kind (image|audio|video) + raw bytes + meta. */
  final case class MediaRecord(
      media_id: Long,
      kind: String,
      bytes: Array[Byte],
      meta: MediaMeta)

  final case class MediaFeatures(media_id: Long, kind: String, features: Array[Float])

  final case class MediaFrame(media_id: Long, frame_idx: Int, frame_ms: Long, bytes: Array[Byte])

  /** The pluggable decode boundary. A production impl wraps a real codec
    * (e.g. javacv / TwelveMonkeys); the default is a deterministic fake so
    * the pipeline is testable offline. */
  trait MediaCodec extends Serializable {
    def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures]
    def resize(rec: MediaRecord, w: Int, h: Int): MediaRecord
    def sampleFrames(rec: MediaRecord, everyMs: Long): Seq[MediaFrame]
  }

  /** STUB codec — deterministic, no external libs. Features are a 16-dim
    * rolling-hash profile of the payload; resize rewrites meta and
    * truncates the payload proportionally; frame sampling cuts the payload
    * into equal windows. Replace with a real codec for production.
    *
    * Numeric discipline (same as [[graft.Qh]]): the whole decode is exact
    * 64-bit integer arithmetic — per-dim Long accumulators of
    * `(prefixHash % 1000)`, with ONE terminal float division per dim.
    * Accumulators stay < 2^24 for any sane payload, so `toFloat` is exact
    * and the only IEEE op is the division — bit-identical to the DuckDB
    * oracle mirror (see the `mm_decode_features` query). */
  object StubCodec extends MediaCodec {
    val Dim = 16
    /** Exact per-dim Long accumulators — the integer "milli-features"
      * (`features(j) == accMillis(bytes)(j).toFloat / 1000f`). Exposed so
      * the oracle gate can compare INTEGERS: a `list<float>` result column
      * is unhashable on the comparison side, and reconstructing the
      * integer from the float (`round(f*1000)`) is only exact while the
      * accumulator stays under ~2^23 — sharing the accumulator is exact
      * unconditionally. Parity with [[decodeBatch]] is spec-asserted. */
    def accMillis(bytes: Array[Byte]): Array[Long] = {
      val acc = new Array[Long](Dim)
      var h = 17L
      var i = 0
      while (i < bytes.length) {
        h = (h * 31 + (bytes(i) & 0xff)) % 1000003L
        acc(i % Dim) += h % 1000L
        i += 1
      }
      acc
    }
    override def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
      batch.map { r =>
        val acc = accMillis(r.bytes)
        val f = new Array[Float](Dim)
        var j = 0
        while (j < Dim) { f(j) = acc(j).toFloat / 1000f; j += 1 }
        MediaFeatures(r.media_id, r.kind, f)
      }
    override def resize(r: MediaRecord, w: Int, h: Int): MediaRecord = {
      val scale = math.min(1.0,
        (w.toLong * h).toDouble / math.max(1.0, (r.meta.width.toLong * r.meta.height).toDouble))
      r.copy(
        bytes = r.bytes.take(math.max(1, (r.bytes.length * scale).toInt)),
        meta = r.meta.copy(width = w, height = h))
    }
    override def sampleFrames(r: MediaRecord, everyMs: Long): Seq[MediaFrame] = {
      val n = math.max(1, (r.meta.duration_ms / math.max(1, everyMs)).toInt)
      val win = math.max(1, r.bytes.length / n)
      (0 until n).map(i =>
        MediaFrame(r.media_id, i, i * everyMs, r.bytes.slice(i * win, (i + 1) * win)))
    }
  }

  /** Reference-shaped batch size: one codec call per `batchSize` records
    * (the HF/OpenAI enrichments batch 10/100; vectorized UDFs batch by
    * Arrow chunk — same amortization idea). */
  val DefaultBatchSize = 32

  /** Decode → fixed-size feature vectors. Partition-preserving; one
    * `decodeBatch` call per `batchSize` records per partition. */
  def decodeFeatures(ds: Dataset[MediaRecord], codec: MediaCodec = StubCodec,
      batchSize: Int = DefaultBatchSize): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(batchSize).flatMap(g => codec.decodeBatch(g)))
  }

  /** Integer projection of [[decodeFeatures]] for the oracle gate: one row
    * per (media_id, dim) carrying the exact pre-division accumulator
    * (`feat_milli * 1e-3 == features(dim)`). Same batched mapPartitions
    * shape as [[decodeFeatures]]; exists because a `array<float>` column
    * cannot be hashed by the comparison harness. The float-list Dataset
    * API is unchanged — this is gate plumbing, not a second decode. */
  def decodeFeatureMillis(ds: Dataset[MediaRecord]): Dataset[(Long, String, Int, Long)] = {
    import ds.sparkSession.implicits._
    // Per-record pass, no grouped() façade: the integer projection calls
    // the stub accumulator directly (the BATCHED decode boundary lives in
    // decodeFeatures; MultimodalSpec asserts this projection ==
    // decodeFeatures' floats * 1000 exactly).
    ds.mapPartitions(_.flatMap { r =>
      val acc = StubCodec.accMillis(r.bytes)
      acc.indices.map(j => (r.media_id, r.kind, j, acc(j)))
    })
  }

  /** Resize every image payload; non-images pass through untouched. */
  def resizeImages(ds: Dataset[MediaRecord], w: Int, h: Int,
      codec: MediaCodec = StubCodec): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.map(r => if (r.kind == "image") codec.resize(r, w, h) else r)
  }

  /** Explode videos/audio into sampled frames (flatMap — output may be
    * larger than input; partitioning of the input is preserved). */
  def sampleFrames(ds: Dataset[MediaRecord], everyMs: Long,
      codec: MediaCodec = StubCodec): Dataset[MediaFrame] = {
    import ds.sparkSession.implicits._
    ds.flatMap(r => codec.sampleFrames(r, everyMs))
  }

  /** Deterministic synthetic media corpus derived from the `documents`
    * table — the offline stand-in for a real binary-column source.
    *
    * Payload = one byte per UTF-16 unit, the unit's low 7 bits. NOT
    * `getBytes("UTF-8")`: the DuckDB oracles walk CHARACTERS (`ascii(c)
    * & 127` mirrors the clamp exactly for the whole BMP), while UTF-8
    * would emit multiple bytes per non-ASCII char and silently diverge
    * the moment the generated corpus stops being pure ASCII. */
  def syntheticMedia(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .map { case (id, text, n) =>
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        val payload = new Array[Byte](text.length)
        var i = 0
        while (i < text.length) { payload(i) = (text.charAt(i) & 0x7f).toByte; i += 1 }
        MediaRecord(id, kind, payload,
          MediaMeta(s"application/x-$kind", (n % 640).toInt + 16, 480, 16000, n * 10))
      }
  }

  import graft.QueryDef

  /** Oracle-gated multimodal queries. [[StubCodec]] is exact integer
    * arithmetic, so both the decode and the frame explosion have full
    * DuckDB mirrors: the binary-column PIPELINE (schema, batched decode,
    * frame explode) is verified end to end even though the codec is the
    * documented offline stub.
    *
    * The decode oracle mirrors the rolling hash algebraically: with
    * p = 1000003 and inv31 = 31^(p-2) mod p = 193549,
    *   h_i = (17·31^(i+1) + 31^i · Σ_{j≤i} b_j·inv31^j) mod p
    * turns the sequential fold into a windowed prefix sum over
    * position-joined power tables (one tiny recursive CTE). */
  val defs: Seq[(String, QueryDef)] = Seq(
    "mm_decode_features" -> QueryDef(
      (s, d) => {
        decodeFeatureMillis(syntheticMedia(s, d))
          .toDF("media_id", "kind", "dim", "feat_milli")
          .orderBy("media_id", "dim")
      },
      Some("""WITH RECURSIVE pw(i, p31, pinv) AS (
             |  SELECT 0, CAST(1 AS BIGINT), CAST(1 AS BIGINT)
             |  UNION ALL
             |  SELECT i + 1, (p31 * 31) % 1000003, (pinv * 193549) % 1000003
             |  FROM pw WHERE i <= (SELECT max(length(text)) FROM documents)
             |),
             |b AS (
             |  SELECT doc_id,
             |    CAST(ascii(substring(text, CAST(pos AS INT) + 1, 1)) & 127 AS BIGINT) AS byte,
             |    pos
             |  FROM (SELECT doc_id, text, unnest(range(0, length(text))) AS pos
             |        FROM documents WHERE length(text) > 0)
             |),
             |s AS (
             |  SELECT b.doc_id, b.pos,
             |    sum((b.byte * pw.pinv) % 1000003)
             |      OVER (PARTITION BY b.doc_id ORDER BY b.pos) % 1000003 AS sp
             |  FROM b JOIN pw ON pw.i = b.pos
             |),
             |h AS (
             |  SELECT s.doc_id, s.pos, (17 * p1.p31 + p0.p31 * s.sp) % 1000003 AS hv
             |  FROM s JOIN pw p0 ON p0.i = s.pos JOIN pw p1 ON p1.i = s.pos + 1
             |),
             |g AS (
             |  SELECT doc_id, CAST(pos % 16 AS INT) AS dim, sum(hv % 1000) AS sg
             |  FROM h GROUP BY 1, 2
             |),
             |grid AS (
             |  SELECT doc_id, unnest(range(0, 16)) AS dim FROM documents
             |),
             |fv AS (
             |  SELECT grid.doc_id, grid.dim, COALESCE(g.sg, 0) AS sg
             |  FROM grid LEFT JOIN g ON g.doc_id = grid.doc_id AND g.dim = grid.dim
             |)
             |SELECT doc_id AS media_id,
             |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
             |    ELSE 'video' END AS kind,
             |  CAST(dim AS INT) AS dim, CAST(sg AS BIGINT) AS feat_milli
             |FROM fv ORDER BY media_id, dim""".stripMargin),
      doc = "Batched binary-column decode to fixed-dim features via the " +
        "deterministic stub codec; DuckDB mirror of the full rolling hash. " +
        "Gated as exploded exact integers (feat_milli = features*1000)"),

    "mm_frame_sample" -> QueryDef(
      (s, d) => {
        sampleFrames(syntheticMedia(s, d), 1000L).toDF()
          .select(col("media_id"), col("frame_idx"), col("frame_ms"),
            length(col("bytes")).as("nbytes"))
          .orderBy("media_id", "frame_idx")
      },
      Some("""WITH m AS (
             |  SELECT doc_id, length(text) AS len,
             |    greatest(1, divide(n_chars * 10, 1000)) AS n
             |  FROM documents
             |),
             |f AS (
             |  SELECT doc_id, len, n, greatest(1, divide(len, n)) AS win,
             |    unnest(range(0, n)) AS fi
             |  FROM m
             |)
             |SELECT doc_id AS media_id, CAST(fi AS INT) AS frame_idx,
             |  fi * 1000 AS frame_ms,
             |  CAST(greatest(0, least(len, (fi + 1) * win) - least(len, fi * win)) AS INT) AS nbytes
             |FROM f ORDER BY media_id, frame_idx""".stripMargin),
      doc = "Frame-sampling explosion of video/audio payloads into equal " +
        "byte windows; output size is data-dependent (flatMap)"))
}
