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
    * into equal windows. Replace with a real codec for production. */
  object StubCodec extends MediaCodec {
    val Dim = 16
    override def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
      batch.map { r =>
        val f = new Array[Float](Dim)
        var h = 17L
        var i = 0
        while (i < r.bytes.length) {
          h = (h * 31 + (r.bytes(i) & 0xff)) % 1000003L
          f(i % Dim) += (h % 1000).toFloat / 1000f
          i += 1
        }
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
    * table (text bytes as payload) — the offline stand-in for a real
    * binary-column source. */
  def syntheticMedia(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .map { case (id, text, n) =>
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        MediaRecord(id, kind, text.getBytes("UTF-8"),
          MediaMeta(s"application/x-$kind", (n % 640).toInt + 16, 480, 16000, n * 10))
      }
  }
}
