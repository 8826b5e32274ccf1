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
  * vectorized UDF receives Arrow batches). The IMAGE leg is a real codec:
  * [[ImageIoCodec]] decodes PNG/GIF/BMP through the in-JDK
  * `javax.imageio` and emits exact integer pixel-channel aggregates.
  * Audio/video remain stubbed ([[StubCodec]] derives a deterministic
  * feature vector from the raw bytes — this container has no a/v codec
  * libraries); swap [[MediaCodec]] for a full implementation in
  * production and nothing else changes.
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

  /** REAL image codec over the in-JDK `javax.imageio` (PNG/GIF/BMP
    * decode — zero dependencies beyond the JDK). The image half of the
    * media boundary is genuinely decoded: features are exact integer
    * pixel-channel aggregates in [[StubCodec]]'s milli discipline
    * (per-dim Long accumulators, one terminal /1000f per dim — exact
    * `toFloat` while accumulators stay < 2^24, i.e. any image up to
    * ~64×64 at full channel range; the planted-PNG spec stays far
    * inside). Non-image kinds and undecodable payloads fall back to the
    * stub — audio/video remain the HONESTLY stubbed boundary (no codec
    * libs in this container), exactly as documented.
    *
    * Feature map (dim → accumulator/1000):
    *  0 width, 1 height, 2 pixel count (each ×1000 → exact),
    *  3 ΣR, 4 ΣG, 5 ΣB, 6 ΣA (channel sums, 0..255 per pixel),
    *  7 Σ luma where luma = (299R+587G+114B) div 1000 (integer),
    *  8 count(luma ≥ 128) ×1000, 9 min luma ×1000, 10 max luma ×1000,
    *  11 Σ luma over the left half (x < w div 2),
    *  12 Σ luma over the top half (y < h div 2),
    *  13 count(A = 255) ×1000,
    *  14 PolyHash of the row-major (R,G,B) byte stream mod 1000003,
    *  15 PolyHash of the row-major A byte stream mod 1000003.
    * Deterministic by construction: row-major traversal of getRGB. */
  object ImageIoCodec extends MediaCodec {
    val Dim = StubCodec.Dim

    private def decode(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      catch { case _: java.io.IOException => None }

    /** Exact integer milli-accumulators of a decoded image (the
      * [[StubCodec.accMillis]] analogue; spec-pinned vs hand-computed
      * planted pixels). */
    def pixelAccMillis(img: java.awt.image.BufferedImage): Array[Long] = {
      val acc = new Array[Long](Dim)
      val w = img.getWidth
      val h = img.getHeight
      acc(0) = w.toLong * 1000L
      acc(1) = h.toLong * 1000L
      acc(2) = w.toLong * h * 1000L
      var minL = 255L
      var maxL = 0L
      var hRgb = 17L
      var hA = 17L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val argb = img.getRGB(x, y)
          val a = (argb >>> 24) & 0xff
          val r = (argb >>> 16) & 0xff
          val g = (argb >>> 8) & 0xff
          val b = argb & 0xff
          acc(3) += r; acc(4) += g; acc(5) += b; acc(6) += a
          val luma = (299L * r + 587L * g + 114L * b) / 1000L
          acc(7) += luma
          if (luma >= 128L) acc(8) += 1000L
          if (luma < minL) minL = luma
          if (luma > maxL) maxL = luma
          if (x < w / 2) acc(11) += luma
          if (y < h / 2) acc(12) += luma
          if (a == 255) acc(13) += 1000L
          hRgb = (((hRgb * 31 + r) * 31 + g) * 31 + b) % 1000003L
          hA = (hA * 31 + a) % 1000003L
          x += 1
        }
        y += 1
      }
      acc(9) = minL * 1000L
      acc(10) = maxL * 1000L
      acc(14) = hRgb
      acc(15) = hA
      acc
    }

    override def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
      batch.map { r =>
        val real = if (r.kind == "image") decode(r.bytes) else None
        real match {
          case Some(img) =>
            val acc = pixelAccMillis(img)
            val f = new Array[Float](Dim)
            var j = 0
            while (j < Dim) { f(j) = acc(j).toFloat / 1000f; j += 1 }
            MediaFeatures(r.media_id, r.kind, f)
          case None => StubCodec.decodeBatch(Seq(r)).head
        }
      }

    /** Real nearest-neighbor resize + deterministic JDK PNG re-encode.
      * NN is chosen over AWT's rendering-hint interpolation because its
      * pixel mapping `src = dst * srcDim div dstDim` is exact integer
      * arithmetic — bit-identical across JVMs. */
    override def resize(r: MediaRecord, w: Int, h: Int): MediaRecord =
      (if (r.kind == "image") decode(r.bytes) else None) match {
        case Some(img) =>
          val out = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_ARGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              out.setRGB(x, y, img.getRGB(
                (x.toLong * img.getWidth / w).toInt,
                (y.toLong * img.getHeight / h).toInt))
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          r.copy(bytes = bos.toByteArray, meta = r.meta.copy(width = w, height = h))
        case None => StubCodec.resize(r, w, h)
      }

    /** Frames are a video/audio concept — delegate to the stub (those
      * kinds are the documented stub boundary). */
    override def sampleFrames(r: MediaRecord, everyMs: Long): Seq[MediaFrame] =
      StubCodec.sampleFrames(r, everyMs)
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
