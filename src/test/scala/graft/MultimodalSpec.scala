package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal._
import org.apache.spark.sql.functions._

/** Multimodal plumbing: schema, determinism, batch shape, partitioning.
  * The codec is the documented stub; everything around it is real. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = syntheticMedia(spark, Sf0001)

  test("synthetic media corpus has the declared schema and kinds") {
    val schema = media.schema
    assert(schema("bytes").dataType == org.apache.spark.sql.types.BinaryType)
    assert(schema("meta").dataType.isInstanceOf[org.apache.spark.sql.types.StructType])
    val kinds = media.select("kind").distinct().as[String].collect().toSet
    assert(kinds == Set("image", "audio", "video"))
    assert(media.count() == 500)
  }

  test("decodeFeatures: fixed dim, deterministic across runs, partition-preserving") {
    val a = decodeFeatures(media).collect().map(f => f.media_id -> f.features.toSeq).toMap
    val b = decodeFeatures(media).collect().map(f => f.media_id -> f.features.toSeq).toMap
    assert(a == b, "decode must be deterministic")
    assert(a.values.forall(_.size == StubCodec.Dim))
    assert(decodeFeatures(media).rdd.getNumPartitions == media.rdd.getNumPartitions)
  }

  test("decodeFeatures batches: one codec call per batchSize records") {
    var calls = new java.util.concurrent.atomic.AtomicInteger()
    val counting = new MediaCodec {
      override def decodeBatch(b: Seq[MediaRecord]) = {
        assert(b.size <= 10); StubCodec.decodeBatch(b)
      }
      override def resize(r: MediaRecord, w: Int, h: Int) = StubCodec.resize(r, w, h)
      override def sampleFrames(r: MediaRecord, e: Long) = StubCodec.sampleFrames(r, e)
    }
    val out = decodeFeatures(media.repartition(2), counting, batchSize = 10)
    assert(out.count() == 500)
  }

  test("decodeFeatureMillis is the exact integer projection of decodeFeatures") {
    val floats = decodeFeatures(media).collect()
      .map(f => f.media_id -> f.features).toMap
    val millis = decodeFeatureMillis(media).collect()
      .groupBy(_._1).map { case (id, rows) =>
        id -> rows.sortBy(_._3).map(_._4)
      }
    assert(millis.keySet == floats.keySet)
    millis.foreach { case (id, acc) =>
      assert(acc.length == StubCodec.Dim)
      acc.zipWithIndex.foreach { case (m, j) =>
        assert(m.toFloat / 1000f == floats(id)(j),
          s"media $id dim $j: milli $m vs float ${floats(id)(j)}")
      }
    }
  }

  test("resizeImages touches only images and rewrites meta") {
    val out = resizeImages(media, 64, 64).collect()
    out.foreach { r =>
      if (r.kind == "image") assert(r.meta.width == 64 && r.meta.height == 64)
      else assert(r.meta.width != 64 || r.meta.height != 64)
    }
  }

  // ---- ImageIoCodec: the REAL image decode over in-JDK javax.imageio ----

  /** Encode planted ARGB pixels (row-major) as real PNG bytes. */
  private def pngBytes(w: Int, h: Int, px: Seq[Int]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    var i = 0
    for (y <- 0 until h; x <- 0 until w) { img.setRGB(x, y, px(i)); i += 1 }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
  private def argb(a: Int, r: Int, g: Int, b: Int): Int =
    (a << 24) | (r << 16) | (g << 8) | b

  /** Independent re-statement of the documented feature map, folding the
    * KNOWN planted pixels directly (never through BufferedImage) — so a
    * match proves the codec really recovered the pixel values from the
    * PNG container. */
  private def expectedAcc(w: Int, h: Int, px: Seq[Int]): Array[Long] = {
    val acc = new Array[Long](16)
    acc(0) = w * 1000L; acc(1) = h * 1000L; acc(2) = w.toLong * h * 1000L
    var minL = 255L; var maxL = 0L; var hRgb = 17L; var hA = 17L
    for (y <- 0 until h; x <- 0 until w) {
      val p = px(y * w + x)
      val a = (p >>> 24) & 0xff; val r = (p >>> 16) & 0xff
      val g = (p >>> 8) & 0xff; val b = p & 0xff
      acc(3) += r; acc(4) += g; acc(5) += b; acc(6) += a
      val luma = (299L * r + 587L * g + 114L * b) / 1000L
      acc(7) += luma
      if (luma >= 128L) acc(8) += 1000L
      minL = math.min(minL, luma); maxL = math.max(maxL, luma)
      if (x < w / 2) acc(11) += luma
      if (y < h / 2) acc(12) += luma
      if (a == 255) acc(13) += 1000L
      hRgb = (((hRgb * 31 + r) * 31 + g) * 31 + b) % 1000003L
      hA = (hA * 31 + a) % 1000003L
    }
    acc(9) = minL * 1000L; acc(10) = maxL * 1000L
    acc(14) = hRgb; acc(15) = hA
    acc
  }

  private val plantedPx = Seq(
    argb(255, 255, 0, 0), argb(255, 0, 255, 0),
    argb(128, 0, 0, 255), argb(255, 10, 20, 30))
  private def rec(id: Long, kind: String, bytes: Array[Byte]) =
    MediaRecord(id, kind, bytes, MediaMeta("image/png", 2, 2, 0, 0L))

  test("ImageIoCodec decodes a real planted PNG to exact pixel-channel aggregates") {
    val got = ImageIoCodec.decodeBatch(
      Seq(rec(7L, "image", pngBytes(2, 2, plantedPx)))).head
    val want = expectedAcc(2, 2, plantedPx).map(_.toFloat / 1000f).toSeq
    assert(got.features.toSeq == want,
      s"decoded features ${got.features.toSeq} != planted $want")
    // and the planted values exercise the interesting paths: mixed alpha,
    // bright + dark lumas, asymmetric halves
    assert(got.features(8) == 1.0f && got.features(13) == 3.0f)
  }

  test("ImageIoCodec falls back to the stub for non-images and undecodable bytes") {
    val junk = Array.tabulate[Byte](64)(i => (i * 7).toByte)
    val audio = rec(1L, "audio", junk)
    val broken = rec(2L, "image", junk)
    assert(ImageIoCodec.decodeBatch(Seq(audio)).head.features.toSeq ==
      StubCodec.decodeBatch(Seq(audio)).head.features.toSeq)
    assert(ImageIoCodec.decodeBatch(Seq(broken)).head.features.toSeq ==
      StubCodec.decodeBatch(Seq(broken)).head.features.toSeq)
  }

  test("ImageIoCodec resize is exact nearest-neighbor + decodable PNG re-encode") {
    // 4x4: each quadrant a solid color; NN to 2x2 must pick src = dst*2,
    // i.e. the top-left pixel of each quadrant.
    val q = Seq(argb(255, 200, 0, 0), argb(255, 0, 200, 0),
      argb(255, 0, 0, 200), argb(255, 50, 60, 70))
    val px4 = for (y <- 0 until 4; x <- 0 until 4)
      yield q((y / 2) * 2 + (x / 2))
    val r4 = MediaRecord(9L, "image", pngBytes(4, 4, px4),
      MediaMeta("image/png", 4, 4, 0, 0L))
    val out = ImageIoCodec.resize(r4, 2, 2)
    assert(out.meta.width == 2 && out.meta.height == 2)
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.bytes))
    assert(back != null, "resized payload is not a decodable PNG")
    assert(back.getWidth == 2 && back.getHeight == 2)
    val got = for (y <- 0 until 2; x <- 0 until 2) yield back.getRGB(x, y)
    assert(got == q, s"NN pixel mapping wrong: $got vs $q")
  }

  test("decodeFeatures with ImageIoCodec runs distributed over PNG payloads") {
    val recs = (0L until 8L).map { i =>
      // vary one pixel per record so features differ per id
      val px = plantedPx.updated(3, argb(255, i.toInt * 10, 0, 0))
      rec(i, "image", pngBytes(2, 2, px))
    }
    val ds = spark.createDataset(recs).repartition(3)
    val dist = decodeFeatures(ds, ImageIoCodec, batchSize = 4)
      .collect().map(f => f.media_id -> f.features.toSeq).toMap
    val local = ImageIoCodec.decodeBatch(recs)
      .map(f => f.media_id -> f.features.toSeq).toMap
    assert(dist == local)
    assert(dist.values.toSet.size == 8, "planted variation must reach the features")
  }

  test("sampleFrames explodes media into deterministic frame windows") {
    val frames = sampleFrames(media.filter(col("kind") === "video").as[MediaRecord], 1000L)
    val counts = frames.groupBy("media_id").count()
    assert(counts.filter(col("count") < 1).count() == 0)
    val total = frames.count()
    assert(total > media.filter(col("kind") === "video").count(), "videos produce multiple frames")
  }

  test("gzip roundtrip recovers the text exactly; corruption surfaces as the sentinel") {
    val recs = Multimodal.syntheticGzipDocs(spark, Sf0001).limit(4).collect()
    assert(recs.nonEmpty && recs.forall(_.meta.mime == "application/gzip"))
    // corrupt ONE deflate-stream byte (past the 10-byte gzip header) of
    // one record: its row must turn into the loud sentinel, the intact
    // payloads must still inflate to exact features.
    val broken = recs.head.bytes.clone()
    broken(12) = (broken(12) ^ 0x5a).toByte
    val mixed = recs.tail :+ recs.head.copy(bytes = broken)
    val out = Multimodal.gunzipFeatures(spark.createDataset(mixed))
      .collect().map(f => f.media_id -> f).toMap
    assert(!out(recs.head.media_id).ok &&
      out(recs.head.media_id).n_chars == -1L,
      "a corrupted payload must be the sentinel row, never dropped")
    recs.tail.foreach { r =>
      val plain = Tables(spark, Sf0001, "documents")
        .filter(col("doc_id") === r.media_id)
        .select("text").collect().head.getString(0)
      val f = out(r.media_id)
      assert(f.ok && f.n_chars == plain.length.toLong &&
        f.n_tok == plain.count(_ == ' ').toLong + 1L,
        s"doc ${r.media_id} did not roundtrip")
    }
  }

  test("multi-member gzip inflates fully; features count code points, not UTF-16 units") {
    // Web-crawl WARC members are routinely CONCATENATED gzip streams: a
    // first-member-only inflate silently truncates every such record.
    // JDK GZIPInputStream handles multi-member; this pins that the FULL
    // stream reaches the features.
    def gz(s: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)); g.close()
      bos.toByteArray
    }
    val partA = "hello crawl"
    val partB = " world shard"
    val partC = " tail"
    val full = partA + partB + partC
    // and a supplementary-plane payload: the DuckDB oracle counts
    // length() = CODE POINTS and hashes ascii() per split char = the
    // codepoint (128512 for the emoji), so the Scala fold must too
    val uni = "a😀 b" // 'a', U+1F600, ' ', 'b' — 4 codepoints, 5 UTF-16 units
    val recs2 = Seq(
      MediaRecord(1L, "text", gz(partA) ++ gz(partB) ++ gz(partC),
        MediaMeta("application/gzip", 0, 0, 0, 0L)),
      MediaRecord(2L, "text", gz(uni),
        MediaMeta("application/gzip", 0, 0, 0, 0L)))
    val out = Multimodal.gunzipFeatures(spark.createDataset(recs2))
      .collect().map(f => f.media_id -> f).toMap
    val f1 = out(1L)
    assert(f1.ok && f1.n_chars == full.length.toLong,
      s"multi-member inflate must cover all members: expected ${full.length} chars, got ${f1.n_chars}")
    assert(f1.n_tok == full.count(_ == ' ').toLong + 1L)
    var h = 0L
    full.foreach(c => h = (h * 31 + c) % Qh.WinHashP) // all-ASCII: char ≡ codepoint
    assert(f1.fp == h, "digest must fold the full concatenated text")
    val f2 = out(2L)
    assert(f2.ok && f2.n_chars == 4L,
      s"n_chars must count code points (got ${f2.n_chars} for 4 codepoints / 5 UTF-16 units)")
    var h2 = 0L
    Seq('a'.toInt, 0x1F600, ' '.toInt, 'b'.toInt)
      .foreach(cp => h2 = (h2 * 31 + cp) % Qh.WinHashP)
    assert(f2.fp == h2, "fp must fold code points (DuckDB ascii() per split char)")
  }
}
