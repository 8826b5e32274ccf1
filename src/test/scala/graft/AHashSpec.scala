package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal._

/** The real-PNG perceptual-hash boundary: synthetic 8×8 PNGs must decode
  * (via the in-JDK ImageIO reader) back to their generating pixels, and
  * the average-hash must match hand arithmetic — including the planted
  * duplicate pairs sharing a hash bucket. */
class AHashSpec extends SparkSpec {
  import spark.implicits._

  private def gen(gid: Long, j: Int): Long = (gid * 2654435761L + j * 40503L) % 256L

  test("syntheticImages payloads are real png/bmp/gif containers that decode to the generating pixels") {
    val recs = Multimodal.syntheticImages(spark, Sf0001).collect().sortBy(_.media_id)
    assert(recs.nonEmpty)
    assert(recs.forall(_.media_id % 3 == 0))
    // all three containers must be present in the corpus...
    assert(recs.map(_.meta.mime).toSet ==
      Set("image/png", "image/bmp", "image/gif"))
    // ...and EVERY record, whatever its container, must decode back to
    // the generating pixels exactly (png/bmp are trivially lossless;
    // gif because a <=256-gray image fits its palette exactly).
    recs.foreach { r =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.bytes))
      assert(img != null && img.getWidth == 8 && img.getHeight == 8,
        s"media ${r.media_id} (${r.meta.mime}) failed decode")
      val gid = r.media_id / 6L
      (0 until 64).foreach { j =>
        val argb = img.getRGB(j % 8, j / 8)
        val g = gen(gid, j)
        assert(((argb >>> 16) & 0xff) == g && ((argb >>> 8) & 0xff) == g &&
          (argb & 0xff) == g,
          s"pixel $j of media ${r.media_id} (${r.meta.mime})")
      }
    }
  }

  test("planted near-dup pairs span two containers (format-independent buckets)") {
    val recs = Multimodal.syntheticImages(spark, Sf0001).collect()
      .map(r => r.media_id -> r.meta.mime).toMap
    val pairs = recs.keys.filter(id => id % 6 == 0 && recs.contains(id + 3)).toSeq
    assert(pairs.nonEmpty)
    // ids 6k and 6k+3 have consecutive image ordinals, so the format
    // cycle guarantees they always sit in DIFFERENT containers
    pairs.foreach(id => assert(recs(id) != recs(id + 3),
      s"pair ($id, ${id + 3}) should cross formats: ${recs(id)}"))
  }

  test("JPEG decodes through the same path; lossy pixels stay within tolerance") {
    // JPEG is deliberately outside the oracle-gated corpus (DCT
    // quantization is lossy, no closed-form pixel oracle exists) but
    // the DECODE PATH is the same ImageIO boundary — prove it works and
    // bound the loss: a max-quality 8x8 grayscale roundtrip must keep
    // mean luma within 8/255 of the source.
    val gid = 7L
    val img = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 64).foreach { j =>
      val g = gen(gid, j).toInt
      img.setRGB(j % 8, j / 8, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(1.0f)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    writer.dispose(); ios.close()
    val rec = Seq(MediaRecord(99L, "image", bos.toByteArray,
      MediaMeta("image/jpeg", 8, 8, 0, 0L))).toDS()
    val out = Multimodal.imageAHash(rec).collect().head
    assert(out.w == 8 && out.h == 8, "JPEG must decode, not sentinel")
    val trueMean = (0 until 64).map(j => gen(gid, j)).sum / 64
    assert(math.abs(out.mean_g - trueMean) <= 8L,
      s"max-quality JPEG mean luma ${out.mean_g} too far from $trueMean")
  }

  test("imageAHash matches hand-computed mean threshold bits on a planted image") {
    val recs = Multimodal.syntheticImages(spark, Sf0001)
    val out = Multimodal.imageAHash(recs).collect().map(f => f.media_id -> f).toMap
    val id = out.keys.min
    val gid = id / 6L
    val lum = (0 until 64).map(j => gen(gid, j)) // gray => luma == g exactly
    val mean = lum.sum / 64
    var hi = 0L; var lo = 0L
    lum.zipWithIndex.foreach { case (g, j) =>
      if (g >= mean) { if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32) }
    }
    val f = out(id)
    assert(f.w == 8 && f.h == 8)
    assert(f.mean_g == mean)
    assert(f.ahash_hi == hi && f.ahash_lo == lo)
  }

  test("planted duplicate pairs (6k, 6k+3) share identical pixel content and hash") {
    val out = Multimodal.imageAHash(Multimodal.syntheticImages(spark, Sf0001))
      .collect().map(f => f.media_id -> f).toMap
    val pairs = out.keys.filter(id => id % 6 == 0 && out.contains(id + 3))
    assert(pairs.nonEmpty)
    pairs.foreach { id =>
      val (a, b) = (out(id), out(id + 3))
      assert(a.ahash_hi == b.ahash_hi && a.ahash_lo == b.ahash_lo,
        s"planted pair ($id, ${id + 3}) must share the aHash bucket")
      assert(a.mean_g == b.mean_g)
    }
  }

  test("undecodable bytes surface as the sentinel row") {
    val bad = Seq(MediaRecord(33L, "image", Array[Byte](9, 9, 9),
      MediaMeta("image/png", 8, 8, 0, 0L))).toDS()
    val out = Multimodal.imageAHash(bad).collect()
    assert(out.length == 1 && out.head.media_id == 33L && out.head.w == -1L)
  }
}
