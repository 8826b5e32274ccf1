package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal._

/** The REAL audio boundary: RIFF/WAVE PCM16 encode/decode through
  * [[WavCodec]]'s hand-rolled chunk walker, and the exact integer
  * waveform features the `mm_audio_features` gate rides on. Every byte
  * offset here is pinned against the public RIFF layout, not against the
  * encoder — a symmetric encode/decode bug cannot cancel out.
  */
class WavSpec extends SparkSpec {
  import spark.implicits._

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def tag(b: Array[Byte], off: Int): String =
    new String(b.slice(off, off + 4), "US-ASCII")

  private val planted = Array[Short](0, 100, -200, 32767, -32768, 5, -5, 0)

  test("encodePcm16 emits the canonical 44-byte RIFF header, byte-exact") {
    val b = WavCodec.encodePcm16(planted, 16000)
    assert(b.length == 44 + planted.length * 2)
    assert(tag(b, 0) == "RIFF")
    assert(le32(b, 4) == 36 + planted.length * 2)
    assert(tag(b, 8) == "WAVE")
    assert(tag(b, 12) == "fmt ")
    assert(le32(b, 16) == 16)
    assert(le16(b, 20) == 1, "PCM format tag")
    assert(le16(b, 22) == 1, "mono")
    assert(le32(b, 24) == 16000, "sample rate")
    assert(le32(b, 28) == 32000, "byte rate")
    assert(le16(b, 32) == 2, "block align")
    assert(le16(b, 34) == 16, "bits per sample")
    assert(tag(b, 36) == "data")
    assert(le32(b, 40) == planted.length * 2)
    // first sample little-endian: 100 = 0x64, 0x00
    assert((b(46) & 0xff) == 100 && b(47) == 0)
  }

  test("decode(encode(x)) == x including extreme samples") {
    val Some((rate, pcm)) = WavCodec.decodePcm16(WavCodec.encodePcm16(planted, 44100))
    assert(rate == 44100)
    assert(pcm.toSeq == planted.toSeq)
  }

  test("decoder skips unknown chunks and applies the RIFF odd-length pad rule") {
    val base = WavCodec.encodePcm16(planted, 8000)
    // Splice a 3-byte junk chunk (odd length -> 1 pad byte) between
    // "fmt " and "data".
    val junk = "JUNK".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0, 1, 2, 3, 0 /* pad */ )
    val spliced = base.slice(0, 36) ++ junk ++ base.drop(36)
    val Some((rate, pcm)) = WavCodec.decodePcm16(spliced)
    assert(rate == 8000)
    assert(pcm.toSeq == planted.toSeq)
  }

  test("malformed payloads decode to None, never to garbage") {
    val good = WavCodec.encodePcm16(planted, 8000)
    assert(WavCodec.decodePcm16(Array[Byte](1, 2, 3)).isEmpty, "too short")
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    assert(WavCodec.decodePcm16(badMagic).isEmpty, "bad RIFF magic")
    val badWave = good.clone(); badWave(8) = 'X'.toByte
    assert(WavCodec.decodePcm16(badWave).isEmpty, "bad WAVE magic")
    assert(WavCodec.decodePcm16(good.dropRight(3)).isEmpty,
      "truncated data chunk")
    val stereo = good.clone(); stereo(22) = 2
    assert(WavCodec.decodePcm16(stereo).isEmpty, "stereo rejected")
    val nonPcm = good.clone(); nonPcm(20) = 3
    assert(WavCodec.decodePcm16(nonPcm).isEmpty, "non-PCM format tag")
    val dataFirst = // data chunk before any fmt chunk
      good.slice(0, 12) ++ good.drop(36) // RIFF/WAVE then data directly
    assert(WavCodec.decodePcm16(dataFirst).isEmpty, "data before fmt")
  }

  test("audioFeatures computes the exact integer features of planted samples") {
    val f = Multimodal.audioFeatures(7L, 16000, planted)
    assert(f.media_id == 7L)
    assert(f.n_samples == 8L)
    assert(f.sample_rate == 16000L)
    assert(f.peak_abs == 32768L)
    assert(f.sum_abs == 0L + 100 + 200 + 32767 + 32768 + 5 + 5 + 0)
    assert(f.energy == 100L * 100 + 200L * 200 + 32767L * 32767 +
      32768L * 32768 + 25L + 25L)
    // sign runs: [0,100] nonneg, -200 neg, 32767 nonneg, -32768 neg,
    // 5 nonneg, -5 neg, 0 nonneg -> 6 crossings
    assert(f.zero_cross == 6L)
    val hand = planted.foldLeft(17L)((h, s) => (h * 31 + (s + 32768L)) % 1000003L)
    assert(f.pcm_hash == hand)
  }

  test("syntheticWav payloads are real parseable WAV and decodeAudio recovers the formula") {
    val feats = Multimodal.decodeAudio(Multimodal.syntheticWav(spark, Sf0001))
      .collect().sortBy(_.media_id)
    assert(feats.nonEmpty)
    assert(feats.forall(_.n_samples > 0), "no decode-failure sentinels")
    // Cross-check one record end-to-end against the generating recurrence.
    val f0 = feats.head
    val id = f0.media_id
    assert(id % 3 == 1)
    val n = f0.n_samples.toInt
    val pcm = Array.tabulate(n)(i =>
      (((id * 7919L + i * 104729L) % 20011L) - 10005L).toShort)
    val expect = Multimodal.audioFeatures(id, f0.sample_rate.toInt, pcm)
    assert(f0 == expect)
  }

  test("property: decode(encode(x)) == x for arbitrary PCM and sample rates") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val pcmGen = Gen.listOf(Gen.choose(Short.MinValue, Short.MaxValue))
      .map(_.toArray)
    val rateGen = Gen.choose(1, 192000)
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200),
      Prop.forAll(pcmGen, rateGen) { (pcm, rate) =>
        WavCodec.decodePcm16(WavCodec.encodePcm16(pcm, rate))
          .exists { case (r, p) => r == rate && p.toSeq == pcm.toSeq }
      })
    assert(res.passed, res.status.toString)
  }

  test("decode failure surfaces as the sentinel row, not a dropped record") {
    val bad = Seq(MediaRecord(99L, "audio", Array[Byte](1, 2, 3, 4),
      MediaMeta("audio/wav", 0, 0, 8000, 1L))).toDS()
    val out = Multimodal.decodeAudio(bad).collect()
    assert(out.length == 1)
    assert(out.head.media_id == 99L && out.head.n_samples == -1L)
  }
}
