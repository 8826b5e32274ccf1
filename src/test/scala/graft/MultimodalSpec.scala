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

  test("sampleFrames explodes media into deterministic frame windows") {
    val frames = sampleFrames(media.filter(col("kind") === "video").as[MediaRecord], 1000L)
    val counts = frames.groupBy("media_id").count()
    assert(counts.filter(col("count") < 1).count() == 0)
    val total = frames.count()
    assert(total > media.filter(col("kind") === "video").count(), "videos produce multiple frames")
  }
}
