package graft

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The mergeClusters micro-graph hybrid (r10): under
  * `spark.graft.merge.localGraphCap` the per-batch component labeling
  * runs as a driver-side min-root union-find; past it, as the
  * distributed propagation loop. This spec pins that BOTH paths produce
  * identical cluster tables on a two-batch sequence that exercises
  * in-batch edges, stored-index edges, AND the relabel path (a new
  * arrival becoming its cluster's minimum), by forcing the cap to 0 for
  * the distributed run.
  */
class MergeHybridSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toSeq.toDF("doc_id", "text").withColumn("source", lit("s"))

  test("union-find fast path ≡ distributed propagation across a 2-batch merge") {
    def run(tag: String): Map[Long, Long] = {
      val root = java.nio.file.Files.createTempDirectory(s"graft_mh_$tag").toString
      val empty = spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        StructType.fromDDL("doc_id BIGINT, cluster BIGINT"))
      val b0 = docs(10L -> "alpha beta gamma delta", 11L -> "alpha beta gamma delta",
        20L -> "one two three four five", 30L -> "unique text nothing else here")
      val s0 = Dedup.mergeAndIndex(empty, b0, s"$root/idx", 0L, 0.8, None).localCheckpoint()
      val b1 = docs(5L -> "alpha beta gamma delta", // joins {10,11} AND becomes its min
        21L -> "one two three four five", // joins {20} via the stored index
        40L -> "fresh totally different words") // singleton
      Dedup.mergeAndIndex(s0, b1, s"$root/idx", 1L, 0.8, None)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val fast = run("fast")
    spark.conf.set("spark.graft.merge.localGraphCap", "0")
    val slow = try run("slow")
      finally spark.conf.unset("spark.graft.merge.localGraphCap")
    assert(fast == slow, s"hybrid paths diverge: fast=$fast slow=$slow")
    // and the labels are the component minima, including the relabel
    assert(fast(5L) == 5L && fast(10L) == 5L && fast(11L) == 5L,
      s"batch-1 doc 5 must become the {5,10,11} cluster min: $fast")
    assert(fast(20L) == 20L && fast(21L) == 20L, s"stored-index edge must cluster 21 under 20: $fast")
    assert(fast(30L) == 30L && fast(40L) == 40L, s"singletons must self-label: $fast")
  }

  test("bootstrap clusters table: unindexed docs lose future edges; an indexBatch backfill restores them") {
    // The mergeAndIndex PRECONDITION (scaladoc): `clusters` must come
    // from indexed ingest. Adopt a clusterDocs output as the serving
    // table WITHOUT backfill and a later near-dup of a bootstrap doc
    // silently forms its own cluster; backfill once with indexBatch and
    // the cross-generation edge is found.
    val bootstrap = docs(10L -> "alpha beta gamma delta", 20L -> "one two three four five")
    val served = Dedup.clusterDocs(bootstrap).localCheckpoint() // (doc_id, cluster), never indexed
    val arriving = docs(30L -> "alpha beta gamma delta") // near-dup of bootstrap doc 10

    def merge(root: String, backfill: Boolean): Map[Long, Long] = {
      if (backfill) Dedup.indexBatch(bootstrap, s"$root/idx", -100L) // reserved pre-stream id
      Dedup.mergeAndIndex(served, arriving, s"$root/idx", 0L, 0.8, None)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }

    val rootA = java.nio.file.Files.createTempDirectory("graft_mh_nofill").toString
    val without = merge(rootA, backfill = false)
    assert(without(30L) == 30L,
      s"expected the documented failure mode (30 islands without backfill): $without")

    val rootB = java.nio.file.Files.createTempDirectory("graft_mh_fill").toString
    val withFill = merge(rootB, backfill = true)
    assert(withFill == Map(10L -> 10L, 20L -> 20L, 30L -> 10L),
      s"backfilled index must join 30 to 10's cluster: $withFill")
  }
}
