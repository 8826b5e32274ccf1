package graft

import org.apache.spark.sql.functions._

/** Planted proof for [[Qh.requireBoundedBaskets]]: the basket self-joins
  * (q102_basket_lift, q108_item2item) must REFUSE an input whose widest
  * basket exceeds `spark.graft.basket.maxItems`, and run normally under
  * it — the guard that keeps one pathological 10⁴-item order from
  * detonating a quadratic pair explosion at scale.
  */
class BasketGuardSpec extends SparkSpec {
  import spark.implicits._

  /** A minimal planted sfDir: one well-formed 3-item basket plus one
    * basket of `wide` distinct parts (each part its own brand, so the
    * oversize survives both the part grain (q108) and the brand grain
    * (q102)). */
  private def plant(wide: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_basket_").toString
    val lines = (1 to wide).map(i => (100L, 1000L + i)) ++
      Seq((200L, 1L), (200L, 2L), (200L, 3L))
    lines.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    ((1 to wide).map(i => (1000L + i, s"BRAND#${1000 + i}")) ++
      Seq((1L, "BRAND#1"), (2L, "BRAND#2"), (3L, "BRAND#3")))
      .toDF("p_partkey", "p_brand")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    dir
  }

  test("an oversized basket is refused loudly by q102 and q108") {
    val dir = plant(wide = 12)
    spark.conf.set("spark.graft.basket.maxItems", "8")
    try {
      for (q <- Seq("q102_basket_lift", "q108_item2item")) {
        val e = intercept[IllegalArgumentException] {
          SparkEntry.queries(q)(spark, dir).collect()
        }
        assert(e.getMessage.contains("12 items") &&
          e.getMessage.contains("spark.graft.basket.maxItems=8"),
          s"$q must name the offending width and the config: ${e.getMessage}")
      }
    } finally spark.conf.unset("spark.graft.basket.maxItems")
  }

  test("baskets at the cap run to completion (the guard is strict-greater)") {
    val dir = plant(wide = 8)
    spark.conf.set("spark.graft.basket.maxItems", "8")
    try {
      val i2i = SparkEntry.queries("q108_item2item")(spark, dir).collect()
      assert(i2i.nonEmpty, "cap-width basket must still produce neighbors")
      val lift = SparkEntry.queries("q102_basket_lift")(spark, dir).collect()
      assert(lift.nonEmpty, "cap-width basket must still produce lift rows")
    } finally spark.conf.unset("spark.graft.basket.maxItems")
  }

  test("the real tables pass the default cap (the guard is not in the way)") {
    // sf0.001's widest lineitem basket is single-digit; the default 1024
    // cap must be invisible there.
    val rows = SparkEntry.queries("q108_item2item")(spark, Sf0001).limit(1).collect()
    assert(rows.nonEmpty)
  }
}
