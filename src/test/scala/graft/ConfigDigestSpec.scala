package graft

import org.apache.spark.sql.functions._

/** Sensitivity pins for [[ConfigSweep.digestOf]] — the reduction behind
  * the execution-config invariance gate. The sweep compares digests, so
  * a DEGENERATE digest (constant, order-sensitive, or blind to values /
  * multiplicity / nulls) would green the whole surface no matter what
  * the variants returned. Each property here is one way the gate could
  * silently stop gating.
  */
class ConfigDigestSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq((1L, "a", Some(10.5)), (2L, "b", None), (3L, "c", Some(-0.0)))

  test("row order and SELECT column order do not change the digest") {
    val df = base.toDF("id", "s", "v")
    val reversed = base.reverse.toDF("id", "s", "v").orderBy(col("s").desc)
    val reselected = base.toDF("id", "s", "v").select("v", "id", "s")
    assert(ConfigSweep.digestOf(df) == ConfigSweep.digestOf(reversed))
    assert(ConfigSweep.digestOf(df) == ConfigSweep.digestOf(reselected))
    // repartitioning (the thing the sweep varies) is also invisible
    assert(ConfigSweep.digestOf(df) == ConfigSweep.digestOf(df.repartition(7)))
  }

  test("a single changed value, a dropped/duplicated row, and null-vs-value all change it") {
    val df = base.toDF("id", "s", "v")
    val d = ConfigSweep.digestOf(df)
    val oneValue = Seq((1L, "a", Some(10.5)), (2L, "b", None), (3L, "d", Some(-0.0)))
    assert(d != ConfigSweep.digestOf(oneValue.toDF("id", "s", "v")))
    assert(d != ConfigSweep.digestOf(base.take(2).toDF("id", "s", "v")))
    assert(d != ConfigSweep.digestOf((base :+ base.head).toDF("id", "s", "v")))
    val nullFlip = Seq((1L, "a", Some(10.5)), (2L, "b", Some(0.0)), (3L, "c", Some(-0.0)))
    assert(d != ConfigSweep.digestOf(nullFlip.toDF("id", "s", "v")))
  }

  test("empty frames digest by schema-independent zero sum but distinct counts") {
    val e0 = ConfigSweep.digestOf(Seq.empty[(Long, String)].toDF("a", "b"))
    assert(e0 == "0:0")
    assert(ConfigSweep.digestOf(Seq((1L, "x")).toDF("a", "b")) != e0)
  }

  test("multiplicity arithmetic cannot cancel: k copies of row A != k copies of row B plus adjustment") {
    // the sum is over 60-bit row hashes with an exact row count alongside;
    // two multisets of the same size collide only on an md5-prefix-sum
    // collision — assert the count guards the trivial size-swap case
    val a = Seq(("x", 1L), ("x", 1L)).toDF("s", "n")
    val b = Seq(("y", 2L), ("y", 2L)).toDF("s", "n")
    assert(ConfigSweep.digestOf(a) != ConfigSweep.digestOf(b))
  }

  test("array columns digest deterministically; map columns are refused") {
    val a1 = Seq((1L, Seq(1, 2, 3))).toDF("id", "arr")
    val a2 = Seq((1L, Seq(1, 2, 3))).toDF("id", "arr")
    assert(ConfigSweep.digestOf(a1) == ConfigSweep.digestOf(a2))
    val a3 = Seq((1L, Seq(3, 2, 1))).toDF("id", "arr")
    assert(ConfigSweep.digestOf(a1) != ConfigSweep.digestOf(a3),
      "array element order is part of the value and must be visible to the digest")
    // to_json renders map entries in INTERNAL order and omits null struct
    // fields — logically-equal maps could digest apart and falsely RED
    // the sweep (r12 ADVICE). No registered query outputs a map; digestOf
    // refuses them LOUDLY (incl. nested) rather than hashing unstably.
    val m = Seq((1L, Map("k" -> 1))).toDF("id", "m")
    val e = intercept[IllegalArgumentException](ConfigSweep.digestOf(m))
    assert(e.getMessage.contains("MapType"))
    val nested = Seq((1L, Seq(Map("k" -> 1)))).toDF("id", "ms")
    assert(intercept[IllegalArgumentException](
      ConfigSweep.digestOf(nested)).getMessage.contains("MapType"))
  }
}
