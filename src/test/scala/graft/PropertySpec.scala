package graft

import graft.plans.PolyHash
import graft.schema.Models._
import graft.sources.Sources
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests (SURVEY §5.3): hash algebra, dedup idempotence, wire
  * round-trips. Raw ScalaCheck runner (scalatestplus bridge is not in the
  * offline artifact cache). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(prop: Prop, minOk: Int = 100): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(minOk), prop)
    assert(res.passed, res.status.toString)
  }

  private val asciiStr = Gen.listOf(Gen.choose(' ', '~')).map(_.mkString)

  test("PolyHash matches its mathematical definition for arbitrary ASCII strings") {
    check(Prop.forAll(asciiStr) { s =>
      val expected = s.foldLeft(BigInt(0))((h, c) => (h * 31 + c.toInt) mod BigInt(Qh.HashP))
      PolyHash.hash(s) == expected.toLong
    })
  }

  test("PolyHash concat law: h(a++b) = (h(a) * 31^|b| + h(b)) mod P") {
    check(Prop.forAll(asciiStr, asciiStr) { (a, b) =>
      val p = BigInt(Qh.HashP)
      val combined = (BigInt(PolyHash.hash(a)) * BigInt(31).modPow(b.length, p) + PolyHash.hash(b)) mod p
      PolyHash.hash(a + b) == combined.toLong
    })
  }

  test("Bloom filter never yields a false negative for arbitrary long key sets") {
    import graft.functions.Bloom
    import org.apache.spark.sql.functions.col
    val gen = Gen.listOf(Gen.long)
    check(Prop.forAll(gen) { keys =>
      val df = keys.toDF("g")
      val f = Bloom.build(df, "g", maxKeys = 100000)
      df.filter(Bloom.mightContain(col("g"), f)).count() == keys.size
    }, minOk = 10) // each trial is several Spark jobs
  }

  test("exact dedup is idempotent on arbitrary small corpora") {
    val gen = Gen.listOfN(30, Gen.zip(Gen.choose(0L, 9L), Gen.alphaStr.map(_.take(8))))
    check(Prop.forAll(gen) { rows =>
      val df = rows.toDF("id", "text")
      val once = df.dropDuplicates("text")
      val twice = once.dropDuplicates("text")
      once.count() == twice.count() && twice.count() == rows.map(_._2).distinct.size
    }, minOk = 10) // each trial is a Spark job
  }

  test("fused TokHashes equals split-distinct-hash model for arbitrary ASCII strings") {
    check(Prop.forAll(asciiStr) { s =>
      val toks = s.split(" ", -1).toSeq
      val distinctModel = toks.distinct.map(PolyHash.hash)
      val seqModel = toks.map(PolyHash.hash)
      graft.plans.TokHashes.hashes(s, distinct = true).toLongArray().toSeq == distinctModel &&
        graft.plans.TokHashes.hashes(s, distinct = false).toLongArray().toSeq == seqModel
    })
  }

  test("native Jaccard kernel equals the set-arithmetic model for arbitrary long arrays") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val arr = Gen.listOf(Gen.choose(0L, 50L)) // small domain → real collisions
    check(Prop.forAll(arr, arr) { (a, b) =>
      val native = graft.plans.JaccardSim.simLong(
        new GenericArrayData(a.toArray), new GenericArrayData(b.toArray))
      val inter = (a.toSet & b.toSet).size.toLong
      val denom = a.size.toLong + b.size - inter
      if (denom == 0) native == null
      else {
        val model = java.math.BigDecimal.valueOf(inter.toDouble / denom)
          .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
        native != null && native.doubleValue() == model
      }
    })
  }

  test("native MinHash signature equals the per-hash min model for arbitrary long arrays") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val arr = Gen.nonEmptyListOf(Gen.choose(0L, Qh.HashP - 1))
    check(Prop.forAll(arr) { a =>
      val sig = graft.plans.MinHashSig.signature(new GenericArrayData(a.toArray)).toLongArray().toSeq
      val model = (0 until graft.plans.MinHashSig.Hashes).map { j =>
        a.map(h => (h * graft.plans.MinHashSig.A(j) + graft.plans.MinHashSig.B(j)) % Qh.HashP).min
      }
      sig == model
    })
  }

  test("asofJoin matches the correlated-lookup model on arbitrary event sets") {
    import graft.operators.Temporal
    import org.apache.spark.sql.functions._
    // Small key/time domains force collisions, equal timestamps, probes
    // with no matching build row, and NULL payload values — the latest
    // build row must win even when its payload field is null (a
    // per-column ignoreNulls carry would skip back to an older row).
    val ev = Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 20L))
    val bev = Gen.zip(ev, Gen.prob(0.3))
    val gen = Gen.zip(Gen.listOfN(15, ev), Gen.listOfN(15, bev))
    check(Prop.forAll(gen) { case (probeRaw, buildRaw) =>
      val probe = probeRaw.zipWithIndex
        .map { case ((k, t), i) => (k, new java.sql.Timestamp(t * 1000), i.toLong) }
      val build = buildRaw.zipWithIndex
        .map { case (((k, t), nullPay), i) =>
          (k, new java.sql.Timestamp(t * 1000), (100 + i).toLong,
            if (nullPay) null else (k * 31 + t).toString) }
      val pDf = probe.toDF("user_id", "ts", "event_id")
      val bDf = build.toDF("user_id", "ts", "event_id", "payload")
      val got = Temporal.asofJoin(pDf, bDf, "user_id", "ts", "event_id", Seq("payload"))
        .orderBy("event_id")
        .select(col("event_id"), col("asof_payload"))
        .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
      val want = probe.map { case (k, t, id) =>
        val cands = build.filter(b => b._1 == k && !b._2.after(t))
        (id, if (cands.isEmpty) None
             else Option(cands.maxBy(b => (b._2.getTime, b._3))._4))
      }.sortBy(_._1)
      got == want
    }, minOk = 10) // each trial is a Spark job
  }

  test("sessionize gap rule matches a sequential scan on arbitrary per-user streams") {
    import graft.operators.Temporal
    val gen = Gen.listOfN(20, Gen.zip(Gen.choose(0L, 2L), Gen.choose(0L, 20L)))
    check(Prop.forAll(gen) { raw =>
      // 20 events over a 0..20-minute span with a 5-minute gap rule.
      val evs = raw.zipWithIndex.map { case ((u, m), i) =>
        (i.toLong, new java.sql.Timestamp(m * 60000), u, "e", 0.0)
      }
      val df = evs.toDF("event_id", "ts", "user_id", "event_type", "value")
      val got = Temporal.sessionize(df, gapSec = 300)
        .select("user_id", "event_id", "session_idx")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val want = evs.groupBy(_._3).flatMap { case (u, es) =>
        val sorted = es.sortBy(e => (e._2.getTime, e._1))
        var sess = 0L; var prev = Long.MinValue
        sorted.map { e =>
          if (prev == Long.MinValue || e._2.getTime - prev > 300000L) sess += 1
          prev = e._2.getTime
          (u, e._1) -> sess
        }
      }
      got == want
    }, minOk = 10)
  }

  test("Kafka wire round-trip is identity for arbitrary RawContent") {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:09:58")
    val safe = Gen.alphaNumStr.map(_.take(12)).suchThat(_.nonEmpty)
    val gen = Gen.listOfN(5, Gen.zip(safe, safe, safe)).map(_.map { case (id, topic, text) =>
      RawContent(id, "reddit", topic, text, ContentMetadata(ts, "a", "s", "p", null))
    })
    check(Prop.forAll(gen) { rcs =>
      val distinct = rcs.distinctBy(_.content_id)
      val wire = Sources.toWire(distinct.toDF(), "content_id")
      val back = Sources.fromWire(wire, rawContentSchema, "content_id").as[RawContent]
      back.collect().toSet == distinct.toSet
    }, minOk = 10) // each trial is a Spark job
  }
}
