package graft

import graft.functions.Bloom
import graft.operators.Dedup.{shingles3, tokHashesSeq}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Top-level so Spark derives an Encoder without an outer pointer. */
case class CorpusDoc(doc_id: Long, text: String)

/** Semantic invariants of the corpus-curation operators added for the
  * training-data mandate: bloom-prefiltered decontamination, context-window
  * chunking, centroid-anchored semantic dedup, unigram-LM scoring. Value
  * parity vs DuckDB is the oracle gate's job; these prove the properties
  * the operators exist for. */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, Sf0001)

  test("bloom decontamination ≡ exact contamination (false negatives impossible, false positives verified away)") {
    val exact = q("text_contamination").collect().map(_.toSeq).toSet
    val bloom = q("text_decontam_bloom").collect().map(_.toSeq).toSet
    assert(bloom == exact, "bloom-prefiltered output must be byte-identical to the exact join")
    assert(exact.nonEmpty, "stand-in eval slice must actually contaminate")
  }

  test("bloom prefilter passes a small superset: every true hit survives, measured fp rate < 1%") {
    val sh = Tables(spark, Sf0001, "documents")
      .select(col("doc_id"), explode(shingles3(tokHashesSeq(col("text")))).as("g"))
    val bench = sh.filter(col("doc_id") % 97 === 0).select("g").distinct()
    val corpus = sh.filter(col("doc_id") % 97 =!= 0).select("g").distinct()
    val f = Bloom.build(bench, "g", maxKeys = 1000000)
    val total = corpus.count()
    val passed = corpus.filter(Bloom.mightContain(col("g"), f)).count()
    val trueHits = corpus.join(bench, Seq("g"), "left_semi").count()
    val truePassed = corpus.join(bench, Seq("g"), "left_semi")
      .filter(Bloom.mightContain(col("g"), f)).count()
    assert(truePassed == trueHits, "a bloom filter can NEVER drop an inserted key's match")
    val fp = (passed - trueHits).toDouble / math.max(1, total - trueHits)
    assert(fp < 0.01, s"measured false-positive rate $fp (expected ~${f.fpp(trueHits)})")
  }

  test("text_decontam_bloom plan: the bit-test filter prunes BELOW the broadcast verify join") {
    val plan = SparkEntry.queries("text_decontam_bloom")(spark, Sf0001)
      .queryExecution.executedPlan.toString
    val joinIdx = plan.indexOf("BroadcastHashJoin")
    val probeIdx = plan.indexOf("bloomcontains")
    assert(joinIdx >= 0, s"verify join must be a broadcast hash join:\n${plan.take(4000)}")
    // plan trees print children below parents: the bloom probe appearing
    // after the join line means it executes before (below) the join.
    assert(probeIdx > joinIdx, "bloom probe must filter the corpus side before the join")
  }

  test("native bloom probe ≡ declarative bit tests on every corpus shingle (hit and miss)") {
    val sh = Tables(spark, Sf0001, "documents")
      .select(explode(shingles3(tokHashesSeq(col("text")))).as("g"))
    val f = Bloom.build(sh.filter(col("g") % 3 === 0), "g", maxKeys = 1000000)
    val diff = sh.select(Bloom.mightContain(col("g"), f).as("native"),
      Bloom.mightContainDecl(col("g"), f).as("decl"))
      .filter(col("native") =!= col("decl"))
    assert(diff.count() == 0)
  }

  test("native bloom probe matches the declarative witness on NULL keys too") {
    // Spark hash expressions SKIP null children (xxhash64(NULL) = seed),
    // so a null key has well-defined positions; the native expression
    // must return the same boolean, never NULL (which a filter would
    // silently treat as false — a false negative vs the witness).
    val f = Bloom.build(Seq(1L, 2L).toDF("g"), "g", maxKeys = 10)
    val rows = Seq(Option(1L), Option(3L), Option.empty[Long]).toDF("g")
      .select(Bloom.mightContain(col("g"), f).as("native"),
        Bloom.mightContainDecl(col("g"), f).as("decl")).collect()
    rows.foreach { r =>
      assert(!r.isNullAt(0), "native probe must never be NULL")
      assert(r.getBoolean(0) == r.getBoolean(1), s"parity broken: $r")
    }
  }

  test("bloom build refuses an unbounded key set (the 100 TB driver-OOM guard)") {
    val e = intercept[IllegalArgumentException] {
      Bloom.build(Tables(spark, Sf0001, "documents").select(col("doc_id").as("g")), "g", maxKeys = 10)
    }
    assert(e.getMessage.contains("text_contamination"), "guard must point to the shuffle path")
  }

  test("text_chunk tiles every document: stride-aligned starts, full coverage to the last token, window-clipped lengths") {
    import graft.operators.TextOps.{ChunkStride, ChunkTokens}
    val chunks = q("text_chunk")
      .select("doc_id", "chunk_id", "start_tok", "n_tok")
      .as[(Long, Long, Long, Long)].collect()
    val nTok = Tables(spark, Sf0001, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(chunks.map(_._1).toSet == nTok.keySet, "every document is chunked")
    chunks.groupBy(_._1).foreach { case (doc, cs) =>
      val n = nTok(doc)
      val sorted = cs.sortBy(_._2).toSeq
      assert(sorted.map(_._2) == sorted.indices.map(_.toLong), s"doc $doc chunk_ids not dense")
      assert(sorted.map(_._3) == sorted.indices.map(_.toLong * ChunkStride), s"doc $doc starts off-stride")
      sorted.foreach { case (_, _, st, len) =>
        assert(len == math.min(ChunkTokens.toLong, n - st), s"doc $doc bad window clip")
      }
      assert(sorted.last._3 + sorted.last._4 == n, s"doc $doc last chunk must end at the last token")
      assert(sorted.last._3 < n, s"doc $doc has a chunk starting past the end")
    }
  }

  test("dedup_semantic: exactly one kept representative per cell; drops exactly the above-threshold non-reps; centroids anchor their own cells") {
    import graft.operators.Similarity.SemDedupTheta
    val rows = q("dedup_semantic")
      .select("vec_id", "cell", "csim", "rep_id", "keep")
      .as[(Long, Long, Double, Long, Long)].collect()
    rows.groupBy(_._2).foreach { case (cell, members) =>
      val reps = members.filter(m => m._1 == m._4)
      assert(reps.length == 1, s"cell $cell must have one representative")
      assert(reps.head._5 == 1L, s"cell $cell representative must be kept")
      members.foreach { case (vid, _, csim, repId, keep) =>
        if (vid != repId)
          assert((keep == 0L) == (csim >= SemDedupTheta),
            s"cell $cell member $vid: keep=$keep at csim=$csim")
      }
    }
    (1L to 16L).foreach { c =>
      val self = rows.find(_._1 == c).get
      assert(self._2 == c, s"centroid $c must assign to its own cell")
      assert(math.abs(self._3 - 1.0) < 1e-9, s"centroid $c cosine to itself must be 1")
    }
  }

  test("streaming decontamGate ≡ batch gate; a planted contaminated doc never passes") {
    import graft.streaming.Streaming
    val eval = Seq(CorpusDoc(100L, "alpha beta gamma delta epsilon")).toDF()
    val bloom = Bloom.build(
      eval.select(explode(shingles3(tokHashesSeq(col("text")))).as("g")), "g", maxKeys = 1000)
    val docs = Seq(
      CorpusDoc(1L, "totally unrelated text about spark plans"),
      CorpusDoc(2L, "prefix words then alpha beta gamma quoted verbatim"), // shares a 3-gram
      CorpusDoc(3L, "another clean document with plenty of tokens"))
    val batch = Streaming.decontamGate(docs.toDF(), bloom)
      .select("doc_id").as[Long].collect().toSet
    assert(!batch.contains(2L), "doc sharing an eval 3-gram must be dropped")
    assert(batch.contains(1L) && batch.contains(3L), "clean docs pass (fpp ~0 on this set)")
    val ms = MemoryStream[CorpusDoc](spark)
    ms.addData(docs)
    val q = Streaming.decontamGate(ms.toDF(), bloom).writeStream
      .format("memory").queryName("decontam_gate").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("decontam_gate").select("doc_id").as[Long].collect().toSet
    assert(streamed == batch, "the gate must bind identically to batch and stream")
  }

  test("dedup_substring finds a planted verbatim 16-token passage and nothing else") {
    import graft.operators.Dedup.SubstringWindow
    val passage = (0 until SubstringWindow).map(i => s"p$i").mkString(" ")
    val d = java.nio.file.Files.createTempDirectory("graft_sub_").toFile.getAbsolutePath
    Seq(
      1L -> s"intro words before $passage tail segment one",
      2L -> s"a different opening here $passage and another ending",
      3L -> (2000 until 2020).map(i => s"u$i").mkString(" ")) // unique, no repeats
      .toDF("doc_id", "text").write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = SparkEntry.queries("dedup_substring")(spark, d)
      .select("n_docs", "n_occ", "first_doc", "last_doc")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty, "the shared passage must produce at least one repeated window")
    rows.foreach { case (nDocs, nOcc, first, last) =>
      assert(nDocs == 2L && nOcc == 2L && first == 1L && last == 2L,
        s"only docs 1 and 2 share passages: ($nDocs, $nOcc, $first, $last)")
    }
  }

  test("substringSpans merges a planted 20-token shared passage into one maximal span; cutSpans removes it") {
    import graft.operators.Dedup
    import Dedup.SubstringWindow
    // A 20-token passage shared verbatim by docs 1 and 2 at DIFFERENT
    // offsets (3 vs 5 tokens of unique prefix). 20 tokens = 5 repeated
    // 16-token windows per doc (starts p..p+4), which must merge into
    // exactly ONE [p, p+20) span each.
    val passage = (0 until SubstringWindow + 4).map(i => s"p$i").mkString(" ")
    val pre1 = "alpha beta gamma"; val pre2 = "one two three four five"
    val post1 = "tail one two"; val post2 = "closing words"
    val docs = Seq(
      1L -> s"$pre1 $passage $post1",
      2L -> s"$pre2 $passage $post2",
      3L -> (3000 until 3030).map(i => s"u$i").mkString(" ")) // unique doc
      .toDF("doc_id", "text")
    val spans = Dedup.substringSpans(docs)
    val got = spans.select("doc_id", "start_tok", "end_tok", "n_windows")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 3L, 23L, 5L), (2L, 5L, 25L, 5L)),
      s"one maximal span per doc at its own offset, got $got")

    // The cut corpus must keep every unique token and contain no
    // repeated window at all.
    val cut = Dedup.cutSpans(docs, spans)
    val byId = cut.select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(byId(1L) == s"$pre1 $post1" && byId(2L) == s"$pre2 $post2",
      s"cut must excise exactly the passage: $byId")
    assert(byId(3L).startsWith("u3000"), "span-free docs pass through verbatim")
    assert(Dedup.substringSpans(cut).count() == 0,
      "after the cut, no cross-document repeated window may remain")

    // The registered gated query over the same fixture: removal counts
    // are the island widths and cut_hash is the canonical hash of the
    // rebuilt text (span-free docs hash their original text).
    val d = java.nio.file.Files.createTempDirectory("graft_cut_").toFile.getAbsolutePath
    docs.write.mode("overwrite").parquet(s"$d/documents.parquet")
    val gated = SparkEntry.queries("dedup_substring_cut")(spark, d)
      .select("doc_id", "n_tok_removed", "cut_hash")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    def h(s: String): Long =
      spark.range(1).select(Qh.strHash(lit(s))).as[Long].head()
    assert(gated(1L) == ((20L, h(s"$pre1 $post1"))), s"doc 1: ${gated(1L)}")
    assert(gated(2L) == ((20L, h(s"$pre2 $post2"))), s"doc 2: ${gated(2L)}")
    assert(gated(3L)._1 == 0L && gated(3L)._2 == h((3000 until 3030).map(i => s"u$i").mkString(" ")),
      s"doc 3 must pass through: ${gated(3L)}")
  }

  test("clustersTable memo: corpus dirs with colliding String.hashCode get distinct tables") {
    // "Aa" and "BB" hash identically, so two dirs differing only in that
    // suffix collide on the full path's 32-bit hashCode — the regression
    // where a hash-derived memo subdir served one corpus's clusters for
    // the other.
    val root = java.nio.file.Files.createTempDirectory("graft_memo_").toFile.getAbsolutePath
    val dirA = s"$root/Aa"; val dirB = s"$root/BB"
    assert(dirA.hashCode == dirB.hashCode, "fixture must actually collide")
    Seq(1L -> "some tokens here", 2L -> "other tokens there")
      .toDF("doc_id", "text").withColumn("source", lit("src0"))
      .write.parquet(s"$dirA/documents.parquet")
    Seq(7L -> "entirely different corpus", 8L -> "with different doc ids")
      .toDF("doc_id", "text").withColumn("source", lit("src0"))
      .write.parquet(s"$dirB/documents.parquet")
    val idsA = graft.operators.Dedup.clustersTable(spark, dirA)
      .select("doc_id").as[Long].collect().toSet
    val idsB = graft.operators.Dedup.clustersTable(spark, dirB)
      .select("doc_id").as[Long].collect().toSet
    assert(idsA == Set(1L, 2L), s"dir A must serve its own corpus, got $idsA")
    assert(idsB == Set(7L, 8L), s"dir B must serve its own corpus, got $idsB")
  }

  test("text_unigram_lm on a planted corpus: hapax-only doc is all-rare, repeated-token doc is not") {
    val d = java.nio.file.Files.createTempDirectory("graft_lm_").toFile.getAbsolutePath
    Seq((1L, "x x x x"), (2L, "u1 u2 u3 u4"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = SparkEntry.queries("text_unigram_lm")(spark, d)
      .select("doc_id", "n_tok", "mean_freq_ppb", "min_freq_ppb", "rare_tok")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    // total 8 tokens: 'x' count 4 → 500M ppb; each u_i count 1 → 125M ppb
    assert(out(0) == ((1L, 4L, 500000000L, 500000000L, 0L)))
    assert(out(1) == ((2L, 4L, 125000000L, 125000000L, 4L)))
  }
}
