package graft

import graft.operators.{Dedup, Layout, Relational, Similarity, TextOps}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Relational/dedup/similarity invariants not covered by the DuckDB
  * oracle: approx-distinct tolerance, dedup idempotence, plan shape. */
class OperatorSpec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) =
    SparkEntry.queries(name)(spark, Sf0001)

  test("every registered query returns rows with the declared determinism (stable across runs)") {
    // spot-check a mix twice; full surface is covered by Verify+selfcheck
    Seq("q10_agg_hash", "q16_window_rank", "dedup_minhash_lsh", "text_sentiment").foreach { n =>
      val a = q(n).collect().toSeq
      val b = q(n).collect().toSeq
      assert(a == b, s"$n nondeterministic")
      assert(a.nonEmpty, s"$n empty")
    }
  }

  test("q28a scale guard refuses the all-pairs baseline above the doc cap") {
    spark.conf.set("spark.graft.q28a.maxDocs", "10")
    try {
      val e = intercept[IllegalArgumentException] { q("q28a_jaccard_pairs") }
      assert(e.getMessage.contains("dedup_ngram_jaccard"), "guard must point to the LSH path")
    } finally spark.conf.unset("spark.graft.q28a.maxDocs")
    assert(q("q28a_jaccard_pairs").columns.nonEmpty, "default cap must admit test corpora")
  }

  test("q12 approx_count_distinct within 5% of exact") {
    val approx = q("q12_approx_distinct")
      .select("l_returnflag", "approx_parts").as[(String, Long)].collect().toMap
    val exact = Tables(spark, Sf0001, "lineitem")
      .groupBy("l_returnflag").agg(countDistinct("l_partkey").as("n"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, ex) =>
      assert(math.abs(approx(k) - ex).toDouble / ex <= 0.05, s"flag $k: ${approx(k)} vs $ex")
    }
  }

  test("q61 unioned daily HLL sketches land within 5% of the exact distinct-user count") {
    val approx = q("q61_sketch_union")
      .select(col("event_type"), col("approx_users").cast("long"))
      .as[(String, Long)].collect().toMap
    val exact = Tables(spark, Sf0001, "events")
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, ex) =>
      assert(math.abs(approx(k) - ex).toDouble / ex <= 0.05, s"type $k: ${approx(k)} vs $ex")
    }
  }

  test("q42 approx_percentile lands within a ±2%-rank window of the exact order statistic") {
    // percentile_approx returns an actual data value near the target rank;
    // comparing VALUES against the interpolating exact percentile is the
    // wrong metric at tail quantiles (p99 of ~300 points interpolates far
    // from any element). The sketch contract is on RANK: the returned
    // element's position must sit within ±(2% of n + 1) of ceil(p·n).
    val ap = q("q42_approx_quantile").collect()
      .map(r => r.getString(0) -> Seq(r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val byType = Tables(spark, Sf0001, "events")
      .withColumn("v_cents", round(col("value") * 100).cast("long"))
      .select("event_type", "v_cents").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toIndexedSeq).toMap
    assert(ap.keySet == byType.keySet)
    byType.foreach { case (k, vs) =>
      val n = vs.length
      val slack = math.max(1, n / 50)
      Seq(0.5, 0.9, 0.99).zip(ap(k)).foreach { case (p, a) =>
        val target = math.ceil(p * n).toInt - 1
        val lo = vs(math.max(0, target - slack))
        val hi = vs(math.min(n - 1, target + slack))
        assert(a >= lo && a <= hi, s"$k p$p: approx $a outside rank window [$lo, $hi] (n=$n)")
      }
    }
  }

  test("q43 count-min estimates over-approximate within eps*N of exact") {
    // The CMS contract: estimate >= exact always (counters only ever
    // add), and estimate <= exact + eps*N with prob 1-delta. At
    // eps=1e-3, delta=1e-3, a violation here means a broken sketch, not
    // bad luck.
    val rows = q("q43_approx_freq").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 10)
    val n = Tables(spark, Sf0001, "documents")
      .select(explode(split(col("text"), " "))).count()
    rows.foreach { case (t, exact, est) =>
      assert(est >= exact, s"token '$t': CMS underestimated ($est < $exact)")
      assert(est <= exact + (0.001 * n).toLong + 1,
        s"token '$t': estimate $est beyond eps*N bound of exact $exact (N=$n)")
    }
  }

  test("minhash-LSH dedup converges: re-running on the kept set only shrinks it") {
    // Keep-first LSH is not strictly idempotent (a dropped doc may have
    // been another bucket's min, exposing new comparisons on re-run), but
    // it must be monotone: output ⊆ input, and it must keep a non-trivial
    // corpus.
    val kept1 = q("dedup_minhash_lsh").select("doc_id").as[Long].collect().toSet
    assert(kept1.nonEmpty && kept1.size < 500)
    val docs = Tables(spark, Sf0001, "documents").filter(col("doc_id").isin(kept1.toSeq: _*))
    val again = {
      val d = java.nio.file.Files.createTempDirectory("graft_dedup_").toFile.getAbsolutePath
      docs.write.mode("overwrite").parquet(s"$d/documents.parquet")
      SparkEntry.queries("dedup_minhash_lsh")(spark, d).select("doc_id").as[Long].collect().toSet
    }
    assert(again.subsetOf(kept1))
    assert(again.size >= kept1.size / 2, "second pass should not collapse the corpus")
  }

  test("exact dedup drops nothing on a corpus with no exact duplicates, everything on a cloned corpus") {
    val docs = Tables(spark, Sf0001, "documents")
    val d = java.nio.file.Files.createTempDirectory("graft_dd_").toFile.getAbsolutePath
    docs.union(docs).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = SparkEntry.queries("dedup_exact")(spark, d)
    assert(out.count() == docs.count(), "one group per distinct text")
    assert(out.filter(col("n_copies") =!= 2).count() == 0, "every group has exactly the clone pair")
  }

  test("broadcast-dim join plan actually broadcasts (no shuffle of the fact side)") {
    val plan = q("q05_join_broadcast_dim").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("filter query pushes predicates into the parquet scan") {
    val plan = q("q02_filter").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("GreaterThan(l_quantity"),
      s"missing pushdown:\n$plan")
  }

  test("bucketed co-located join: sort-merge join with NO exchange under it") {
    // The 100 TB fact×fact shape: both sides pre-bucketed on the join
    // key, so the SMJ consumes the bucketed scans directly. Everything
    // BELOW the SortMergeJoin node must be exchange-free (the one
    // shuffle in the query — the final rollup's — sits above it).
    val plan = q("layout_bucketed_join").queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
    val below = plan.split("SortMergeJoin", 2)(1)
    assert(!below.contains("Exchange"),
      s"exchange under the bucketed join (bucketing not used):\n$plan")
  }

  test("bucketed point lookup prunes to a single bucket") {
    // The other payoff of bucketing: an equality predicate on the bucket
    // column reads 1/N of the files before any row-level filtering — at
    // 100 TB, the difference between a point lookup and a full scan.
    val cust = Layout.bucketedTable(spark, Sf0001, "customer",
      Tables(spark, Sf0001, "customer").select("c_custkey", "c_nationkey"), "c_custkey")
    // DisableUnnecessaryBucketedScan turns bucketed reading off when no
    // operator needs the distribution — it doesn't model bucket-filter
    // pruning, so pin the scan on for the assertion.
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val plan = cust.filter(col("c_custkey") === 42)
        .queryExecution.executedPlan.toString
      assert(plan.contains(s"SelectedBucketsCount: 1 out of ${Layout.LayoutBuckets}"),
        s"bucket pruning missing from scan:\n$plan")
    } finally spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
  }

  test("partitioned layout scan carries the month predicate as PartitionFilters") {
    val plan = q("layout_partition_prune").queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains(">= 199601"),
      s"month predicate not pruned at partition level:\n$plan")
  }

  test("top-k compiles to TakeOrderedAndProject (no global sort)") {
    val plan = q("q18_topk").queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$plan")
  }

  test("no query plan contains a cartesian product, unintended nested-loop " +
      "join, or unpartitioned window over full-table input") {
    // The 100 TB guard: a CartesianProduct or a non-broadcast nested-loop
    // join in any registered query is a scale bug regardless of local
    // timings. BroadcastNestedLoopJoin is tolerated only where the
    // broadcast side is provably tiny by construction (a single query
    // vector / fixed centroid list).
    val tinyBroadcastOk = Set(
      "sim_cosine_topk", // crossJoin(broadcast(1-row query vector))
      "sim_ann_ivf",     // fixed 8-centroid literal side
      "sim_ann_lsh",     // broadcast single query-vector row
      "dedup_embed_cosine",
      "dedup_semantic",  // crossJoin(broadcast(16-row fixed centroid list))
      "text_tfidf",      // crossJoin(broadcast(1-row countDistinct scalar))
      "text_unigram_lm", // crossJoin(broadcast(1-row corpus-total scalar))
      "text_dsir_weight", // crossJoin(broadcast(two 1-row total scalars))
      "q37_range_join",  // range containment vs broadcast 5-row tier dim
      "sample_mixture_plan", // crossJoin(broadcast(1-row total-budget scalar))
      "sample_temperature",  // crossJoin(broadcast(1-row w_total/budget scalar))
      "q67_quality_contract", // 1-row battery x 1-row FK count, both localCheckpointed
      "q73_rfm_segments",    // crossJoin(broadcast(1-row corpus max-date scalar))
      "sim_sq8",         // crossJoin(broadcast(1-row quantized query vector))
      "sim_rrf_fusion",  // crossJoin(broadcast(1-row query vector / 1-row query token set))
      "q80_chisq_independence", // crossJoin(broadcast(1-row grand-total scalar))
      "sim_ann_recall",  // crossJoin(broadcast(fixed 20-row query panel)) — the exact-recall baseline side
      "sim_hard_negatives", // crossJoin(broadcast(fixed 20-row query panel)) — the audit baseline pass
      "sim_ivf_nprobe_sweep", // crossJoin(broadcast(16 centroids / 20-row panel / 4-row nprobe list / 1-row sizes))
      "q83_benford_audit", // crossJoin(broadcast(1-row grand-total scalar))
      "text_collocation_pmi", // crossJoin(broadcast(1-row bigram-total scalar))
      "text_length_histogram", // crossJoin(broadcast(1-row doc/token-total scalar))
      "q87_clustering_coeff", // crossJoin(broadcast(two 1-row count scalars))
      "q88_fk_orphans",  // 7x crossJoin(broadcast(1-row orphan-count scalar))
      "q92_punchcard",   // crossJoin(broadcast(1-row grand-total scalar))
      "q94_audience_overlap", // crossJoin(broadcast(|types|-row sizes)) pair grid
      "q97_drift_tv",    // crossJoin(broadcast(1-row totals scalar))
      "q98_ks_pairwise", // crossJoin(broadcast(|types|-row sizes)) pair grid
      "q100_kanonymity", // crossJoin(broadcast(1-row total scalar))
      "q102_basket_lift", // crossJoin(broadcast(|brands|-row sizes / 1-row total)) pair grid
      "text_clf_gains",  // crossJoin(broadcast(1-row totals scalar))
      "text_source_overlap", // crossJoin(broadcast(|sources|-row sizes)) pair grid
      "q99_mannwhitney", // crossJoin(broadcast(|types|-row sizes)) pair grid
      "q106_welch_ttest", // crossJoin(broadcast(|types|-row co-moments)) pair grid
      "q112_path_3gram", // crossJoin(broadcast(1-row trigram-total scalar))
      "sim_pca_power", // crossJoin(broadcast(1-row n / rescale scalars))
      "q118_lorenz_revenue", // crossJoin(broadcast(1-row revenue-total scalar))
      "text_source_tv", // crossJoin(broadcast(|sources|-row sizes)) pair grid
      "text_dedup_distortion", // crossJoin(broadcast(two 1-row token-total scalars))
      "q126_pareto_8020") // crossJoin(broadcast(1-row revenue-total scalar))
    // An unpartitioned Window/WindowGroupLimit materializes its whole
    // input in ONE task ("Moving all data to a single partition") — the
    // scale-killer class the distributed two-pass prefix-rank
    // ([[graft.Qh.globalRowNumber]]) exists to replace. Tolerated only
    // where the window input is cardinality-bounded BY CONSTRUCTION:
    val globalWindowOk = Set(
      "q17_window_frame", // post-aggregate: one row per distinct day (calendar-bounded)
      "q70_user_growth",  // post-aggregate: one row per day (calendar-bounded)
      "layout_zorder",    // 16-row clustering diagnostic; the production
                          // write path (zorderLayout) is repartitionByRange
      "sim_rrf_fusion",   // rank windows run over the already-LIMIT-20
                          // top-k lists (TakeOrdered feeds them)
      "text_clf_gains",   // 10-row cumulative over the decile AGGREGATE
                          // (fixed size at any corpus scale; the corpus
                          // ranking itself is the distributed prefix-rank)
      "text_zipf_slope",  // rank window over the already-LIMIT-256 token
                          // head (TakeOrdered feeds it; fixed 256 rows at
                          // any corpus size)
      "q112_path_3gram",  // rank window over the |types|³-bounded (≤125)
                          // trigram rollup, never the event table
      "q118_lorenz_revenue", // 10-row cumulative over the decile AGGREGATE
                          // (the corpus ranking is the distributed
                          // prefix-rank, text_clf_gains discipline)
      "q119_contribution_tree", // sum() OVER () runs on the bounded
                          // (region×nation×segment) dimension grain,
                          // never the fact table
      "q89_funnel_latency") // r14 gridPercentiles: the keyless cumsum
                          // runs over the COUNTED delay-second grid
                          // (value-domain-bounded rollup, q59 class),
                          // never the event table
    // Expand feeding SortAggregate (the multi-distinct rewrite) — see
    // the msda flag below. Empty by design: no registered query may
    // ship the trap; add a name here ONLY with a one-line justification
    // proving the expanded input is cardinality-bounded.
    val expandSortAggOk = Set.empty[String]
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val df = fn(spark, Sf0001)
      val plan = df.queryExecution.executedPlan.toString
      val cartesian = plan.contains("CartesianProduct")
      val bnlj = plan.contains("BroadcastNestedLoopJoin") && !tinyBroadcastOk(name)
      val gwin = !globalWindowOk(name) && df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
        case w: org.apache.spark.sql.catalyst.plans.logical.WindowGroupLimit
          if w.partitionSpec.isEmpty => w
      }.nonEmpty
      // The multi-distinct trap (hand-fixed twice: q69 in r7, q67 in
      // r8): 2+ distinct aggregates mixed with plain ones in ONE
      // aggregate make RewriteDistinctAggregates emit Expand(×N+1)
      // feeding stacked SortAggregates over a wide expanded key — N+1
      // input copies, sort-based per-key passes, ~3× slower measured,
      // and the shuffle carries the expansion. The scale-safe spelling
      // is unpivot-first (q69) or a single-distinct aggregate per
      // branch (q67). Flagged on Expand+SortAggregate CO-OCCURRING in
      // one executed plan; rollup/cube's Expand stays hash-aggregated
      // so it does not trip this.
      val msda = !expandSortAggOk(name) &&
        plan.contains("Expand") && plan.contains("SortAggregate")
      if (cartesian || bnlj || gwin || msda)
        Some(s"$name (cartesian=$cartesian bnlj=$bnlj globalWindow=$gwin " +
          s"expandSortAgg=$msda)")
      else None
    }
    assert(offenders.isEmpty, s"scale-hostile plans in: ${offenders.mkString(", ")}")
  }

  test("the Expand→SortAggregate gate really catches the multi-distinct " +
      "trap: q69's pre-fix spelling must trip it") {
    // Positive control so the sweep above can't rot into a tautology:
    // rebuild the exact shape that shipped (and was reverted) twice —
    // five countDistincts mixed with min/max/sum in one aggregate —
    // and assert it produces the Expand + SortAggregate co-occurrence
    // the gate rejects. If a Spark upgrade starts planning this shape
    // hash-aggregated, this control fails and the gate can be retired.
    val o = Tables(spark, Sf0001, "orders")
      .withColumn("day", col("o_orderdate").cast("date"))
    def metrics(c: String, render: Column) = Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c"),
      countDistinct(col(c)).as(s"dist_$c"),
      min(render).as(s"min_$c"), max(render).as(s"max_$c"))
    val aggs = count(lit(1)).as("n") +:
      (metrics("o_orderkey", col("o_orderkey").cast("string")) ++
        metrics("o_custkey", col("o_custkey").cast("string")) ++
        metrics("o_orderstatus", col("o_orderstatus")) ++
        metrics("o_orderpriority", col("o_orderpriority")) ++
        metrics("day", col("day").cast("string")))
    val plan = o.agg(aggs.head, aggs.tail: _*)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand") && plan.contains("SortAggregate"),
      s"the multi-distinct control no longer plans as Expand+SortAggregate " +
        s"— re-evaluate the gate:\n$plan")
  }

  test("sample_split never puts a near-dup pair across the train/eval boundary") {
    // The invariant the split exists for: every Jaccard>=0.8 pair (from
    // the registered all-pairs baseline) must land in ONE split — doc-
    // level hashing would leak eval docs into training via near-dups.
    val split = q("sample_split").select(col("doc_id"), col("split"))
    val leaks = q("q28a_jaccard_pairs").filter(col("jaccard") >= 0.8)
      .join(split.select(col("doc_id").as("a"), col("split").as("sa")), Seq("a"))
      .join(split.select(col("doc_id").as("b"), col("split").as("sb")), Seq("b"))
      .filter(col("sa") =!= col("sb"))
    assert(leaks.count() == 0, "near-dup pair straddles splits")
    // and the split is a partition of the corpus with all three classes
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == Tables(spark, Sf0001, "documents").count())
  }

  test("split-from-materialized-clusters ≡ split from a live clusterDocs run") {
    // The cluster-once-consume-many contract: writeClusters → parquet →
    // splitFromClusters must yield byte-identical assignments to running
    // the clustering inline (what sample_split gates through its memoized
    // table). A drift here would silently decouple consumers from the
    // closure the oracle certifies.
    import graft.operators.Dedup
    val tmp = java.nio.file.Files.createTempDirectory("clusters-spec-").toString
    Dedup.writeClusters(Tables(spark, Sf0001, "documents"), tmp)
    val fromTable = Dedup.splitFromClusters(spark.read.parquet(tmp))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val live = Dedup.splitFromClusters(
        Dedup.clusterDocs(Tables(spark, Sf0001, "documents")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(fromTable == live)
    assert(fromTable.nonEmpty)
  }

  test("LSH banding recovers >=90% of exact Jaccard>=0.8 pairs (measured recall)") {
    // Theoretical recall at J=0.8 with 4 bands x 2 rows: 1-(1-0.8^2)^4 ≈
    // 0.983. Measure on real data: exact pairs from the all-pairs
    // baseline (q28a relation), candidates from MinHash band collisions.
    // exact set = the registered all-pairs baseline; candidates = the
    // shared band-explode helper — both reused so this test measures the
    // very relation and posting generation the queries run
    val exact = q("q28a_jaccard_pairs")
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture has no exact near-dup pairs")
    val docs = Tables(spark, Sf0001, "documents")
      .select(col("doc_id"), col("source"), Dedup.tokHashes(col("text")).as("tk"))
      .withColumn("mhs", Dedup.minhashSig(col("tk")))
    val banded = Dedup.bandExplode(docs, "mhs", Seq("source", "doc_id"))
    val cand = banded.select(col("source"), col("band"), col("bkey"), col("doc_id").as("a"))
      .join(banded.select(col("source"), col("band"), col("bkey"), col("doc_id").as("b")),
        Seq("source", "band", "bkey"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct().as[(Long, Long)].collect().toSet
    val recall = (exact & cand).size.toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall over ${exact.size} exact pairs")
  }

  test("exact-cap shard packing resets at boundaries and never exceeds the budget") {
    // sf0.01 sources total < 2000 tokens, so the oracle compare never
    // crosses a shard boundary — drive the reset logic explicitly
    val ntoks = Seq(1500, 600, 1400, 1, 3000, 10)
    val docs = ntoks.zipWithIndex.map { case (n, i) =>
      (i.toLong, "s", Seq.fill(n)("w").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val d = java.nio.file.Files.createTempDirectory("graft_shard_").toFile.getAbsolutePath
    docs.write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = SparkEntry.queries("shard_pack_exact")(spark, d)
      .select("doc_id", "shard", "ntok").as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._2).toSeq == Seq(0L, 1L, 1L, 2L, 3L, 4L), s"shards ${out.toSeq}")
    // cap invariant: a shard exceeds the budget only when a single doc does
    val perShard = out.groupBy(_._2).values.map(g => (g.map(_._3).sum, g.length))
    assert(perShard.forall { case (tot, n) => tot <= 2000 || n == 1 })
  }

  test("cosine top-k equals brute force on a second query vector") {
    val topk = Similarity.cosineTopK(spark, Sf0001, 7L, 3).select("vec_id").as[Long].collect().toSeq
    assert(topk.length == 3 && !topk.contains(7L))
  }

  test("pack_sequences: windows are exactly SeqLen, docs conserved, offsets contiguous") {
    // Planted corpus: token counts straddle window boundaries (700 spans
    // two 512-windows; 836 spans the next two...).
    val ntoks = Seq(700, 324, 512, 836, 5)
    val docs = ntoks.zipWithIndex.map { case (n, i) =>
      (i.toLong, "s", Seq.fill(n)("w").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val d = java.nio.file.Files.createTempDirectory("graft_pack_").toFile.getAbsolutePath
    docs.write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = SparkEntry.queries("pack_sequences")(spark, d)
      .select("seq_id", "doc_id", "start_tok", "n_tok", "offset_in_seq")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val L = TextOps.SeqLen
    // conservation: each doc's contributions cover [0, ntok) exactly
    ntoks.zipWithIndex.foreach { case (n, i) =>
      val segs = out.filter(_._2 == i.toLong).sortBy(_._3)
      assert(segs.map(_._4).sum == n.toLong, s"doc $i tokens not conserved")
      val covered = segs.scanLeft(0L) { case (acc, (_, _, st, nt, _)) =>
        assert(st == acc, s"doc $i gap at $acc"); acc + nt
      }.last
      assert(covered == n.toLong)
    }
    // window invariant: every seq except the global last per source is
    // exactly L tokens, filled contiguously from offset 0
    val bySeq = out.groupBy(_._1)
    val lastSeq = bySeq.keys.max
    bySeq.foreach { case (seq, segs) =>
      val tot = segs.map(_._4).sum
      if (seq != lastSeq) assert(tot == L, s"seq $seq has $tot tokens")
      val sorted = segs.sortBy(_._5)
      assert(sorted.head._5 == 0L, s"seq $seq starts at ${sorted.head._5}")
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a._5 + a._4 == b._5, s"seq $seq not contiguous")
        case _ =>
      }
    }
    // total stream length: sum over seqs == sum of ntok
    assert(out.map(_._4).sum == ntoks.map(_.toLong).sum)
  }

  test("pack_sequences plan contains no window partitioned by source alone (distributed prefix sum)") {
    // The 100 TB guard for the packing cumsum: WindowExec materializes
    // each partition key in ONE task, so a window keyed by `source`
    // alone serializes a whole source onto a single task. The prefix
    // sum must stay bucketed — every window's key set must be wider
    // than {source}.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}
    val offenders = q("pack_sequences").queryExecution.optimizedPlan.collect {
      case w: LogicalWindow
          if w.partitionSpec.flatMap(_.references.toSeq.map(_.name)).toSet == Set("source") =>
        w.partitionSpec.map(_.sql).mkString("(", ", ", ")")
    }
    assert(offenders.isEmpty, s"source-only windows: ${offenders.mkString("; ")}")
  }

  test("pack_sequences output is bucket-count-invariant (the distributed prefix sum is exact at any fan-out)") {
    // The bucket count only chooses the parallelism of the cumsum; the
    // offsets must compose to the same global prefix sum at ANY fan-out,
    // including the degenerate single bucket (≡ the old per-source
    // window) and a count that forces multi-bucket sources.
    val docs = Tables(spark, Sf0001, "documents")
    def run() = TextOps.packSequences(docs)
      .orderBy("source", "seq_id", "doc_id").collect().toSeq
    val base = run()
    assert(base.nonEmpty)
    Seq("1", "3").foreach { n =>
      spark.conf.set("spark.graft.pack.buckets", n)
      try assert(run() == base, s"$n-bucket run diverges from the 256-bucket default")
      finally spark.conf.unset("spark.graft.pack.buckets")
    }
  }

  test("sample_shuffle: a reproducible permutation — every doc exactly once, ranks dense per shard") {
    val a = SparkEntry.queries("sample_shuffle")(spark, Sf0001)
      .select("shard", "rk", "doc_id").as[(Long, Long, Long)].collect().toSeq
    val b = SparkEntry.queries("sample_shuffle")(spark, Sf0001)
      .select("shard", "rk", "doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(a == b, "shuffle is not deterministic across runs")
    val docs = a.map(_._3)
    assert(docs.distinct.size == docs.size, "a doc appears twice")
    assert(docs.size == 500, s"expected the full corpus, got ${docs.size}")
    a.groupBy(_._1).foreach { case (shard, rows) =>
      assert(rows.map(_._2).sorted == (1L to rows.size).toSeq,
        s"shard $shard ranks not dense")
    }
    // the permutation actually permutes: doc_id order within a shard is
    // not the identity ascending order
    assert(a.groupBy(_._1).values.exists(rs =>
      rs.sortBy(_._2).map(_._3) != rs.map(_._3).sorted))
  }

  test("shuffleShards at 64 shards: conf-driven, deterministic, per-shard order shard-count-independent") {
    // Scale contract: shards ≈ reader count (each shard's rank window is
    // one task). Ordering within a shard is the global (skey, doc_id)
    // total order restricted to the shard, so re-sharding re-partitions
    // but never reorders any reader's stream.
    val docs = Tables(spark, Sf0001, "documents")
    def run(df: org.apache.spark.sql.DataFrame) = df
      .select("shard", "rk", "doc_id", "skey").as[(Long, Long, Long, Long)]
      .collect().toSeq.sortBy(r => (r._1, r._2))
    val a = run(TextOps.shuffleShards(docs, shards = 64L))
    assert(a == run(TextOps.shuffleShards(docs, shards = 64L)), "not deterministic at 64")
    assert(a.map(_._1).distinct.size > 8, "64-way split must use more shards than the default 8")
    spark.conf.set("spark.graft.shuffle.shards", "64")
    try assert(run(TextOps.shuffleShards(docs)) == a, "conf must drive the default shard count")
    finally spark.conf.unset("spark.graft.shuffle.shards")
    // every doc exactly once, and each shard's rank order IS the global
    // total order (skey, doc_id) restricted to the shard — at 8 and 64
    val at8 = run(TextOps.shuffleShards(docs, shards = 8L))
    Seq(a, at8).foreach { rows =>
      assert(rows.map(_._3).distinct.size == rows.size)
      rows.groupBy(_._1).foreach { case (s, rs) =>
        val byRank = rs.sortBy(_._2).map(r => (r._4, r._3))
        assert(byRank == byRank.sorted,
          s"shard $s rank order is not the restriction of the global key order")
      }
    }
  }

  test("q46 LOCF: per-user grid is contiguous, observed days carry their close, gaps carry the last close") {
    val rows = q("q46_resample_locf")
      .select($"user_id", $"day".cast("string"), $"filled_c", $"is_observed")
      .as[(Long, String, Long, Boolean)].collect().toSeq
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (u, rs) =>
      val days = rs.map(_._2).sorted
      // contiguity: grid length == span in days (string dates sort chronologically)
      val span = java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.parse(days.head), java.time.LocalDate.parse(days.last))
      assert(days.size.toLong == span + 1, s"user $u grid has holes")
      val ordered = rs.sortBy(_._2)
      assert(ordered.head._4, s"user $u first grid day must be observed")
      // LOCF: a non-observed day's value equals the previous day's value
      ordered.sliding(2).foreach {
        case Seq(prev, cur) if !cur._4 =>
          assert(cur._3 == prev._3, s"user $u ${cur._2}: gap day not carried forward")
        case _ =>
      }
    }
    // observed days must agree with an independently computed daily close
    val expected = {
      val ev = Tables(spark, Sf0001, "events")
        .select($"user_id", date_trunc("day", $"ts").cast("string").as("day"),
          $"ts", $"event_id", graft.Qh.cents($"value").as("c"))
        .as[(Long, String, java.sql.Timestamp, Long, Long)].collect().toSeq
      ev.groupBy(r => (r._1, r._2.substring(0, 10)))
        .map { case (k, es) => k -> es.maxBy(e => (e._3.getTime, e._4))._5 }
    }
    rows.filter(_._4).foreach { case (u, day, c, _) =>
      assert(expected((u, day.substring(0, 10))) == c, s"user $u $day close mismatch")
    }
  }

  test("text_dsir_weight: target-language docs score higher than off-target on average") {
    val rows = q("text_dsir_weight")
      .select($"lang", $"dsir_sum_ppb", $"n_tok").as[(String, Long, Long)].collect().toSeq
    val mean = rows.groupBy(_._1 == "en").map { case (k, rs) =>
      // per-token-normalized mean so doc length doesn't dominate
      k -> rs.map(r => r._2.toDouble / r._3).sum / rs.size
    }
    assert(mean(true) > mean(false),
      s"en mean ${mean(true)} must exceed non-en mean ${mean(false)} — " +
        "the importance weight must attract its own target distribution")
  }

  test("text_inverted_index: df/tf_total/head posting agree with an independent count") {
    val idx = q("text_inverted_index")
      .select($"token", $"df", $"tf_total", $"top_doc_id", $"top_tf")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val toks = Tables(spark, Sf0001, "documents")
      .select($"doc_id", explode(split($"text", " ")).as("token"))
      .as[(Long, String)].collect().toSeq
    val byTok = toks.groupBy(_._2)
    assert(idx.map(_._1).toSet == byTok.keySet, "vocabulary mismatch")
    idx.foreach { case (t, df, tfTotal, topDoc, topTf) =>
      val postings = byTok(t).groupBy(_._1).map { case (d, xs) => (d, xs.size.toLong) }
      assert(df == postings.size, s"$t df")
      assert(tfTotal == postings.values.sum, s"$t tf_total")
      val (bd, btf) = postings.toSeq.maxBy { case (d, tf) => (tf, -d) }
      assert((topDoc, topTf) == (bd, btf), s"$t head posting")
    }
  }
}
