package graft

import org.apache.spark.sql.functions._
import graft.operators.{Layout, Relational, Similarity, Temporal}

/** Specs for the round-7 additions: PageRank, Z-order layout, SCD2,
  * MERGE-upsert, int8 scalar quantization, weighted sampling, and the
  * correlated-subquery battery — the properties the DuckDB oracle can't
  * see (physical file skipping, recall, plan shape, invariants).
  */
class GraphLayoutSpec extends SparkSpec {

  private def q(name: String, dir: String = Sf0001) =
    SparkEntry.queries(name)(spark, dir)

  test("q55 PageRank: ranks bounded, mass roughly conserved, hubs are high-degree") {
    val r = q("q55_pagerank").collect()
    assert(r.length == 20)
    val R0 = 1000000000000L
    val floor = R0 * 15L / 100L
    r.foreach { row =>
      val pr = row.getAs[Long]("pr")
      assert(pr >= floor, s"rank below teleport floor: $pr")
    }
    // top hub must out-rank the floor substantially (it absorbed real mass)
    assert(r.head.getAs[Long]("pr") > 2L * R0)
    // descending order with node tiebreak
    val prs = r.map(_.getAs[Long]("pr")).toSeq
    assert(prs == prs.sorted(Ordering[Long].reverse))
  }

  test("q55 PageRank conserves total mass within integer-division slack") {
    // Unrolled total: each superstep redistributes at most the full mass;
    // `div` floors lose < 1 unit per (edge + node) per round. Run the full
    // (un-truncated) rank table by rebuilding via the registered query's
    // SQL CTE prefix — cheaper: recompute through the oracle in Spark.
    Tables.registerAll(spark, Sf0001)
    val sql = SparkEntry.oracleSql("q55_pagerank")
      .replace("ORDER BY pr DESC, node LIMIT 20", "")
    val full = spark.sql(sql)
    val n = full.count()
    val total = full.agg(sum("pr")).head.getLong(0)
    val mass0 = n * 1000000000000L
    assert(total <= mass0, "mass grew — impossible under damped integer division")
    assert(total > (mass0 * 9L) / 10L, s"mass lost >10%: $total of $mass0")
  }

  test("layout_zorder: every bucket's box is tight in BOTH dims vs single-dim sort") {
    val z = q("layout_zorder", Sf001).collect()
    assert(z.length == 16)
    val zSpan = z.map(_.getAs[Long]("box_span")).sum.toDouble / z.length
    // the same bucketing keyed by xd alone: x-span collapses, y-span ~255
    val base = Qh.tbl(spark, Sf001, "orders")
      .select(col("o_orderkey"),
        pmod(col("o_custkey"), lit(256L)).as("xd"),
        least(expr("CAST(round(o_totalprice*100) AS BIGINT) div 25000"), lit(255L)).as("yd"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("xd"), col("o_orderkey"))
    val linear = base.withColumn("bucket", ntile(16).over(w))
      .groupBy("bucket")
      .agg((max(col("xd")) - min(col("xd")) + max(col("yd")) - min(col("yd"))).as("span"))
      .collect()
    val linSpan = linear.map(_.getAs[Long]("span")).sum.toDouble / linear.length
    assert(zSpan < linSpan,
      s"z-order avg box span $zSpan not tighter than single-dim sort $linSpan")
    // and in absolute terms each z box bounds both dims well below full range
    assert(zSpan < 260.0, s"z boxes degenerate: avg span $zSpan")
  }

  test("z-order layout skips files a linear layout cannot (file-level min/max)") {
    val ordersProj = Qh.tbl(spark, Sf001, "orders")
      .select(col("o_orderkey"),
        pmod(col("o_custkey"), lit(256L)).as("xd"),
        least(expr("CAST(round(o_totalprice*100) AS BIGINT) div 25000"), lit(255L)).as("yd"))
    val zPath = Layout.zorderLayout(Sf001, "spec_orders_z", ordersProj, "xd", "yd")
    val tmp = java.nio.file.Files.createTempDirectory("graft-linear-").toString
    ordersProj.repartitionByRange(Layout.LayoutBuckets, col("o_orderkey"))
      .write.mode("overwrite").parquet(tmp)
    def intersecting(path: String): (Long, Long) = {
      val stats = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min("xd").as("x0"), max("xd").as("x1"),
          min("yd").as("y0"), max("yd").as("y1"))
      val total = stats.count()
      val hit = stats.filter(col("x1") >= 64 && col("x0") <= 95 &&
        col("y1") >= 64 && col("y0") <= 95).count()
      (hit, total)
    }
    val (zHit, zTotal) = intersecting(zPath)
    val (lHit, lTotal) = intersecting(tmp)
    assert(zTotal >= 8 && lTotal >= 8, s"layouts produced too few files: $zTotal / $lTotal")
    assert(zHit.toDouble / zTotal < 0.5,
      s"z layout should skip most files for a 32x32 box: $zHit/$zTotal")
    assert(zHit.toDouble / zTotal < lHit.toDouble / lTotal,
      s"z layout ($zHit/$zTotal) must beat linear ($lHit/$lTotal)")
  }

  test("q51 SCD2: versions dense, intervals chain exactly, one current row per user") {
    val rows = q("q51_scd2", Sf0001).collect()
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    byUser.foreach { case (u, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("version"))
      assert(sorted.map(_.getAs[Long]("version")).toSeq == (1L to sorted.length).toSeq,
        s"user $u versions not dense")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[java.sql.Timestamp]("valid_to") ==
            b.getAs[java.sql.Timestamp]("valid_from"),
            s"user $u interval chain broken at version ${a.getAs[Long]("version")}")
        case _ =>
      }
      assert(sorted.count(_.getAs[Boolean]("is_current")) == 1, s"user $u current rows != 1")
      assert(sorted.last.getAs[Boolean]("is_current"))
    }
    // change compression really happened: fewer versions than events
    val nEvents = Qh.tbl(spark, Sf0001, "events").count()
    assert(rows.length < nEvents)
  }

  test("q52 MERGE: insert/update/keep present, deletes absent, insert cohort correct") {
    val out = q("q52_merge_upsert", Sf0001).collect()
    val actions = out.map(_.getAs[String]("action")).toSet
    assert(actions == Set("insert", "update", "keep"), s"actions seen: $actions")
    val insertUsers = out.filter(_.getAs[String]("action") == "insert")
      .map(_.getAs[Long]("user_id"))
    assert(insertUsers.exists(_ % 7 == 0), "no cohort-driven inserts — snapshot carve-out lost")
    // snapshot rows for the excluded cohort must never appear as keep/update
    out.filter(r => r.getAs[Long]("user_id") % 7 == 0)
      .foreach(r => assert(r.getAs[String]("action") == "insert"))
  }

  test("sim_sq8: int8 ranking recalls >=7 of the exact top-10, small quantization error") {
    val approx = q("sim_sq8").collect()
    assert(approx.length == 10)
    // recall against the exact ranking computed over ALL vectors
    val emb = Qh.tbl(spark, Sf0001, "embeddings")
    val qv = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("p_emb"))
    val exactTop = emb.filter(col("vec_id") =!= 0).crossJoin(broadcast(qv))
      .select(col("vec_id"),
        Similarity.dotD(col("embedding"), col("p_emb")).as("d"))
      .orderBy(col("d").desc, col("vec_id")).limit(10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val approxIds = approx.map(_.getAs[Long]("vec_id")).toSet
    assert((approxIds & exactTop).size >= 7,
      s"sq8 recall@10 too low: ${(approxIds & exactTop).size}")
    // per-row quantization error is small relative to the score magnitude
    approx.foreach { r =>
      val err = r.getAs[Double]("abs_err")
      val ex = math.abs(r.getAs[Double]("exact_dot"))
      assert(err <= 0.05 * math.max(ex, 1.0), s"abs_err $err too large vs $ex")
    }
  }

  test("sample_weighted: exactly 10 per source, sample skews to longer documents") {
    val out = q("sample_weighted", Sf001).collect()
    val perSource = out.groupBy(_.getAs[String]("source")).view.mapValues(_.length)
    assert(perSource.values.forall(_ == 10), s"per-source counts: ${perSource.toMap}")
    val sampleMean = out.map(_.getAs[Long]("n_chars")).sum.toDouble / out.length
    val corpusMean = Qh.tbl(spark, Sf001, "documents")
      .agg(avg(col("n_chars"))).head.getDouble(0)
    assert(sampleMean > corpusMean,
      s"length-weighted sample mean $sampleMean not above corpus mean $corpusMean")
  }

  test("rank-filter queries hit WindowGroupLimit: per-partition top-k before the shuffle") {
    // Spark 3.5+ pushes `row_number() <= k` through a WindowGroupLimit
    // node in PARTIAL mode under the exchange — each map task keeps at
    // most k rows per group, so the window shuffle carries candidates,
    // not the corpus. This is the property that makes the top-k-per-group
    // formulation scale; assert the optimization actually engages for the
    // queries built on it.
    for (name <- Seq("sample_weighted", "q52_merge_upsert", "q64_lateral_topk",
        "text_trending_terms")) {
      val plan = SparkEntry.queries(name)(spark, Sf0001)
        .queryExecution.executedPlan.toString
      assert(plan.contains("WindowGroupLimit"),
        s"$name: rank filter did not engage WindowGroupLimit\n${plan.take(2000)}")
    }
  }

  test("q54 correlated subqueries decorrelate: no per-row subquery execution in the plan") {
    val plan = q("q54_correlated").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "decorrelation produced a cartesian")
    // every surviving order really is above 2x its customer's average
    val rows = q("q54_correlated").collect()
    assert(rows.nonEmpty)
    val avgByCust = Qh.tbl(spark, Sf0001, "orders")
      .groupBy("o_custkey")
      .agg((sum(Qh.cents(col("o_totalprice"))) * 1.0 / count(lit(1))).as("avg_c"))
      .collect().map(r => r.getAs[Long]("o_custkey") -> r.getAs[Double]("avg_c")).toMap
    rows.foreach { r =>
      val pc = math.round(r.getAs[Double]("o_totalprice") * 100)
      assert(pc > 2.0 * avgByCust(r.getAs[Long]("o_custkey")))
    }
  }

  test("q62 snapshot diff: one SMJ full-outer on digests, verdicts partition the key union") {
    val df = q("q62_snapshot_diff")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") && plan.contains("FullOuter"),
      s"diff should be a sort-merge full-outer join\n${plan.take(1500)}")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
    val rows = df.collect().map(r => r.getAs[String]("verdict") -> r.getAs[Long]("n")).toMap
    val keys = Qh.tbl(spark, Sf0001, "orders")
      .filter(expr("o_orderkey % 97 <> 0 OR o_orderkey % 101 <> 0")).count()
    assert(rows.values.sum == keys, "verdicts must partition the key union")
    // the planted drift rates are ~1/97, ~1/101, ~1/89 of the keyspace
    assert(rows("inserted") > 0 && rows("deleted") > 0 && rows("changed") > 0)
    assert(rows("unchanged") > 50L * rows("changed"))
  }

  test("text_clf_linear: feature hashing means a join-free single-pass plan") {
    val df = q("text_clf_linear")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"),
      s"hashed classifier must not join a vocabulary\n${plan.take(1500)}")
    // r14: the r13 ClfProfile rewrite made per-doc scoring MAP-ONLY —
    // the former explode→HashAggregate rollup this assert expected no
    // longer exists (that was the point). The invariant now: the native
    // profile expression is in the plan, and nothing exchanges before
    // the output sort. (This stale expectation was the one genuinely
    // failing test hidden behind the r13 driver run's truncated capture.)
    assert(plan.contains("clfprofile"),
      s"per-doc scoring should be the native ClfProfile pass\n${plan.take(1500)}")
    assert(!plan.contains("hashpartitioning"),
      s"map-only scoring must not exchange before the output sort\n${plan.take(1500)}")
    // sanity: weights are signed and roughly balanced corpus-wide
    val agg = df.agg(sum("n_pos").as("p"), sum("n_neg").as("n")).head
    val (p, n) = (agg.getAs[Long]("p"), agg.getAs[Long]("n"))
    assert(p > 0 && n > 0 && math.abs(p - n) < (p + n) / 2)
  }

  test("sample_temperature: T=0.5 compresses rate spread vs proportional sampling") {
    val rows = q("sample_temperature", Sf001).collect()
    // weights sum to ~1e6 (floor slack only)
    val wsum = rows.map(_.getAs[Long]("weight_ppm")).sum
    assert(wsum > 999900L && wsum <= 1000000L, s"weight_ppm sum $wsum")
    // temperature up-samples the smallest source relative to the largest:
    // epochs_milli must be anti-monotone in supply
    val bySupply = rows.sortBy(_.getAs[Long]("supply_tok"))
    val eps = bySupply.map(_.getAs[Long]("epochs_milli"))
    assert(eps.head >= eps.last,
      s"smallest source should get >= epochs of the largest: ${eps.head} vs ${eps.last}")
    // and the planned token total never exceeds the budget
    val planned = rows.map(_.getAs[Long]("target_tok")).sum
    val budget = rows.map(_.getAs[Long]("supply_tok")).sum
    assert(planned <= budget)
  }

  test("q66 triangles: per-node counts equal the brute-force all-triple join on the same kNN graph") {
    val r = q("q66_triangles").collect()
      .map(x => x.getAs[Long]("vec_id") -> x.getAs[Long]("tri")).toMap
    // rebuild the same symmetrized kNN(3) edge set and count naively
    import graft.operators.Similarity.{dotD, lshBucket, normD}
    val emb = Qh.tbl(spark, Sf0001, "embeddings")
      .select(col("vec_id"), col("embedding"),
        lshBucket(col("embedding")).as("bucket"), normD(col("embedding")).as("nrm"))
    val knn = emb.join(emb.select(col("bucket"), col("vec_id").as("nbr_id"),
        col("embedding").as("eb"), col("nrm").as("nb")), Seq("bucket"))
      .filter(col("vec_id") =!= col("nbr_id"))
      .select(col("vec_id"), col("nbr_id"),
        (dotD(col("embedding"), col("eb")) / (col("nrm") * col("nb"))).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("cosine").desc, col("nbr_id"))
    val pairs = knn.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
      .select(least(col("vec_id"), col("nbr_id")).as("u"),
        greatest(col("vec_id"), col("nbr_id")).as("v")).distinct()
    val brute = pairs.as("p1")
      .join(pairs.as("p2"), col("p1.v") === col("p2.u"))
      .join(pairs.as("p3"), col("p1.u") === col("p3.u") && col("p2.v") === col("p3.v"))
      .select(explode(array(col("p1.u"), col("p1.v"), col("p2.v"))).as("n"))
      .groupBy("n").count().collect()
      .map(x => x.getAs[Long]("n") -> x.getAs[Long]("count")).toMap
    val topBrute = brute.toSeq.sortBy { case (n, t) => (-t, n) }.take(r.size).toMap
    assert(r == topBrute, s"edge-iterator top-${r.size} != brute force")
  }

  test("q65 linear interpolation: observed days exact, gaps strictly between neighbors") {
    val rows = q("q65_interp_linear").collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Any]("interp_c") != null))
    // group per user in day order; every gap value must lie within the
    // [min, max] of the surrounding observed closes (floor-div slack safe)
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val seq = rs.sortBy(_.getAs[java.sql.Date]("day").toString)
      var prevObs = Option.empty[Long]
      var i = 0
      while (i < seq.length) {
        val r = seq(i)
        val v = r.getAs[Long]("interp_c")
        if (r.getAs[Boolean]("is_observed")) prevObs = Some(v)
        else {
          val next = seq.drop(i).find(_.getAs[Boolean]("is_observed"))
            .map(_.getAs[Long]("interp_c"))
          (prevObs, next) match {
            case (Some(p), Some(n)) =>
              assert(v >= math.min(p, n) - 1 && v <= math.max(p, n),
                s"gap value $v outside [${math.min(p, n)}, ${math.max(p, n)}]")
            case _ => fail("interior gap without both neighbors")
          }
        }
        i += 1
      }
    }
  }

  test("sim_kcenter: greedy invariant (far_cos non-decreasing) and round-2 pick is the true farthest") {
    val rows = q("sim_kcenter").collect().sortBy(_.getAs[Long]("sel_round"))
    assert(rows.length == graft.operators.Similarity.KCenterK)
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length == rows.length)
    val far = rows.map(_.getAs[Double]("far_cos"))
    assert(far.head == 1.0)
    // each later pick is nearer to the chosen set than the pick before it
    far.drop(1).sliding(2).foreach { p =>
      if (p.length == 2) assert(p(0) <= p(1) + 1e-12, s"greedy order violated: ${far.toSeq}")
    }
    // independent check of round 2: the true min-cosine vector vs the seed
    import graft.operators.Similarity.{dotD, normD}
    val emb = Qh.tbl(spark, Sf0001, "embeddings")
      .select(col("vec_id"), col("embedding"), normD(col("embedding")).as("nrm"))
    val seed = emb.filter(col("vec_id") === 0L)
      .select(col("embedding").as("ce"), col("nrm").as("cn"))
    val truly = emb.crossJoin(broadcast(seed))
      .select(col("vec_id"),
        (dotD(col("embedding"), col("ce")) / (col("nrm") * col("cn"))).as("c"))
      .filter(col("vec_id") =!= 0L)
      .orderBy(col("c").asc, col("vec_id")).limit(1).head()
    assert(rows(1).getAs[Long]("vec_id") == truly.getLong(0))
    assert(math.abs(rows(1).getAs[Double]("far_cos") - truly.getDouble(1)) < 1e-12)
  }

  test("sim_mmr: picked scores non-increasing, round 1 is pure argmax relevance") {
    val rows = q("sim_mmr").collect().sortBy(_.getAs[Long]("sel_round"))
    assert(rows.length == graft.operators.Similarity.KCenterK)
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length == rows.length)
    val scores = rows.map(_.getAs[Double]("score"))
    scores.sliding(2).foreach { p =>
      if (p.length == 2) assert(p(0) >= p(1) - 1e-12,
        s"MMR maximum must be non-increasing: ${scores.toSeq}")
    }
    assert(rows.head.getAs[Double]("max_sim_picked") == 0.0)
    // round 1 ≡ argmax relevance over the pool
    import graft.operators.Similarity.{dotD, normD}
    val emb = Qh.tbl(spark, Sf0001, "embeddings")
      .select(col("vec_id"), col("embedding"), normD(col("embedding")).as("nrm"))
    val qv = emb.filter(col("vec_id") === 0L)
      .select(col("embedding").as("qe"), col("nrm").as("qn"))
    val top = emb.filter(col("vec_id") =!= 0L).crossJoin(broadcast(qv))
      .select(col("vec_id"),
        (dotD(col("embedding"), col("qe")) / (col("nrm") * col("qn"))).as("rel"))
      .orderBy(col("rel").desc, col("vec_id")).limit(1).head()
    assert(rows.head.getAs[Long]("vec_id") == top.getLong(0))
    // every max_sim_picked really is a cosine: bounded
    rows.foreach(r => assert(math.abs(r.getAs[Double]("max_sim_picked")) <= 1.0 + 1e-12))
  }

  test("layout_compact: small files merged, content checksum preserved, key ranges disjoint") {
    def parts(p: String): Seq[java.io.File] =
      new java.io.File(p).listFiles.toSeq
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    val docs = Qh.tbl(spark, Sf001, "documents")
    val rows = docs.count()
    val frag = Layout.fragmentedLayout(Sf001, "docs", docs, files = 64)
    assert(parts(frag).length == 64, "fragmented fixture should have 64 files")

    val target = (rows + 3) / 4 // aim for 4 compacted files
    val out = Layout.compactLayout(spark, frag, "doc_id", target)
    val outFiles = parts(out)
    assert(outFiles.length == 4, s"expected 4 compacted files, got ${outFiles.length}")
    // every compacted file is a real consolidation: larger than the
    // biggest fragment, and within 2x of the even share
    assert(outFiles.map(_.length).min > parts(frag).map(_.length).max)

    // content preservation: order-invariant checksum over every column
    def checksum(p: String): Long =
      spark.read.parquet(p)
        .select(Qh.strHash(concat_ws(":", col("doc_id").cast("string"),
          col("text"), col("lang"), col("source"),
          col("n_chars").cast("string"))).as("h"))
        .agg(sum(col("h"))).head.getLong(0)
    assert(checksum(frag) == checksum(out), "compaction changed the content")
    assert(spark.read.parquet(out).count() == rows)

    // clustering payoff: per-file doc_id ranges are pairwise disjoint, so
    // a point/range predicate on doc_id can skip files by footer min/max
    val ranges = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
      .collect().map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))
      .sortBy(_._1)
    assert(ranges.length == 4)
    ranges.sliding(2).foreach { pair =>
      if (pair.length == 2) assert(pair(0)._2 < pair(1)._1, "overlapping file ranges")
    }
  }
}
