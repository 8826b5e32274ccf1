package graft

import org.apache.spark.sql.functions._

/** Planted-data proofs for the round-8 frontier/stats batch
  * (q105_interval_union, q106_welch_ttest, q107_seasonal_naive,
  * q108_item2item, q109_hits, q110_skyline, q111_l_diversity). Each
  * test hand-computes the documented closed form on inputs built to hit
  * the boundary branches the organic-testdata oracle gate cannot
  * guarantee to exercise: a fully-overlapping vs fully-disjoint interval
  * pair, the t = 0 equal-means pole and an exact df = 1 Welch pair, a
  * perfect period-7 series (MASE 0) and a constant series (NULL MASE),
  * duplicate Pareto points that must co-survive vs equal-price strict
  * dominance, and the l = 1 attribute-disclosure pole.
  */
class FrontierStatsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toAbsolutePath.toString

  private def mkEvents(rows: Seq[(Long, Long, Long, String, Double)]): String = {
    val dir = tmp("graft-frontier-ev")
    rows.toDF("event_id", "user_id", "es", "event_type", "value")
      .withColumn("ts", col("es").cast("timestamp"))
      .select("event_id", "user_id", "ts", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def mkDocs(rows: Seq[(Long, String, String)]): String = {
    val dir = tmp("graft-frontier-doc")
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def mkLineitem(dir: String, rows: Seq[(Long, Long, Double, Double)]): Unit =
    rows.zipWithIndex.map { case ((ok, pk, qty, price), i) =>
      (ok, pk, 1L, i + 1, qty, price, 0.0, 0.0, "N", "O",
        new java.sql.Timestamp(0L))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

  test("q105_interval_union: overlapping intervals count once, disjoint " +
      "intervals add, utilization poles are exact") {
    // user 1: events at t=0 and t=300 (10-min presence each) — the
    // second interval starts inside the first: union = 300 + 600 = 900 s
    // over a 900 s span -> util exactly 1000000 ppm.
    // user 2: events at t=0 and t=2000 — disjoint: union = 1200 s,
    // span = 2600 s, util = 1200e6 div 2600 = 461538 (truncating).
    val dir = mkEvents(Seq(
      (1L, 1L, 0L, "click", 1.0), (2L, 1L, 300L, "click", 1.0),
      (3L, 2L, 0L, "click", 1.0), (4L, 2L, 2000L, "click", 1.0)))
    val out = SparkEntry.queries("q105_interval_union")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) == ((2L, 900L, 900L, 1000000L)),
      s"overlap must merge: ${out(1L)}")
    assert(out(2L) == ((2L, 1200L, 2600L, 461538L)),
      s"disjoint must add: ${out(2L)}")
  }

  test("q106_welch_ttest: equal means read t = 0, a zero-variance side " +
      "gives the exact df = n-1 pole, and a planted t = -4 is exact") {
    // a = {1,2,3} (n 3, mean 200c, var 10000c²), b = {0,4} (n 2,
    // mean 200c, var 80000c²), c = {10,10,10} (n 3, var 0).
    // (a,b): t = 0 exactly. (a,c): se2 = 10000/3, t = -800/sqrt(10000/3)
    // = -13.8564, df = 2.00 exactly (the zero-variance side drops out).
    // (b,c): se2 = 40000, t = -800/200 = -4.0000, df = 1.00 exactly.
    val dir = mkEvents(Seq(
      (1L, 1L, 10L, "a", 1.0), (2L, 1L, 20L, "a", 2.0), (3L, 1L, 30L, "a", 3.0),
      (4L, 1L, 40L, "b", 0.0), (5L, 1L, 50L, "b", 4.0),
      (6L, 1L, 60L, "c", 10.0), (7L, 1L, 70L, "c", 10.0), (8L, 1L, 80L, "c", 10.0)))
    val out = SparkEntry.queries("q106_welch_ttest")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(6), r.getDouble(7), r.getBoolean(8))).toMap
    assert(out(("a", "b")) == ((0.0, 1.17, false)), s"equal means: $out")
    assert(out(("a", "c")) == ((-13.8564, 2.0, true)), s"df pole: $out")
    assert(out(("b", "c")) == ((-4.0, 1.0, true)), s"exact t: $out")
  }

  test("q107_seasonal_naive: a perfect period-7 series scores MASE 0; " +
      "a constant series yields NULL (naive denominator is zero)") {
    // type "s7": 14 days, daily counts 1..7 repeated — every lag-7
    // forecast is exact (sum_abs_err 0 over 7 scored days) while the
    // lag-1 naive errs 18 over 13 days. type "flat": 9 days of 2
    // events — both errors 0, so the ppm ratio must be NULL, not 0.
    val day = 86400L
    var id = 0L
    def burst(typ: String, d: Long, k: Int) = (1 to k).map { i =>
      id += 1; (id, 1L, d * day + i, typ, 1.0)
    }
    val dir = mkEvents(
      (0L to 13L).flatMap(d => burst("s7", d, (d % 7).toInt + 1)) ++
        (0L to 8L).flatMap(d => burst("flat", d, 2)))
    val rows = SparkEntry.queries("q107_seasonal_naive")(spark, dir).collect()
    val out = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5)))).toMap
    assert(out("s7") == ((7L, 0L, 13L, 18L, Some(0L))),
      s"period-7 must backtest exactly: ${out("s7")}")
    assert(out("flat") == ((2L, 0L, 8L, 0L, None)),
      s"constant series must read NULL MASE: ${out("flat")}")
  }

  test("q108_item2item: hand-counted cosine ranking over baskets") {
    // Baskets {A,B}, {A,B}, {A,C}: n_A=3, n_B=2, n_C=1, co(A,B)=2,
    // co(A,C)=1. cos²(A,B) = 4e6 div 6 = 666666; cos²(A,C) = 1e6 div 3
    // = 333333. A's rank-1 neighbor must be B, rank-2 C; C sees only A.
    val dir = tmp("graft-frontier-i2i")
    mkLineitem(dir, Seq(
      (1L, 1L, 1.0, 1.0), (1L, 2L, 1.0, 1.0),
      (2L, 1L, 1.0, 1.0), (2L, 2L, 1.0, 1.0),
      (3L, 1L, 1.0, 1.0), (3L, 3L, 1.0, 1.0)))
    val out = SparkEntry.queries("q108_item2item")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(out((1L, 1L)) == ((2L, 3L, 2L, 2L, 666666L)), s"$out")
    assert(out((1L, 2L)) == ((3L, 3L, 1L, 1L, 333333L)), s"$out")
    assert(out((2L, 1L)) == ((1L, 2L, 3L, 2L, 666666L)), s"$out")
    assert(out((3L, 1L)) == ((1L, 1L, 3L, 1L, 333333L)), s"$out")
    assert(out.size == 4, s"exactly four neighbor rows: $out")
  }

  test("q109_hits: two-superstep mutual reinforcement is hand-exact") {
    // c1 -> {s1, s2}, c2 -> {s1}. a1 = indegree: s1=2, s2=1.
    // h1: c1 = 2+1 = 3, c2 = 2. a2: s1 = h1(c1)+h1(c2) = 5, s2 = 3.
    val dir = tmp("graft-frontier-hits")
    // (orderkey, suppkey): order 1 (c1) -> s1, order 2 (c1) -> s2,
    // order 3 (c2) -> s1
    Seq((1L, 1L), (2L, 2L), (3L, 1L)).zipWithIndex.map { case ((ok, sk), i) =>
      (ok, 1L, sk, i + 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
        new java.sql.Timestamp(0L))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, 10L, "O", 1.0, new java.sql.Timestamp(0L), "1-URGENT"),
      (2L, 10L, "O", 1.0, new java.sql.Timestamp(0L), "1-URGENT"),
      (3L, 20L, "O", 1.0, new java.sql.Timestamp(0L), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("q109_hits")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 2L, 5L), (2L, 1L, 3L)),
      s"authority order must be s1(5), s2(3): ${out.toSeq}")
  }

  test("q110_skyline: duplicate frontier points co-survive; equal-price " +
      "strict dominance and cheaper-higher-volume dominance both prune") {
    // parts (price_c, qty): p1 (100, 5), p4 (100, 5) — identical, both
    // survive. p6 (100, 4) — equal price, strictly less volume: pruned.
    // p3 (150, 4) — strictly worse than p1 on both: pruned. p2 (200,
    // 10), p5 (200, 10) — identical frontier pair, both survive.
    val dir = tmp("graft-frontier-sky")
    mkLineitem(dir, Seq(
      (1L, 1L, 5.0, 1.00), (2L, 4L, 5.0, 1.00), (3L, 6L, 4.0, 1.00),
      (4L, 3L, 4.0, 1.50), (5L, 2L, 10.0, 2.00), (6L, 5L, 10.0, 2.00)))
    val out = SparkEntry.queries("q110_skyline")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 100L, 5L), (4L, 100L, 5L),
      (2L, 200L, 10L), (5L, 200L, 10L)),
      s"frontier must be exactly p1,p4,p2,p5 in price order: ${out.toSeq}")
  }

  test("q112_path_3gram: overlapping trigrams in one user stream are " +
      "each counted; ranks and ppm shares are hand-exact") {
    // user 1 stream a,b,a,b,a -> trigrams (a,b,a), (b,a,b), (a,b,a):
    // a>b>a n=2 share 666666 rank 1; b>a>b n=1 share 333333 rank 2.
    val dir = mkEvents(Seq(
      (1L, 1L, 10L, "a", 1.0), (2L, 1L, 20L, "b", 1.0),
      (3L, 1L, 30L, "a", 1.0), (4L, 1L, 40L, "b", 1.0),
      (5L, 1L, 50L, "a", 1.0)))
    val out = SparkEntry.queries("q112_path_3gram")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, "a>b>a", 2L, 666666L), (2L, "b>a>b", 1L, 333333L)),
      s"overlapping trigrams must both count: ${out.toSeq}")
  }

  test("q113_source_cover: greedy picks by marginal gain with name " +
      "tiebreak; zero-gain sources drop out; exhaustion truncates rounds") {
    // s1 "a b c d e f" (5 bigrams), s2 "a b c d x y" (5, 2 new after
    // s1), s3 "e f" (0 new), s4 "p q" (1 new). Universe = 8.
    // Greedy: s1 (tie with s2 broken by name, gain 5), s2 (+2), s4 (+1).
    val dir = mkDocs(Seq(
      (1L, "a b c d e f", "s1"), (2L, "a b c d x y", "s2"),
      (3L, "e f", "s3"), (4L, "p q", "s4")))
    val out = SparkEntry.queries("q113_source_cover")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq((1L, "s1", 5L, 5L, 625000L),
      (2L, "s2", 2L, 7L, 875000L), (3L, "s4", 1L, 8L, 1000000L)),
      s"greedy trace must be exact: ${out.toSeq}")
    // exhaustion: the second source adds nothing -> one row only
    val dir2 = mkDocs(Seq((1L, "a b c", "s1"), (2L, "a b", "s2")))
    val out2 = SparkEntry.queries("q113_source_cover")(spark, dir2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out2.toSeq == Seq((1L, "s1", 2L)),
      s"covered-out rounds must truncate: ${out2.toSeq}")
  }

  test("q114_sssp: hand-built weighted graph — seed is the tie-broken " +
      "top-degree node, distances relax through the cheap edge") {
    // custs 10, 20 -> nodes 20, 40; supps 1, 2 -> nodes 3, 5.
    // co(10,1)=4 -> w 250000; co(10,2)=1 -> w 1e6; co(20,2)=2 -> w 5e5.
    // degrees: node20=2, node5=2, node3=1, node40=1 -> seed = node 5
    // (deg tie with 20, lower id). d: 5->0, 40->5e5 (via c20),
    // 20->1e6, 3->1.25e6 (5 -> 20 -> 3 beats nothing else).
    val dir = tmp("graft-frontier-sssp")
    val lines = Seq.fill(4)((1L, 1L)) ++ Seq((1L, 2L)) ++ Seq.fill(2)((2L, 2L))
    lines.zipWithIndex.map { case ((ok, sk), i) =>
      (ok, 1L, sk, i + 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
        new java.sql.Timestamp(0L))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, 10L, "O", 1.0, new java.sql.Timestamp(0L), "1-URGENT"),
      (2L, 20L, "O", 1.0, new java.sql.Timestamp(0L), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("q114_sssp")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((5L, 0L), (40L, 500000L), (20L, 1000000L),
      (3L, 1250000L)), s"distances must relax exactly: ${out.toSeq}")
  }

  test("q115_wilson_returns: exact sufficient statistics; Wilson bounds " +
      "bracket the rate, stay in [0, 1e6] poles outward-rounded") {
    val dir = tmp("graft-frontier-wilson")
    Seq((1L, "pA", "A", "t", 1, 1.0), (2L, "pB", "B", "t", 1, 1.0),
      (3L, "pC", "C", "t", 1, 1.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/part.parquet")
    // A: 1 return of 4; B: 0 of 3; C: 2 of 2
    val rows = Seq((1L, "R"), (1L, "N"), (1L, "N"), (1L, "N"),
      (2L, "N"), (2L, "N"), (2L, "N"), (3L, "R"), (3L, "R"))
    rows.zipWithIndex.map { case ((pk, rf), i) =>
      (100L + i, pk, 1L, i + 1, 1.0, 1.0, 0.0, 0.0, rf, "O",
        new java.sql.Timestamp(0L))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("q115_wilson_returns")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out("A")._1 == 4L && out("A")._2 == 1L && out("A")._3 == 250000L, s"$out")
    assert(out("B")._3 == 0L && out("C")._3 == 1000000L, s"$out")
    out.foreach { case (b, (n, r, rate, lo, hi)) =>
      assert(lo <= rate && rate <= hi, s"$b: bounds must bracket the rate: $out")
      assert(lo >= -1L && hi <= 1000001L, // outward ppm rounding slack
        s"$b: Wilson never leaves [0,1] beyond rounding: $out")
      assert(hi - lo < 1000000L || n < 2,
        s"$b: interval must be informative: $out")
    }
    // tighter with more data: same rate 1/4 vs 25/100
    val dir2 = tmp("graft-frontier-wilson2")
    Seq((1L, "pA", "A", "t", 1, 1.0), (2L, "pB", "B", "t", 1, 1.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir2/part.parquet")
    val r2 = (0 until 4).map(i => (1L, if (i < 1) "R" else "N")) ++
      (0 until 100).map(i => (2L, if (i < 25) "R" else "N"))
    r2.zipWithIndex.map { case ((pk, rf), i) =>
      (100L + i, pk, 1L, i + 1, 1.0, 1.0, 0.0, 0.0, rf, "O",
        new java.sql.Timestamp(0L))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir2/lineitem.parquet")
    val o2 = SparkEntry.queries("q115_wilson_returns")(spark, dir2)
      .collect().map(r => r.getString(0) -> (r.getLong(4), r.getLong(5))).toMap
    assert(o2("B")._2 - o2("B")._1 < o2("A")._2 - o2("A")._1,
      s"25/100 must be tighter than 1/4: $o2")
  }

  test("q116_anova_dow: zero within-variance reads eta2 = 1 with NULL F; " +
      "identical weekday distributions read eta2 = 0, F = 0") {
    // UTC epoch day 4 = Mon 1970-01-05, day 5 = Tue. type "sep": Mon all
    // 1.00, Tue all 3.00 -> ssw = 0: eta2 exactly 1, F guarded NULL.
    // type "same": both days {1.00, 3.00} -> ssb = 0: eta2 0, F 0.
    val day = 86400L
    val dir = mkEvents(
      (1 to 3).map(i => (i.toLong, 1L, 4 * day + i, "sep", 1.0)) ++
        (4 to 6).map(i => (i.toLong, 1L, 5 * day + i, "sep", 3.0)) ++
        Seq((7L, 1L, 4 * day + 7, "same", 1.0), (8L, 1L, 4 * day + 8, "same", 3.0),
          (9L, 1L, 5 * day + 9, "same", 1.0), (10L, 1L, 5 * day + 10, "same", 3.0)))
    val out = SparkEntry.queries("q116_anova_dow")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(out("sep") == ((6L, 2L, Some(1.0), None)),
      s"separated poles: ${out("sep")}")
    assert(out("same") == ((4L, 2L, Some(0.0), Some(0.0))),
      s"no-effect pole: ${out("same")}")
  }

  test("q117_ship_latency: hand-computed lag distribution incl. the " +
      "interpolated p90 and exact milli mean") {
    // URGENT: lags {1, 2, 3} days -> p50 = 2.0, p90 = 2.8 (quantile_cont
    // interpolation), mean 2000 milli. LOW: single lag {5}.
    val dir = tmp("graft-frontier-lat")
    def day(n: Int) = new java.sql.Timestamp(n.toLong * 86400000L)
    Seq((1L, 1L, "O", 1.0, day(0), "1-URGENT"),
      (2L, 1L, "O", 1.0, day(10), "5-LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 1), (1L, 2), (1L, 3), (2L, 15)).zipWithIndex.map {
      case ((ok, shipDay), i) =>
        (ok, 1L, 1L, i + 1, 1.0, 1.0, 0.0, 0.0, "N", "O", day(shipDay))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("q117_ship_latency")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getLong(5), r.getLong(6))).toMap
    // 2.8000000000000003 is THE IEEE double of the {1,2,3} p90
    // interpolation (1 + 0.9·2) — the q31/q103-pinned engine-shared value
    assert(out("1-URGENT") == ((3L, 1L, 2.0, 2.8000000000000003, 3L, 2000L)),
      s"urgent lags: ${out("1-URGENT")}")
    assert(out("5-LOW") == ((1L, 5L, 5.0, 5.0, 5L, 5000L)),
      s"single lag: ${out("5-LOW")}")
  }

  test("q118_lorenz_revenue: 20 linear spenders give the closed-form " +
      "cumulative curve ending at exactly 1e6") {
    // customer k spends k dollars -> decile d holds customers 2d-1, 2d
    // with (4d-1)·100 cents; cum(d) = (2d² + d)·100; total 21000.
    val dir = tmp("graft-frontier-lorenz")
    (1 to 20).map(k => (k.toLong, k.toLong, "O", k.toDouble,
        new java.sql.Timestamp(0L), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("q118_lorenz_revenue")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = (1 to 10).map { d =>
      (d.toLong, 2L, (4L * d - 1) * 100L,
        (2L * d * d + d) * 100L * 1000000L / 21000L)
    }
    assert(out.toSeq == expected, s"Lorenz curve must be closed-form: ${out.toSeq}")
    assert(out.last._4 == 1000000L, "curve must end at exactly 1e6 ppm")
  }

  test("q119_contribution_tree: three-level shares multiply back to the " +
      "planted totals") {
    // R1 { N1 { A 1.00, B 3.00 }, N2 { A 6.00 } }: A@N1 250000 of N1,
    // N1 400000 of R1, R1 1000000 of total.
    val dir = tmp("graft-frontier-tree")
    Seq((1, "R1")).toDF("r_regionkey", "r_name")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/region.parquet")
    Seq((1, "N1", 1), (2, "N2", 1)).toDF("n_nationkey", "n_name", "n_regionkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/nation.parquet")
    Seq((1L, "c1", 1, 0.0, "A"), (2L, "c2", 1, 0.0, "B"), (3L, "c3", 2, 0.0, "A"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((1L, 1L, 1.00), (2L, 2L, 3.00), (3L, 3L, 6.00)).map { case (ok, ck, v) =>
      (ok, ck, "O", v, new java.sql.Timestamp(0L), "1-URGENT")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("q119_contribution_tree")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(out(("R1", "N1", "A")) == ((100L, 250000L, 400000L, 1000000L)), s"$out")
    assert(out(("R1", "N1", "B")) == ((300L, 750000L, 400000L, 1000000L)), s"$out")
    assert(out(("R1", "N2", "A")) == ((600L, 1000000L, 600000L, 1000000L)), s"$out")
  }

  test("sample_ht_estimate: a source sampled exhaustively (≤ k docs) " +
      "reconstructs its total exactly; a big source estimates from k=10") {
    // "tiny": 5 docs -> the whole source IS the sample, τ = 0, est ==
    // exact, err_ppm == 0 (the calibration pole that must never drift).
    // "big": 40 docs -> k_sampled = 10, τ > 0, estimate positive.
    val docs = (1 to 5).map(i => (i.toLong, ("x " * (10 + i)).trim, "tiny")) ++
      (6 to 45).map(i => (i.toLong, ("y " * (5 + i % 7)).trim, "big"))
    val dir = mkDocs(docs)
    val out = SparkEntry.queries("sample_ht_estimate")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val (nT, kT, exT, esT, errT) = out("tiny")
    assert(nT == 5L && kT == 5L && esT == exT && errT == 0L,
      s"exhaustive sample must be exact: ${out("tiny")}")
    val (nB, kB, exB, esB, _) = out("big")
    assert(nB == 40L && kB == 10L && esB > 0L && exB > 0L,
      s"big source must estimate from k=10: ${out("big")}")
  }

  test("q122_wow_growth: the sign-safe branch — a 50% drop reads " +
      "exactly -500000 ppm, a 50% rise exactly +500000, first week NULL") {
    // one segment, three ISO weeks: 4.00 -> 2.00 -> 3.00 dollars.
    val dir = tmp("graft-frontier-wow")
    Seq((1L, "c1", 1, 0.0, "A"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/customer.parquet")
    // 1970-01-05 is a Monday: weeks start at days 4, 11, 18.
    def day(n: Int) = new java.sql.Timestamp(n.toLong * 86400000L)
    Seq((1L, day(4), 4.00), (2L, day(11), 2.00), (3L, day(18), 3.00))
      .map { case (ok, ts, v) => (ok, 1L, "O", v, ts, "1-URGENT") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("q122_wow_growth")(spark, dir)
      .collect().map(r => r.getDate(1).toString ->
        (r.getLong(2), if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    assert(out("1970-01-05") == ((400L, None)), s"first week NULL: $out")
    assert(out("1970-01-12") == ((200L, Some(-500000L))), s"drop: $out")
    assert(out("1970-01-19") == ((300L, Some(500000L))), s"rise: $out")
  }

  test("q124_calendar_dim: a gap day surfaces as an explicit zero-order " +
      "spine row with correct ISO attributes") {
    val dir = tmp("graft-frontier-cal")
    def day(n: Int) = new java.sql.Timestamp(n.toLong * 86400000L)
    // orders on Sat 1970-01-03 and Mon 1970-01-05; Sunday the 4th is the
    // gap the spine must surface.
    Seq((1L, day(2)), (2L, day(4)), (3L, day(4)))
      .map { case (ok, ts) => (ok, 1L, "O", 1.0, ts, "1-URGENT") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("q124_calendar_dim")(spark, dir)
      .collect().map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getBoolean(5), r.getLong(6))).toMap
    assert(out.size == 3, s"spine must densify the span: $out")
    assert(out("1970-01-03") == ((6L, true, 1L)), s"Saturday: $out")
    assert(out("1970-01-04") == ((7L, true, 0L)),
      s"gap Sunday must appear with zero orders: $out")
    assert(out("1970-01-05") == ((1L, false, 2L)), s"Monday: $out")
  }

  test("q121_join_skew: a planted hot key reads the exact skew factor") {
    // lineitem: orderkey 1 has 9 lines, orderkeys 2..10 one each ->
    // N=18, K=10, max=9, mean_milli=1800, skew_x = 9*10*1000/18 = 5000.
    val dir = tmp("graft-frontier-skew")
    val lines = Seq.fill(9)(1L) ++ (2L to 10L)
    lines.zipWithIndex.map { case (ok, i) =>
      (ok, 1L, 1L, i + 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
        new java.sql.Timestamp(0L))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, 1L, "O", 1.0, new java.sql.Timestamp(0L), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 1L, new java.sql.Timestamp(0L), "click", 1.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q121_join_skew")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out("lineitem.l_orderkey") == ((18L, 10L, 9L, 1800L, 5000L)),
      s"hot key must read skew 5.0x: $out")
    assert(out("lineitem.l_partkey") == ((18L, 1L, 18L, 18000L, 1000L)),
      s"single-key edge has skew exactly 1.0x: $out")
  }

  test("q126_pareto_8020: hand-built concentration crosses 80% at " +
      "exactly the third customer") {
    // spends 50, 20, 10, 10, 10 -> desc cum 50, 70, 80, 90, 100;
    // cum·5 ≥ total·4 first holds at rn 3 (80 of 100): k80 = 3 of 5.
    val dir = tmp("graft-frontier-pareto")
    Seq((1L, 1L, 50.0), (2L, 2L, 20.0), (3L, 3L, 10.0),
      (4L, 4L, 10.0), (5L, 5L, 10.0))
      .map { case (ok, ck, v) =>
        (ok, ck, "O", v, new java.sql.Timestamp(0L), "1-URGENT") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("q126_pareto_8020")(spark, dir).collect()
    assert(out.length == 1)
    val r = out(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((5L, 3L, 600000L, 10000L)),
      s"80/20 crossing must be exact: ${out.toSeq}")
  }

  test("q125_mix_simpson: single-segment nation reads exactly 0; an " +
      "even two-way split reads exactly 500000") {
    val dir = tmp("graft-frontier-simpson")
    Seq((1L, "c1", 1, 0.0, "A"), (2L, "c2", 2, 0.0, "A"), (3L, "c3", 2, 0.0, "B"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((1L, 1L, 5.00), (2L, 2L, 3.00), (3L, 3L, 3.00)).map { case (ok, ck, v) =>
      (ok, ck, "O", v, new java.sql.Timestamp(0L), "1-URGENT")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("q125_mix_simpson")(spark, dir)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1) == ((1L, 1000000L, 0L)), s"monoculture pole: $out")
    assert(out(2) == ((2L, 500000L, 500000L)), s"even-mix pole: $out")
  }

  test("q120_stickiness: 28-day contribution windows expire exactly — " +
      "hand-computed DAU/MAU poles") {
    // u1 active days 1 & 30, u2 day 1 only, u3 day 5 only.
    // day 1: DAU 2 / MAU 2 -> 1e6. day 5: DAU 1 / MAU {u1,u2,u3} = 3
    // -> 333333. day 30: u2's day-1 presence expired (1+27 < 30), u3's
    // day-5 presence still live (5+27 ≥ 30): DAU 1 / MAU 2 -> 500000.
    val day = 86400L
    val dir = mkEvents(Seq(
      (1L, 1L, 1 * day, "click", 1.0), (2L, 1L, 30 * day, "click", 1.0),
      (3L, 2L, 1 * day + 9, "click", 1.0), (4L, 3L, 5 * day + 3, "click", 1.0)))
    val out = SparkEntry.queries("q120_stickiness")(spark, dir)
      .collect().map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("1970-01-02") == ((2L, 2L, 1000000L)), s"$out")
    assert(out("1970-01-06") == ((1L, 3L, 333333L)), s"$out")
    assert(out("1970-01-31") == ((1L, 2L, 500000L)), s"$out")
  }

  test("sim_pca_power: a planted two-axis corpus converges onto the " +
      "dominant axis with the hand-computed integer trace") {
    // vecs: ±2 on dim 1, ±1 on dim 2 (zero mean both) -> cov diag
    // (32e6, 8e6, 0...). Hand-unrolled recurrence: dd = 33,
    // c = (969696, 242424), v1 = (999998, 249999), v2 = (999999, 62499),
    // v3 = (999999, 15624), all other dims exactly 0.
    val dir = tmp("graft-frontier-pca")
    def vec(dim: Int, mag: Float): Array[Float] = {
      val a = new Array[Float](64); a(dim) = mag; a
    }
    Seq((1L, vec(0, 2.0f), 0), (2L, vec(0, -2.0f), 0),
      (3L, vec(1, 1.0f), 1), (4L, vec(1, -1.0f), 1))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("sim_pca_power")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == ((32000000L, 999999L)), s"dominant axis: ${out(1L)}")
    assert(out(2L) == ((8000000L, 15624L)), s"minor axis decays: ${out(2L)}")
    assert((3L to 64L).forall(j => out(j) == ((0L, 0L))),
      s"orthogonal dims must read exactly zero: ${out.toSeq.sortBy(_._1).take(5)}")
  }

  test("q111_l_diversity: the l = 1 disclosure pole, an even 2-way " +
      "split, and a 5-value group land in the right bands with exact " +
      "worst shares") {
    // nation 1: 3 customers all segment X -> l=1, share 1000000.
    // nation 2: 2 X + 2 Y -> l=2, share 500000.
    // nation 3: 5 distinct segments -> l>=5 band, share 200000.
    val dir = tmp("graft-frontier-ldiv")
    val rows = (1 to 3).map(i => (i.toLong, 1, "X")) ++
      Seq((4L, 2, "X"), (5L, 2, "X"), (6L, 2, "Y"), (7L, 2, "Y")) ++
      Seq("X", "Y", "Z", "W", "V").zipWithIndex.map { case (sg, i) =>
        ((8 + i).toLong, 3, sg)
      }
    rows.map { case (ck, nk, seg) => (ck, s"c$ck", nk, 500.00, seg) }
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val out = SparkEntry.queries("q111_l_diversity")(spark, dir)
      .collect().map(r => r.getString(1) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("l=1") == ((1L, 3L, 1000000L)), s"$out")
    assert(out("l=2") == ((1L, 4L, 500000L)), s"$out")
    assert(out("l>=5") == ((1L, 5L, 200000L)), s"$out")
    assert(!out.contains("l=3-4"), s"$out")
  }
}
