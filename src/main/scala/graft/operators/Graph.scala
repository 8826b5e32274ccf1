package graft.operators

import graft.{QueryDef, Qh}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over the customer↔supplier co-purchase
  * graph (edges = distinct (o_custkey, l_suppkey) pairs witnessed by
  * lineitem ⋈ orders). Complements [[Dedup]]'s connected-components
  * (label propagation): PageRank is the OTHER canonical bulk-iterative
  * graph shape — fixed-point score propagation — and exercises the loop-
  * with-lineage-control pattern (localCheckpoint per superstep, exactly
  * like dedup_cluster) that any Pregel-style computation on Spark needs.
  *
  * Integer-exact discipline: ranks are scaled longs (R0 = 1e12), every
  * contribution is `pr div deg` (integer division) and the damping step
  * is `(85 · Σ) div 100` — both engines run the identical integer
  * recurrence, so a 3-iteration unroll in portable SQL reproduces the
  * loop bit-for-bit. No float accumulates anywhere until the final
  * display column.
  *
  * Scale notes: each superstep is one equi-join (rank → edge src) plus
  * one groupBy(dst) with map-side partial aggregation — the standard
  * distributed PageRank; the edge list is the only large operand and is
  * localCheckpointed once. Total rank mass is N·R0, so a single node's
  * rank is < N·R0 and the 85·Σ intermediate stays within signed 64-bit
  * for N ≲ 10^5 at R0=1e12; a 100 TB graph (N ~ 1e9) would set
  * R0 = 1e18/N — same recurrence, rescaled constant.
  */
object Graph {
  import Qh._

  /** Node encoding: customers at 2·custkey, suppliers at 2·suppkey+1 —
    * integer node ids shuffle as 8-byte keys (a string tag would hash
    * variable-length keys on every superstep). */
  private val R0 = 1000000000000L

  /** One PageRank superstep on the undirected edge list (already keyed
    * src→dst both directions): contrib = pr div deg, damped sum. */
  private def step(und: DataFrame, deg: DataFrame, rank: DataFrame): DataFrame = {
    val contrib = und
      .join(rank, und("src") === rank("node"))
      .select(col("dst").as("node"), expr("pr div deg").as("c"))
      .groupBy("node").agg(sum(col("c")).as("in_c"))
    deg.select(col("src").as("node"), col("deg"))
      .join(contrib, Seq("node"), "left")
      .select(col("node"), col("deg"),
        (lit(R0 * 15L / 100L) + expr("(85 * coalesce(in_c, 0)) div 100")).as("pr"))
  }

  val defs: Seq[(String, QueryDef)] = Seq(
    // q55 — 3-iteration damped PageRank (d=0.85) over the bipartite
    // co-purchase graph, top-20 hubs. The oracle unrolls the identical
    // integer recurrence as chained CTEs.
    "q55_pagerank" -> QueryDef(
      (s, d) => {
        val edges = tbl(s, d, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
          .join(tbl(s, d, "orders").select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
          .distinct()
        val und = edges
          .union(edges.select(col("dst").as("src"), col("src").as("dst")))
          .localCheckpoint()
        val deg = und.groupBy("src").agg(count(lit(1)).as("deg")).localCheckpoint()
        var rank = deg.select(col("src").as("node"), col("deg"), lit(R0).as("pr"))
        for (_ <- 1 to 3)
          rank = step(und, deg, rank).localCheckpoint()
        rank
          .select(col("node"), col("deg"), col("pr"),
            (col("pr").cast("double") / 1.0e12).as("score"))
          .orderBy(col("pr").desc, col("node"))
          .limit(20)
      },
      Some("""WITH edges AS (
             |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
             |und AS (SELECT src, dst FROM edges
             |        UNION ALL SELECT dst, src FROM edges),
             |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
             |        FROM und GROUP BY src),
             |r0 AS (SELECT node, deg, CAST(1000000000000 AS BIGINT) AS pr FROM deg),
             |c1 AS (SELECT u.dst AS node, CAST(sum(divide(r.pr, r.deg)) AS BIGINT) AS in_c
             |       FROM und u JOIN r0 r ON u.src = r.node GROUP BY u.dst),
             |r1 AS (SELECT d.node, d.deg,
             |         150000000000 + divide(85 * COALESCE(c.in_c, 0), 100) AS pr
             |       FROM deg d LEFT JOIN c1 c ON d.node = c.node),
             |c2 AS (SELECT u.dst AS node, CAST(sum(divide(r.pr, r.deg)) AS BIGINT) AS in_c
             |       FROM und u JOIN r1 r ON u.src = r.node GROUP BY u.dst),
             |r2 AS (SELECT d.node, d.deg,
             |         150000000000 + divide(85 * COALESCE(c.in_c, 0), 100) AS pr
             |       FROM deg d LEFT JOIN c2 c ON d.node = c.node),
             |c3 AS (SELECT u.dst AS node, CAST(sum(divide(r.pr, r.deg)) AS BIGINT) AS in_c
             |       FROM und u JOIN r2 r ON u.src = r.node GROUP BY u.dst),
             |r3 AS (SELECT d.node, d.deg,
             |         150000000000 + divide(85 * COALESCE(c.in_c, 0), 100) AS pr
             |       FROM deg d LEFT JOIN c3 c ON d.node = c.node)
             |SELECT node, deg, pr, CAST(pr AS DOUBLE) / 1000000000000.0 AS score
             |FROM r3 ORDER BY pr DESC, node LIMIT 20""".stripMargin),
      doc = "3-superstep integer-exact PageRank (d=0.85) over the " +
        "customer↔supplier co-purchase graph; localCheckpoint lineage control")
  )
}
