package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for 100 TB-scale shuffles.
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin`) handles most
  * cases at runtime; these helpers cover the two shapes AQE cannot:
  * a skewed AGGREGATE key (one hot key overwhelms a single reducer) and a
  * skewed join against a side too large to broadcast. Both use a
  * DETERMINISTIC salt — `pmod(hash(disambiguator), n)` — never `rand()`,
  * so results are reproducible and retries are safe.
  */
object Skew {

  /** One salted aggregate: output name, partial expression (phase 1,
    * per (key, salt) group), and the merge applied to the partial column
    * in phase 2 (per key). The pair must be algebraic: merge(partials) ==
    * aggregate(all rows) — e.g. (sum, sum), (count, sum), (min, min),
    * (max, max). Non-decomposable aggregates (median, count-distinct)
    * have no such pair; use approx sketches instead. */
  final case class SaltedAgg(name: String, partial: Column, merge: Column => Column)

  /** Two-phase (salted) aggregation: groupBy(key, salt) computes partial
    * aggregates in parallel across `n` reducers per key, then a second
    * tiny shuffle on `key` merges the partials with each aggregate's own
    * merge function.
    *
    * At scale: the first shuffle spreads a hot key over n partitions; the
    * second shuffle moves only #keys × n rows.
    */
  def saltedAgg(df: DataFrame, key: Seq[String], saltFrom: Column, n: Int,
      aggs: SaltedAgg*): DataFrame = {
    val salted = df.withColumn("__salt", pmod(hash(saltFrom), lit(n)))
    val partial = salted
      .groupBy((key :+ "__salt").map(col): _*)
      .agg(aggs(0).partial.as(aggs(0).name),
        aggs.tail.map(a => a.partial.as(a.name)): _*)
    partial
      .groupBy(key.map(col): _*)
      .agg(aggs(0).merge(col(aggs(0).name)).as(aggs(0).name),
        aggs.tail.map(a => a.merge(col(a.name)).as(a.name)): _*)
  }

  /** [[saltedAgg]] specialized to SUM-MERGEABLE partials ONLY (sum,
    * count — anything whose partials combine by addition). A min/max/avg
    * partial passed here would be merged wrong; use [[saltedAgg]] with an
    * explicit merge for those. */
  def saltedSum(df: DataFrame, key: Seq[String], saltFrom: Column, n: Int,
      sums: (String, Column)*): DataFrame =
    saltedAgg(df, key, saltFrom, n,
      sums.map { case (a, c) => SaltedAgg(a, c, sum(_)) }: _*)

  /** Salted join of a skewed fact side against a non-broadcastable dim:
    * the fact gets a deterministic salt in [0, n); the dim is replicated n
    * times; the join key becomes (key, salt), spreading each hot key over
    * n reducers. Row multiplicity is unchanged (each fact row matches
    * exactly its original dim rows, in exactly one salt bucket) — for
    * inner and left joins ONLY: an unmatched dim row exists in all n salt
    * replicas, so right/full outer would emit it n times. Such joins
    * need a different decomposition and are rejected here.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, saltFrom: Column,
      n: Int, joinType: String = "inner"): DataFrame = {
    val ok = Set("inner", "left", "leftouter", "semi", "leftsemi", "anti", "leftanti", "cross")
    require(ok(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin preserves multiplicity only for inner/left join types, got '$joinType': " +
        "an unmatched dim row would be emitted once per salt replica")
    val saltedFact = fact.withColumn("__salt", pmod(hash(saltFrom), lit(n)))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(n - 1))))
    saltedFact.join(replicatedDim, Seq(key, "__salt"), joinType).drop("__salt")
  }

  import graft.{QueryDef, Qh}
  import Qh._

  /** Oracle-gated skew queries over `events` — event_type has only 5
    * distinct values for ~1M rows/SF, the exact one-hot-reducer shape
    * salting exists for. The oracle is the PLAIN (unsalted) SQL: salting
    * is a pure execution-strategy rewrite and must be result-invisible. */
  val defs: Seq[(String, QueryDef)] = Seq(
    // Salted two-phase aggregate with heterogeneous merges (sum-merged
    // count/sum + min/max-merged extremes). Exact integer cents: `value`
    // carries 2 decimals, so sums are order-independent and bit-identical
    // to DuckDB's.
    "skew_salted_agg" -> QueryDef(
      (s, d) =>
        saltedAgg(tbl(s, d, "events"), Seq("event_type"), col("event_id"), 8,
          SaltedAgg("n", count(lit(1)), sum(_)),
          SaltedAgg("sum_cents", sum(cents(col("value"))), sum(_)),
          SaltedAgg("min_cents", min(cents(col("value"))), min(_)),
          SaltedAgg("max_cents", max(cents(col("value"))), max(_)))
          .orderBy("event_type"),
      Some("""SELECT event_type, count(*) AS n,
             |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_cents,
             |  min(CAST(round(value*100) AS BIGINT)) AS min_cents,
             |  max(CAST(round(value*100) AS BIGINT)) AS max_cents
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
      doc = "Salted aggregation over the 5-value event_type key; " +
        "plan spreads each key over 8 salt buckets before merging"),

    // Salted fact×dim join on the same hot key, then a per-key rollup so
    // the oracle result is compact. The dim (5 rows) would of course
    // broadcast in practice — the query exists to oracle-check the salted
    // REWRITE's row multiplicity, which is broadcast-independent.
    "skew_salted_join" -> QueryDef(
      (s, d) => {
        val ev = tbl(s, d, "events")
        val dim = ev.select(col("event_type")).distinct()
          .withColumn("weight", length(col("event_type")).cast("long"))
        saltedJoin(ev, dim, "event_type", col("event_id"), 8)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(col("weight")).as("w_sum"))
          .orderBy("event_type")
      },
      Some("""WITH dim AS (
             |  SELECT DISTINCT event_type, CAST(length(event_type) AS BIGINT) AS weight
             |  FROM events)
             |SELECT e.event_type, count(*) AS n, CAST(sum(d.weight) AS BIGINT) AS w_sum
             |FROM events e JOIN dim d USING (event_type)
             |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin),
      doc = "Salted join: fact salted in [0,8), dim replicated 8x; " +
        "multiplicity-preserving for inner/left joins"))
}
