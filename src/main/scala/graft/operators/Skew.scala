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

  /** Two-phase (salted) sum-like aggregation: groupBy(key, salt) computes
    * partial aggregates in parallel across `n` reducers per key, then a
    * second tiny shuffle on `key` merges the partials. Correct for any
    * algebraic aggregate expressed as (partial, merge) column pairs.
    *
    * At scale: the first shuffle spreads a hot key over n partitions; the
    * second shuffle moves only #keys × n rows.
    */
  def saltedSum(df: DataFrame, key: Seq[String], saltFrom: Column, n: Int,
      sums: (String, Column)*): DataFrame = {
    val salted = df.withColumn("__salt", pmod(hash(saltFrom), lit(n)))
    val partial = salted
      .groupBy((key :+ "__salt").map(col): _*)
      .agg(sums.head._2.as(sums.head._1), sums.tail.map { case (a, c) => c.as(a) }: _*)
    partial
      .groupBy(key.map(col): _*)
      .agg(sum(col(sums.head._1)).as(sums.head._1),
        sums.tail.map { case (a, _) => sum(col(a)).as(a) }: _*)
  }

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
}
