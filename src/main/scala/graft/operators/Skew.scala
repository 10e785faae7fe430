package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (SURVEY §4 / the 100 TB design notes).
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; these
  * helpers cover the two cases it doesn't: hot-key *aggregations* and
  * shuffled joins against a replicable dim where one fact key dominates
  * (a single BGP peer carrying 30% of updates, one document cluster
  * with millions of near-identical rows).
  */
object Skew {

  /** Deterministic salt in [0, n) derived from a discriminator column —
    * never `rand()` (reproducibility; retries must re-produce the same
    * partition assignment).
    */
  def salt(discriminator: Column, n: Int): Column =
    pmod(xxhash64(discriminator), lit(n.toLong)).cast("int")

  /** Two-phase aggregation for hot group keys: partial aggregate on
    * (keys + salt) — spreads each hot key over n reducers — then final
    * aggregate on keys. Caller supplies re-aggregatable partial/final
    * expression pairs (sum/sum, count/sum, min/min, max/max).
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], discriminator: Column, n: Int,
                partialAggs: Seq[Column], finalAggs: Seq[Column]): DataFrame = {
    val partial = df
      .withColumn("__salt", salt(discriminator, n))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Salted shuffled equi-join: the fact side gets a deterministic salt,
    * the dim side is replicated n× with every salt value, and the join
    * key becomes (keys + salt) — a hot fact key now lands on n reducers
    * instead of one. Only for inner/left joins with a dim small enough
    * to replicate n× (but too big or too skew-prone to broadcast).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 discriminator: Column, n: Int, joinType: String = "inner"): DataFrame = {
    // the dim is REPLICATED n× — a right/full outer join would emit n
    // null-padded copies of every unmatched dim key, so fail fast
    // instead of silently multiplying rows
    require(Set("inner", "left", "leftouter").contains(
      joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left joins only (got $joinType): " +
        "the replicated dim side breaks right/full outer semantics")
    val saltedFact = fact.withColumn("__salt", salt(discriminator, n))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(n - 1)).cast("array<int>")))
    saltedFact.join(saltedDim, keys :+ "__salt", joinType).drop("__salt")
  }
}
