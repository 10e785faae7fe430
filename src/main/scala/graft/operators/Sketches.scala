package graft.operators

import graft.operators.Mat._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming-friendly frequency/cardinality sketches with FULLY
  * DETERMINISTIC, cross-engine-replayable arithmetic — the 100 TB
  * answer to "how often does this term appear" and "how many distinct
  * values does this source hold" when exact answers would shuffle the
  * corpus: a Count-Min sketch is depth·width counters (a few KB)
  * built by one map-side-combined aggregate, and a HyperLogLog is m
  * registers per group. Both use [[Dedup.md5Hash60]] (60-bit md5
  * prefix) as the hash so every counter, register, and estimate is
  * bit-identical in any engine with md5 — the DuckDB oracles replay
  * the sketches end to end, unlike Spark's built-in
  * `count_min_sketch`/`approx_count_distinct` whose binary payloads
  * and HLL++ bias tables are implementation-private.
  *
  * Determinism details: CMS counters are exact long sums (order-free);
  * the HLL harmonic sum Σ2^−M_j is computed as the EXACT integer
  * Σ2^(55−M_j) (≤ m·2^55 < 2^62, no floating addition), so the final
  * estimate is one double multiply-divide chain — identical IEEE
  * operations in identical order on both engines.
  */
object Sketches {

  /** Row hash i of the CMS family: md5("i:value") mod width — depth
    * independent 60-bit hashes, one md5 per (row, value).
    */
  private def cmsHash(value: Column, row: Int, width: Int): Column =
    pmod(Dedup.md5Hash60(concat(lit(row.toString), lit(":"), value)),
      lit(width.toLong))

  /** Build Count-Min counters over a value column: (row, slot, c) with
    * c the exact number of input rows hashing there — depth·width rows
    * total regardless of input size. One explode to `depth` rows per
    * value + one map-side-combined hash aggregate; at 100 TB the
    * shuffle carries at most depth·width partial counters per task.
    */
  def cmsCounters(values: DataFrame, valueCol: String,
                  width: Int, depth: Int): DataFrame = {
    require(width > 0 && depth > 0,
      s"width ($width) and depth ($depth) must be positive")
    values
      .select(posexplode(array((0 until depth).map(r =>
        cmsHash(col(valueCol), r, width)): _*)).as(Seq("row", "slot")))
      .groupBy(col("row"), col("slot"))
      .agg(count(lit(1)).as("c"))
  }

  /** Point-estimate query terms against a counter table: the CMS
    * estimate is min over depth of the counter each row hashes the
    * term to (Cormode & Muthukrishnan 2005; over-counts only — never
    * under). `counters` is depth·width rows — broadcast; estimating is
    * a scan of the term list.
    */
  def cmsEstimate(counters: DataFrame, terms: DataFrame, termCol: String,
                  width: Int, depth: Int): DataFrame = {
    require(width > 0 && depth > 0,
      s"width ($width) and depth ($depth) must be positive")
    terms
      .select(col("*"), posexplode(array((0 until depth).map(r =>
        cmsHash(col(termCol), r, width)): _*)).as(Seq("row", "slot")))
      .join(broadcast(counters), Seq("row", "slot"), "left")
      .groupBy(terms.columns.map(col): _*)
      .agg(min(coalesce(col("c"), lit(0L))).as("cms_count"))
  }

  /** Per-group HyperLogLog registers (Flajolet et al. 2007) from the
    * 60-bit md5 hash: register index = hash mod m, rank ρ = one plus
    * the leading-zero count of the remaining 54-bit suffix, computed
    * exactly in BOTH engines as 55 − length(bin(suffix)) (the binary
    * string length IS ⌊log₂⌋+1 — no float log). Output (group, idx, M)
    * for occupied registers only; [[hllEstimate]] fills the zeros.
    * One hash aggregate; m·|groups| rows leave the map side.
    */
  def hllRegisters(values: DataFrame, valueCol: String, groupCol: String,
                   m: Int): DataFrame = {
    require(m > 0 && (m & (m - 1)) == 0, s"m ($m) must be a power of two")
    val h = Dedup.md5Hash60(col(valueCol).cast("string"))
    // exact integer h div m via bit shift — h is 60-bit, so a double
    // division would round; m is a power of two by contract
    val suffix = shiftright(h, Integer.numberOfTrailingZeros(m))
    values
      .select(col(groupCol),
        pmod(h, lit(m.toLong)).as("idx"),
        when(suffix === 0, lit(55))
          .otherwise(lit(55) - length(bin(suffix))).cast("int").as("rho"))
      .groupBy(col(groupCol), col("idx"))
      .agg(max(col("rho")).as("M"))
  }

  /** Raw HLL estimate per group: αm·m²·2⁵⁵ / Σ2^(55−M_j), with empty
    * registers contributing M_j = 0 (their 2⁵⁵ terms are added as
    * (m − occupied)·2⁵⁵ — exact long arithmetic throughout; the only
    * floating-point is the final one-multiply-one-divide). α is the
    * standard constant for the given m. The raw estimator (no
    * linear-counting small-range correction) keeps the arithmetic a
    * pure function of the registers — the oracle replays it exactly;
    * accuracy at tiny cardinalities is a documented non-goal.
    */
  def hllEstimate(registers: DataFrame, groupCol: String, m: Int): DataFrame = {
    require(m > 0 && (m & (m - 1)) == 0, s"m ($m) must be a power of two")
    val alpha =
      if (m >= 128) 0.7213 / (1.0 + 1.079 / m)
      else if (m == 64) 0.709
      else if (m == 32) 0.697
      else 0.673
    val pow55 = math.pow(2.0, 55.0) // exact in double
    registers
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("__occ"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), 55 - M)")).as("__s"))
      .select(col(groupCol),
        (lit(alpha) * lit(m.toDouble * m.toDouble) * lit(pow55) /
          (col("__s") + (lit(m.toLong) - col("__occ")) *
            lit(1L << 55)).cast("double")).as("hll_est"))
  }

  /** Bottom-k (KMV) distinct-value sketch per set (Bar-Yossef et al.
    * 2002; Beyer et al. 2007): the k smallest md5₆₀ hashes of the
    * set's DISTINCT values. The sketch HLL can't replace: k-minima
    * lists MERGE under set union and support intersection via the
    * shared-minima ratio — the audience-overlap primitive. Fully
    * deterministic (md5-keyed, engine-portable).
    *
    * Plan: one distinct, one per-set window — the rank ≤ k filter
    * lowers to a map-side partial WindowGroupLimit, so at most k rows
    * per set per task reach the shuffle.
    */
  def kmvMinima(values: DataFrame, setCol: String, valueCol: String,
                k: Int): DataFrame = {
    require(k >= 2, s"k ($k) must be >= 2")
    val w = Window.partitionBy(col("__s")).orderBy(col("h").asc)
    values
      .select(col(setCol).as("__s"),
        Dedup.md5Hash60(col(valueCol).cast("string")).as("h"))
      .na.drop()
      .distinct()
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("__s").as(setCol), col("h"),
        col("__rn").cast("long").as("rn"))
  }

  /** Pairwise distinct-union / Jaccard / intersection estimates for
    * every pair of sets, from the [[kmvMinima]] sketches: the union's
    * bottom-k is the k smallest of the MERGED minima lists (KMV's
    * closure property); with h_(k) the k-th smallest on the 2⁶⁰ grid,
    *
    *   |A ∪ B| ≈ (k−1)·2⁶⁰ / h_(k)      (exact count when < k minima)
    *   Jaccard ≈ shared-in-bottom-k / k,  |A ∩ B| ≈ Ĵ · |A ∪ B|
    *
    * quantized once each (⌊10⁶·est⌋; Ĵ and the intersection are pure
    * integer arithmetic on the union estimate). Everything after the
    * sketches runs on |sets|²·k rows — sets are GROUPS (sources,
    * shards, days), bounded by construction.
    */
  def kmvOverlapPairs(values: DataFrame, setCol: String, valueCol: String,
                      k: Int): DataFrame = {
    val m = kmvMinima(values, setCol, valueCol, k)
      .select(col(setCol).as("__s"), col("h"))
      .mat
    val sets = m.select(col("__s")).distinct()
    val pairs = sets.select(col("__s").as("set_a"))
      .crossJoin(broadcast(sets.select(col("__s").as("set_b"))))
      .filter(col("set_a") < col("set_b"))
    val fromA = pairs.join(m, col("set_a") === col("__s"))
      .select(col("set_a"), col("set_b"), col("h"),
        lit(1L).as("__ia"), lit(0L).as("__ib"))
    val fromB = pairs.join(m, col("set_b") === col("__s"))
      .select(col("set_a"), col("set_b"), col("h"),
        lit(0L).as("__ia"), lit(1L).as("__ib"))
    val merged = fromA.unionByName(fromB)
      .groupBy(col("set_a"), col("set_b"), col("h"))
      .agg(max(col("__ia")).as("__ia"), max(col("__ib")).as("__ib"))
    val w = Window.partitionBy(col("set_a"), col("set_b"))
      .orderBy(col("h").asc)
    val estC = (k - 1).toDouble * math.pow(2, 60)
    merged
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .groupBy(col("set_a"), col("set_b"))
      .agg(count(lit(1)).as("__cnt"),
        max(when(col("__rn") === k, col("h"))).as("__hk"),
        sum(col("__ia") * col("__ib")).as("__shared"))
      .select(col("set_a"), col("set_b"), col("__cnt").as("n_minima"),
        col("__shared").as("n_shared"),
        when(col("__cnt") < k, lit(1000000L) * col("__cnt"))
          .otherwise(floor(lit(1000000.0) * lit(estC) /
            col("__hk").cast("double")).cast("long")).as("union_est_q"))
      .withColumn("jacc_q",
        expr(s"(1000000L * n_shared) div least(n_minima, ${k}L)"))
      .withColumn("inter_est_q",
        expr(s"(n_shared * union_est_q) div least(n_minima, ${k}L)"))
  }

  /** Exact φ = 1/den heavy hitters WITHOUT a full-cardinality shuffle
    * — the two-pass Misra–Gries scheme: pass 1 runs an MG summary with
    * `den` counters per partition (any item with global count > N/den
    * must, by pigeonhole, exceed its share in SOME partition, and MG
    * with k counters reports everything above N_part/(k+1) — so the
    * union of partition summaries is a GUARANTEED candidate superset);
    * pass 2 exactly recounts only candidate rows and applies the
    * integer threshold `count·den > N`.
    *
    * The output is fully deterministic even though MG's candidate set
    * is partition-order dependent: false candidates are eliminated by
    * the exact recount, true heavy hitters can never be missed. At
    * 100 TB the shuffle carries candidate rows only (≤ den·partitions
    * distinct values), never the full value cardinality.
    */
  def heavyHitters(values: DataFrame, valueCol: String,
                   den: Int): DataFrame = {
    require(den >= 2, s"den ($den) must be >= 2")
    val spark = values.sparkSession
    import spark.implicits._
    val vals = values.select(col(valueCol).cast("string").as("v"))
    val cands = vals.as[String].mapPartitions { it =>
      // classic Misra–Gries with `den` counters: per-partition
      // imperative state, the documented mapPartitions exception
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { v =>
        if (counters.contains(v)) counters(v) += 1L
        else if (counters.size < den) counters(v) = 1L
        else {
          val dead = counters.collect { case (k, 1L) => k }.toList
          counters.mapValuesInPlace((_, c) => c - 1L)
          dead.foreach(counters.remove)
        }
      }
      counters.keysIterator
    }.toDF("v").distinct()
    val n = vals.count()
    vals.join(broadcast(cands), Seq("v"))
      .groupBy(col("v"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit(den.toLong) > lit(n))
      .select(col("v").as(valueCol), col("cnt"))
  }
}
