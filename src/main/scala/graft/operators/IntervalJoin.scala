package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed interval-overlap join — pair every left interval with
  * every right interval it overlaps, optionally under an equi-key
  * (e.g. user_id), without a cross join and without a dedup shuffle.
  *
  * Semantics: half-open intervals `[start, end)`; a pair matches iff
  * `lStart < rEnd AND rStart < lEnd` (and the key columns are equal).
  * Degenerate intervals (`end <= start`) match nothing and are dropped
  * at the scan.
  *
  * Scale shape — the naive formulation is a range-predicate theta
  * join, which Spark can only execute as BroadcastNestedLoop or a
  * cartesian product; both are scale-killers. Instead:
  *   1. each interval is exploded to the fixed-width time CHUNKS it
  *      touches (`chunk` in the same units as the bounds), so two
  *      overlapping intervals are guaranteed to co-occur in the chunk
  *      containing the overlap's start;
  *   2. a plain shuffled hash/sort-merge EQUI-join on
  *      `(keys…, chunk)` finds candidates;
  *   3. the exact overlap predicate filters false neighbors, and the
  *      OWNERSHIP filter `chunk == (max(lStart, rStart) div chunk)`
  *      keeps each matching pair in exactly ONE chunk — no
  *      `distinct()` pass over the pair stream.
  * Cost is `span/chunk + 1` candidate rows per interval: pick `chunk`
  * near the typical interval span so the explode factor stays O(1).
  * Skewed chunks (many intervals in one time window) are ordinary
  * equi-join skew — AQE's skew-join split applies, nothing bespoke.
  *
  * Bounds must be non-negative longs (epoch micros qualify); `div` is
  * floor division on that domain.
  */
object IntervalJoin {

  /** @param left  intervals with `keys ++ (lStart, lEnd)` plus payload
    * @param right intervals with `keys ++ (rStart, rEnd)` plus payload
    * @param keys  equi-key columns present on BOTH sides (may be empty:
    *              pure temporal join)
    * @param chunk chunk width in bound units (must be > 0)
    * @return left payload columns ++ right payload columns, one row per
    *         overlapping pair; caller should alias clashing names first
    */
  def overlapJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                  lStart: String, lEnd: String,
                  rStart: String, rEnd: String,
                  chunk: Long): DataFrame = {
    require(chunk > 0, s"chunk ($chunk) must be positive")
    def chunked(df: DataFrame, s: String, e: String): DataFrame =
      df.filter(col(e) > col(s))
        .withColumn("__chunk",
          explode(sequence(expr(s"$s div ${chunk}L"),
            expr(s"($e - 1L) div ${chunk}L"))))
    val lc = chunked(left, lStart, lEnd)
    val rc = chunked(right, rStart, rEnd)
    lc.join(rc, keys :+ "__chunk")
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd) &&
        col("__chunk") === expr(s"greatest($lStart, $rStart) div ${chunk}L"))
      .drop("__chunk")
  }
}
