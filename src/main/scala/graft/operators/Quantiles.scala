package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact order statistics at scale: per-group quantiles computed
  * WITHOUT sorting a group through one task (the hidden global sort in
  * `percentile` / `row_number OVER (PARTITION BY group)` when a group
  * is corpus-sized) and WITHOUT the approximation of
  * `percentile_approx` (whose sketch merge is also engine-private —
  * not oracle-replayable). Same two-pass shape as
  * [[Curation.curriculumBins]], generalized to (group, bucket):
  *
  *   1. coarse bucket = value div bucketWidth; one hash aggregate
  *      counts each (group, bucket) — the only corpus pass that
  *      shuffles, and it shuffles counts, not rows;
  *   2. the bounded count table collects to the driver where prefix
  *      sums become per-(group, bucket) rank offsets and per-group
  *      totals become target ranks; a row_number window partitioned by
  *      (group, bucket) — each task sorts one value-slice — plus the
  *      broadcast offset is the exact within-group rank, and the
  *      quantile row is a broadcast semi-join on rank = target.
  *
  * Quantiles are RATIONAL (label, num, den): the target rank is
  * ⌈num·N/den⌉ computed as (num·N + den − 1) div den in exact longs —
  * `ceil(0.9 · N)` in doubles differs between engines when 0.9·N lands
  * one ulp above an integer, so no float ever touches rank selection.
  *
  * Caller contract: values are non-negative longs; groups × buckets
  * stays driver-bounded (pick bucketWidth ≈ value range / 10³).
  */
object Quantiles {

  /** @param qs quantile specs (label, num, den), e.g.
    *           ("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)
    * @return one row per (group, q) — (groupCol, q, value): the value
    *         whose ascending within-group rank is ⌈num·N/den⌉
    */
  def exactQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                     bucketWidth: Long,
                     qs: Seq[(String, Int, Int)]): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth ($bucketWidth) must be positive")
    require(qs.nonEmpty, "qs must not be empty")
    require(qs.forall { case (_, n, d) => n > 0 && d > 0 && n <= d },
      "each quantile must satisfy 0 < num <= den")
    import df.sparkSession.implicits._
    val vals = df.select(col(groupCol).cast("string").as("__g"),
      col(valueCol).cast("long").as("__v"))
      .withColumn("__bucket", expr(s"__v div ${bucketWidth}L"))
    // bounded by caller contract: |groups| x |value range / bucketWidth|
    val counts = vals.groupBy(col("__g"), col("__bucket"))
      .agg(count(lit(1)).as("__c"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byGroup = counts.groupBy(_._1)
    val offsets = byGroup.toSeq.flatMap { case (g, rows) =>
      val sorted = rows.sortBy(_._2)
      sorted.scanLeft((g, 0L, 0L)) { case ((_, _, acc), (_, b, c)) =>
        (g, b, acc + c)
      }.zip(sorted).map { case ((_, _, before), (_, b, _)) => (g, b, before) }
    }
    val targets = byGroup.toSeq.flatMap { case (g, rows) =>
      val n = rows.map(_._3).sum
      qs.map { case (label, num, den) =>
        (g, label, (num.toLong * n + den - 1) / den)
      }
    }
    val offsetDf = offsets.toDF("__g", "__bucket", "__off")
    val targetDf = targets.toDF("__tg", "q", "__rank")
    val wInBucket = Window.partitionBy(col("__g"), col("__bucket"))
      .orderBy(col("__v").asc)
    vals
      .join(broadcast(offsetDf), Seq("__g", "__bucket"))
      .withColumn("__grank", col("__off") + row_number().over(wInBucket))
      .join(broadcast(targetDf),
        col("__g") === col("__tg") && col("__grank") === col("__rank"))
      .select(col("__g").as(groupCol), col("q"), col("__v").as("value"))
  }
}
