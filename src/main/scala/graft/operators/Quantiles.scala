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

  /** Winsorize: clip a per-row long metric to its group's exact
    * [lo, hi] quantile band — the robust-scaling pre-pass that stops a
    * fat-tailed feature (payment amounts, doc lengths) from dominating
    * a normalized training signal. Quantile selection is
    * [[exactQuantiles]]'s rational-rank machinery (no float touches a
    * rank), so the clip bounds are engine-exact longs and the clipped
    * value is a pure `least/greatest`.
    *
    * Plan shape: the quantile pass shuffles counts, not rows; the
    * bounds table (2 rows per group) broadcasts back; the clip is
    * scan-stage. Returns the input plus `lo`, `hi`, and
    * `<valueCol>_clipped`.
    */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
                bucketWidth: Long,
                lo: (Int, Int), hi: (Int, Int)): DataFrame = {
    val bounds = exactQuantiles(df, groupCol, valueCol, bucketWidth,
      Seq(("lo", lo._1, lo._2), ("hi", hi._1, hi._2)))
      .groupBy(col(groupCol))
      .agg(min(when(col("q") === "lo", col("value"))).as("lo"),
        min(when(col("q") === "hi", col("value"))).as("hi"))
    df.join(broadcast(bounds), Seq(groupCol))
      .withColumn(s"${valueCol}_clipped",
        least(greatest(col(valueCol).cast("long"), col("lo")), col("hi")))
  }

  /** Exact 1-based ascending rank of every row within its group —
    * WITHOUT a per-group global sort (the [[exactQuantiles]] offset
    * trick applied to all rows instead of target ranks): the coarse
    * bucket count collects to the driver, prefix sums become bucket
    * offsets, and a row_number window partitioned by (group, bucket)
    * — each task sorts one value-slice — plus the broadcast offset is
    * the exact rank. `tieCols` must make the within-group order total
    * (equal values otherwise get arbitrary distinct ranks and no
    * oracle could replay them). Appends `rank` and `grp_n`.
    *
    * This is the primitive under rank/quantile normalization ("scale
    * this score to [0,1] by its within-source rank") — the
    * cross-source score-blending step of a mixing policy.
    */
  def exactRanks(df: DataFrame, groupCol: String, valueCol: String,
                 bucketWidth: Long, tieCols: Seq[String]): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth ($bucketWidth) must be positive")
    require(tieCols.nonEmpty, "tieCols must make the within-group order total")
    import df.sparkSession.implicits._
    val base = df
      .withColumn("__g", col(groupCol).cast("string"))
      .withColumn("__v", col(valueCol).cast("long"))
      .withColumn("__bucket", expr(s"__v div ${bucketWidth}L"))
    // driver-bounded by the exactQuantiles caller contract
    val counts = base.groupBy(col("__g"), col("__bucket"))
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
    val totals = byGroup.toSeq.map { case (g, rows) => (g, rows.map(_._3).sum) }
    val offsetDf = offsets.toDF("__g", "__bucket", "__off")
    val totalDf = totals.toDF("__tg", "grp_n")
    val wInBucket = Window.partitionBy(col("__g"), col("__bucket"))
      .orderBy(col("__v").asc +: tieCols.map(col(_).asc): _*)
    base
      .join(broadcast(offsetDf), Seq("__g", "__bucket"))
      .withColumn("rank", col("__off") + row_number().over(wInBucket))
      .join(broadcast(totalDf), col("__g") === col("__tg"))
      .drop("__g", "__v", "__bucket", "__off", "__tg")
  }

  /** Exact equi-depth histogram per group: k bins of (as close as
    * integer arithmetic allows) equal row count, each reported with
    * its value bounds — the optimizer-statistics shape (selectivity
    * estimation, drift dashboards) built on [[exactRanks]], so no
    * group ever sorts through one task. Bin of a row =
    * ((rank − 1)·k) div N, a pure integer map; `tieCols` make the
    * rank total so the oracle can replay the exact same binning.
    *
    * @return (groupCol, bin ∈ 0..k−1, lo, hi, n_rows)
    */
  def equiDepthHistogram(df: DataFrame, groupCol: String, valueCol: String,
                         bucketWidth: Long, k: Int,
                         tieCols: Seq[String]): DataFrame = {
    require(k >= 1, s"k ($k) must be >= 1")
    exactRanks(df, groupCol, valueCol, bucketWidth, tieCols)
      .withColumn("bin", expr(s"((rank - 1) * ${k}L) div grp_n"))
      .groupBy(col(groupCol), col("bin"))
      .agg(min(col(valueCol).cast("long")).as("lo"),
        max(col(valueCol).cast("long")).as("hi"),
        count(lit(1)).as("n_rows"))
  }
}
