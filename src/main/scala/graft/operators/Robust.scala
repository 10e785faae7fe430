package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Robust selection operators over integer-quantized metrics: the
  * Pareto frontier (skyline) for multi-objective data selection and
  * MAD-based outlier detection for contamination-resistant filtering.
  * Both avoid the global single-task sort that makes the naive window
  * formulation a scale-killer.
  */
object Robust {

  /** Pareto frontier (skyline) of `(xCol, yCol)` maximizing BOTH — the
    * selection rule for multi-objective curation ("no other candidate
    * is at least as good on both axes and better on one"), e.g.
    * quality score vs. information density when neither should be
    * traded away silently.
    *
    * A point is dominated iff some other point has x' ≥ x AND y' ≥ y
    * with (x', y') ≠ (x, y); duplicates of a frontier point are all
    * frontier.
    *
    * Scale shape — the skyline is DISTRIBUTIVE (the global frontier is
    * a subset of the union of per-partition frontiers), so:
    *   1. one shuffle deduplicates to distinct points;
    *   2. a partition-local sort by (x desc, y desc) plus a streaming
    *      running-max sweep keeps only the local frontier — O(1)
    *      memory per task, no cross-partition data movement;
    *   3. the survivors (O(frontier) ≈ O(log n) for non-adversarial
    *      data) take one bounded global window for the exact answer.
    * The naive `Window.orderBy(x)` formulation funnels the corpus
    * through ONE task; this never sorts more than a partition.
    *
    * Sweep invariant: with distinct points in (x desc, y desc) order,
    * every earlier point has x' > x, or x' = x and y' > y — so a point
    * is dominated iff max(previous y) ≥ y.
    *
    * @return the distinct frontier points `(xCol, yCol)` — semi-join
    *         back to tag the carrying rows
    */
  def paretoFrontier(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val spark = df.sparkSession
    val pts = df.select(col(xCol).cast("long").as(xCol),
        col(yCol).cast("long").as(yCol))
      .na.drop()
      .distinct()
      .sortWithinPartitions(col(xCol).desc, col(yCol).desc)
    val outSchema = StructType(Seq(StructField(xCol, LongType, nullable = false),
      StructField(yCol, LongType, nullable = false)))
    val localFrontier = spark.createDataFrame(
      pts.rdd.mapPartitions { it =>
        var maxY = Long.MinValue
        it.flatMap { r =>
          val y = r.getLong(1)
          if (y > maxY) { maxY = y; Iterator.single(Row(r.getLong(0), y)) }
          else Iterator.empty
        }
      }, outSchema)
    // survivors are frontier-sized: the bounded global pass is cheap
    val w = Window.orderBy(col(xCol).desc, col(yCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    localFrontier
      .withColumn("__max_prev", max(col(yCol)).over(w))
      .filter(col("__max_prev").isNull || col("__max_prev") < col(yCol))
      .drop("__max_prev")
  }

  /** Per-group robust outlier counts via the median/MAD rule — the
    * contamination-resistant alternative to z-scores (one corrupt
    * heavy tail shifts a mean/stddev fence arbitrarily; the breakdown
    * point of median ± k·MAD is 50 %).
    *
    * Medians are LOWER medians (ascending rank ⌈n/2⌉) over the
    * integer-quantized `valueQCol`, computed with
    * [[Quantiles.exactQuantiles]] — two bounded-count passes, no
    * per-group single-task sort — so every output cell is exact
    * integer arithmetic, engine-reproducible bit-for-bit.
    *
    * Caller contract (inherited from exactQuantiles): `valueQCol` is a
    * non-negative quantized long.
    *
    * @return one row per group: n, med_q, mad_q, n_outliers where
    *         outliers satisfy |v − med| > k·MAD
    */
  def madOutliers(df: DataFrame, groupCol: String, valueQCol: String,
                  bucketWidth: Long, k: Int = 3): DataFrame = {
    require(k > 0, s"k ($k) must be positive")
    val med = Seq(("med", 1, 2))
    val medians = Quantiles.exactQuantiles(df, groupCol, valueQCol,
        bucketWidth, med)
      .select(col(groupCol), col("value").as("med_q"))
    val dev = df.join(broadcast(medians), Seq(groupCol))
      .withColumn("__dev", abs(col(valueQCol).cast("long") - col("med_q")))
    val mads = Quantiles.exactQuantiles(dev, groupCol, "__dev",
        bucketWidth, med)
      .select(col(groupCol), col("value").as("mad_q"))
    dev.join(broadcast(mads), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        first(col("med_q")).as("med_q"),
        first(col("mad_q")).as("mad_q"),
        sum(when(col("__dev") > lit(k.toLong) * col("mad_q"), 1L)
          .otherwise(0L)).as("n_outliers"))
  }
}
