package graft.operators

import graft.operators.Mat._
import org.apache.spark.sql.{Column, DataFrame, Row}
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
    // medians is |groups| rows but its plan is a corpus-wide quantile
    // pass; dev is referenced twice more (the MAD quantile pass and
    // the final outlier agg). Unmaterialized, the r12-baseline q170
    // plan re-scanned the input 8 times (guide §2.4) — checkpoint the
    // tiny medians frame and the dev frame so each pass runs once.
    val medians = Quantiles.exactQuantiles(df, groupCol, valueQCol,
        bucketWidth, med)
      .select(col(groupCol), col("value").as("med_q"))
      .mat
    val dev = df.join(broadcast(medians), Seq(groupCol))
      .withColumn("__dev", abs(col(valueQCol).cast("long") - col("med_q")))
      .mat
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

  /** Per-group two-sample Kolmogorov–Smirnov drift: for each group g,
    * the KS statistic D = max_v |ECDF_g(v) − ECDF_rest(v)| between the
    * group's distribution of `valueCol` and the REST of the corpus —
    * the standard nonparametric "did this source/shard drift?" check,
    * sensitive to shape changes that mean/z-score monitors (q141) miss.
    *
    * Exactness: D's numerator is computed in integers —
    * max |cum_g·N_rest − cum_rest·N_g| over observed values — and
    * quantized as ⌊10⁶·num/(N_g·N_rest)⌋ with ONE double division, so
    * the output is engine-identical. Groups with an empty complement
    * (only one group present) report ks_q = 0.
    *
    * Plan shape: one hash aggregate to per-(group, value) counts —
    * the only pass over the raw data — then all work happens on the
    * bounded (|groups| × |distinct values|) grid: a broadcast-able
    * values×groups frame, two cumulative windows partitioned BY GROUP
    * (each partition is |distinct values| rows, never corpus rows),
    * one final hash aggregate. At 100 TB the metric is a quantized
    * score, so |distinct values| is bounded by the quantization grid,
    * not the corpus.
    */
  def ksDrift(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val counts = df.select(col(groupCol),
        col(valueCol).cast("long").as("__v"))
      .na.drop()
      .groupBy(col(groupCol), col("__v")).agg(count(lit(1)).as("__c"))
    // bounded grids: one row per group / per distinct value
    val groups = counts.groupBy(col(groupCol)).agg(sum(col("__c")).as("__ng"))
    val values = counts.groupBy(col("__v")).agg(sum(col("__c")).as("__cv"))
    val total = values.agg(sum(col("__cv")).as("__n"))
    // every (group, value) grid point, with the group's count at that
    // value (0 where absent) — the ECDFs must step at EVERY observed
    // value, not only the group's own
    val grid = groups.crossJoin(broadcast(values))
      .join(counts, Seq(groupCol, "__v"), "left")
      .na.fill(0L, Seq("__c"))
    val wg = Window.partitionBy(col(groupCol)).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = grid
      .withColumn("__cumg", sum(col("__c")).over(wg))
      .withColumn("__cumv",
        sum(col("__cv")).over(wg)) // global cumulative at v (same per group)
      .crossJoin(broadcast(total))
      .withColumn("__nr", col("__n") - col("__ng"))
      .withColumn("__cumr", col("__cumv") - col("__cumg"))
      // decimal(38,0) products: cum·N terms reach ~1e26 on a 100 TB
      // corpus — far past Long.MaxValue (9.2e18). 38 digits hold any
      // count product up to 1e19·1e19.
      .withColumn("__num",
        abs(col("__cumg").cast("decimal(38,0)") * col("__nr") -
          col("__cumr").cast("decimal(38,0)") * col("__ng")))
    cum.groupBy(col(groupCol))
      .agg(first(col("__ng")).as("n_group"),
        first(col("__nr")).as("n_rest"),
        max(col("__num")).as("__maxnum"))
      .select(col(groupCol), col("n_group"), col("n_rest"),
        when(col("n_rest") === 0L, lit(0L))
          .otherwise(floor(lit(1000000.0) * col("__maxnum").cast("double") /
            (col("n_group").cast("double") * col("n_rest").cast("double")))
            .cast("long"))
          .as("ks_q"))
  }

  /** Leave-one-group-out influence on a corpus mean — the cheapest
    * data-ablation signal: for each group g (source, shard, day),
    * the corpus mean of `valueCol` WITHOUT g, and the delta the
    * group's removal causes. One hash aggregate over the data plus
    * algebra on the per-group sums: mean₋g = (S − S_g)/(N − N_g) —
    * no per-group re-scan, no N× recompute, which is what makes
    * source ablation tractable when "retrain without source i" is a
    * 100 TB question asked 20 times.
    *
    * Sums are exact longs over the integer metric; the two quantized
    * outputs each take one double division: ⌊10⁶·mean₋g⌋ and
    * `delta_q` = ⌊10⁶·mean₋g⌋ − ⌊10⁶·mean⌋ (the difference of the two
    * quantized means; negative ⇒ removing the group LOWERS the
    * remaining mean ⇒ the group was pulling quality up). Groups
    * covering the whole corpus report nulls (no complement to
    * measure).
    */
  def looInfluence(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val perGroup = df.select(col(groupCol),
        col(valueCol).cast("long").as("__v"))
      .na.drop()
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_group"), sum(col("__v")).as("__sg"))
    val totals = perGroup.agg(sum(col("n_group")).as("__n"),
      sum(col("__sg")).as("__s"))
    val meanQ = (s: Column, n: Column) =>
      floor(lit(1000000.0) * s.cast("double") / n.cast("double")).cast("long")
    perGroup.crossJoin(broadcast(totals))
      .select(col(groupCol), col("n_group"),
        meanQ(col("__s"), col("__n")).as("mean_all_q"),
        when(col("__n") === col("n_group"), lit(null).cast("long"))
          .otherwise(meanQ(col("__s") - col("__sg"),
            col("__n") - col("n_group"))).as("mean_without_q"))
      .withColumn("delta_q", col("mean_without_q") - col("mean_all_q"))
  }

  /** Per-group Theil–Sen robust trend: the MEDIAN of all pairwise
    * slopes ⌊10⁶·(y_j−y_i)/(x_j−x_i)⌋ over the group's (x, y) series
    * — the outlier-immune slope estimator (breakdown point 29 %) that
    * complements [[ksDrift]]/CUSUM with a magnitude: "this event type
    * is growing 3.2 counts/hour".
    *
    * Exactness: dy·10⁶ is an exact integer in double (|dy| < 2⁴³
    * holds for any count series), the one divide is correctly
    * rounded, floor lands identically on any engine (the q188
    * pattern); the median then SELECTS among exact integers — the
    * lower median (⌊(p+1)/2⌋-th smallest), which needs no averaging.
    *
    * Plan: the pair frame is a per-group self-join on the BOUNDED
    * bucket grid (B buckets → B²/2 pairs per group; hourly years are
    * B ≈ 10⁴ — grid-bounded, never corpus-bounded), then one
    * per-group window sort over the pairs. Groups with < 2 buckets
    * emit no row.
    */
  def theilSen(buckets: DataFrame, groupCol: String, xCol: String,
               yCol: String): DataFrame = {
    // compute-once: the bucket grid self-joins — don't recompute the
    // upstream aggregation for each join arm
    val b = buckets.select(col(groupCol), col(xCol).cast("long").as("__x"),
      col(yCol).cast("long").as("__y")).na.drop()
      .mat
    val pairs = b.join(
        b.select(col(groupCol), col("__x").as("__x2"), col("__y").as("__y2")),
        Seq(groupCol))
      .filter(col("__x2") > col("__x"))
      .select(col(groupCol),
        floor(lit(1000000.0) * (col("__y2") - col("__y")).cast("double") /
          (col("__x2") - col("__x")).cast("double")).cast("long")
          .as("__slope"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__slope"))
    pairs
      .withColumn("__rn", row_number().over(w))
      .withColumn("__p", count(lit(1)).over(Window.partitionBy(col(groupCol))))
      .filter(col("__rn") === expr("(__p + 1L) div 2L"))
      .select(col(groupCol), col("__p").as("n_pairs"),
        col("__slope").as("slope_med_q"))
  }

  /** Hill tail-index estimator per group over a positive integer
    * metric (doc length, token count, degree): with X₍₁₎ ≥ … the
    * descending order statistics and k tail samples,
    *
    *   H = (1/k)·Σ_{i≤k} ln(X₍ᵢ₎/X₍ₖ₊₁₎),  α̂ = 1/H
    *
    * — the standard heavy-tail exponent (α ≈ the Pareto/Zipf tail
    * slope; small α = extreme docs dominate token mass, the signal
    * that a length cap or sub-linear sampling is needed before
    * training). Quantized ⌊10¹²·ln⌋ per SAMPLE then one integer mean
    * (div), so partition order can't move the result; ln runs on
    * ratios of exact integers (the q166 ln contract). Groups with
    * fewer than 2 positive values emit nothing. Ties at the boundary
    * are value-identical, so WHICH tied row ranks k+1 cannot change
    * the estimate.
    *
    * Plan: one row_number window per group (Spark plans a map-side
    * partial group-limit for the rank filter — top-(k+1) per task,
    * never a corpus-sized partition), then a per-group agg.
    *
    * @return (group, n_tail, x_ref, hill_q, alpha_q) — hill on the
    *         10¹² grid, alpha = ⌊10¹²/H⌋ from the quantized H
    */
  /** Hodges–Lehmann one-sample location estimator per group: the
    * lower median of the Walsh averages (x_i + x_j)/2 over i ≤ j —
    * the rank-based center that keeps 29% breakdown and near-normal
    * efficiency without choosing between mean and median.
    *
    * Never materializes the O(n²) row pairs: Walsh mass lives on the
    * VALUE-GRID pair table — weight c_i·c_j for v_i < v_j and
    * c_i·(c_i+1)/2 on the diagonal — so the fan-out is bounded by the
    * per-group distinct-value cardinality squared, not the row count.
    * Averages stay exact as DOUBLED sums (v_i + v_j); the lower
    * median is the smallest doubled sum whose cumulative weight
    * reaches ⌈T/2⌉ = (T+1) div 2 — a pure integer rule, no
    * interpolation. hl_q = (10⁶·hl2) div 2 keeps the half exact.
    *
    * Plan: one scan to the (group, value) grid, one grid self-join
    * (broadcast right side), one keyed window for the cumulative,
    * top-1 per group.
    */
  def hodgesLehmann(df: DataFrame, groupCol: String,
                    valueCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val grid = df.select(col(groupCol).as("__g"),
        col(valueCol).cast("long").as("__v"))
      .na.drop()
      .groupBy(col("__g"), col("__v")).agg(count(lit(1)).as("__c"))
      .mat
    val b = grid.select(col("__g"), col("__v").as("__vb"),
      col("__c").as("__cb"))
    val walsh = grid.join(b, Seq("__g"))
      .filter(col("__vb") >= col("__v"))
      .select(col("__g"), (col("__v") + col("__vb")).as("__s2"),
        // diagonal C(c+1,2) via integral div (exact, c(c+1) is even);
        // decimal branches so no decimal '/' rounding ever enters
        when(col("__vb") === col("__v"),
          dec(expr("(__c * (__c + 1)) div 2")))
          .otherwise(dec(col("__c")) * dec(col("__cb"))).as("__w"))
      .groupBy(col("__g"), col("__s2"))
      .agg(sum(col("__w")).cast("decimal(38,0)").as("__w"))
    val tot = walsh.groupBy(col("__g"))
      .agg(sum(col("__w")).cast("decimal(38,0)").as("__t"))
    walsh
      .withColumn("__cum", sum(col("__w")).over(
        Window.partitionBy(col("__g")).orderBy(col("__s2"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(broadcast(tot), Seq("__g"))
      .filter(col("__cum") >= expr("(__t + 1) div 2"))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("__g")).orderBy(col("__s2"))))
      .filter(col("__rk") === 1)
      .select(col("__g").as(groupCol), col("__t").cast("long").as("t_pairs"),
        col("__s2").as("hl2"),
        expr("(1000000L * hl2) div 2").as("hl_q"))
  }

  /** Tukey five-number fence audit per group — exact integer-rank
    * quartiles (lower rule: value at ascending rank ⌈q·n⌉) and the
    * 1.5·IQR outlier fences evaluated WITHOUT floats: a value is a
    * low outlier iff 2·v < 2·Q1 − 3·IQR (doubled comparisons keep
    * the half-steps integral). The boxplot-stat workhorse, exact on
    * any engine. Plan: one scan to the (group, value) grid; ranks
    * from a group-keyed window over the grid (value-cardinality-
    * bounded); fence counts from one more grid pass.
    */
  def tukeyFences(df: DataFrame, groupCol: String,
                  valueCol: String): DataFrame = {
    val gv = df.select(col(groupCol), col(valueCol).cast("long").as("__v"))
      .na.drop()
      .groupBy(col(groupCol), col("__v")).agg(count(lit(1)).as("__c"))
      .mat
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = gv
      .withColumn("__cum", sum(col("__c")).over(w))
      .withColumn("__n", sum(col("__c")).over(
        Window.partitionBy(col(groupCol))))
      .mat
    def pick(num: Int, den: Int, as: String) = cum
      .filter(col("__cum") * den >= col("__n") * num)
      .groupBy(col(groupCol))
      .agg(min(col("__v")).as(as), first(col("__n")).as(s"__n_$as"))
    val qs = pick(1, 4, "q1")
      .join(pick(1, 2, "median").drop("__n_median"), Seq(groupCol))
      .join(pick(3, 4, "q3").drop("__n_q3"), Seq(groupCol))
      .withColumnRenamed("__n_q1", "n")
    gv.join(broadcast(qs), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(first(col("n")).as("n"), first(col("q1")).as("q1"),
        first(col("median")).as("median"), first(col("q3")).as("q3"),
        sum(when(lit(2L) * col("__v") <
          lit(2L) * col("q1") - lit(3L) * (col("q3") - col("q1")),
          col("__c")).otherwise(0L)).as("n_low"),
        sum(when(lit(2L) * col("__v") >
          lit(2L) * col("q3") + lit(3L) * (col("q3") - col("q1")),
          col("__c")).otherwise(0L)).as("n_high"))
      .orderBy(col(groupCol))
  }

  /** Siegel repeated-medians slope per group — the 50 %-breakdown
    * upgrade of [[theilSen]] (Theil–Sen's single median over all
    * pairwise slopes breaks at 29 %): for each point i take the
    * MEDIAN over j of slope(i,j), then the median of those medians.
    * Slopes quantize ⌊10⁶·Δy/Δx⌋ (one division each, exact inputs) so
    * both median layers are integer-rank picks (lower median at rank
    * (cnt+1) div 2) — value-deterministic regardless of tie order.
    *
    * Plan: one bucket-grid self-join per group (span²-bounded, the
    * theilSen contract — NEVER raw rows), a per-(group, i) keyed
    * window, then a per-group window over |points| rows.
    */
  def siegelSlope(buckets: DataFrame, groupCol: String, xCol: String,
                  yCol: String): DataFrame = {
    val b = buckets.select(col(groupCol), col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y")).na.drop()
      .mat
    val pairs = b.join(
        b.select(col(groupCol), col("__x").as("__x2"),
          col("__y").as("__y2")), Seq(groupCol))
      .filter(col("__x2") =!= col("__x"))
      .select(col(groupCol), col("__x"),
        floor(lit(1000000.0) *
          (col("__y2") - col("__y")).cast("double") /
          (col("__x2") - col("__x")).cast("double")).cast("long")
          .as("__sl"))
    val wI = Window.partitionBy(col(groupCol), col("__x"))
    val perPoint = pairs
      .withColumn("__rk", row_number().over(wI.orderBy(col("__sl"))))
      .withColumn("__cnt", count(lit(1)).over(wI))
      .filter(col("__rk") === expr("(__cnt + 1) div 2"))
      .select(col(groupCol), col("__sl").as("__med"))
    val wG = Window.partitionBy(col(groupCol))
    perPoint
      .withColumn("__rk", row_number().over(wG.orderBy(col("__med"))))
      .withColumn("__cnt", count(lit(1)).over(wG))
      .filter(col("__rk") === expr("(__cnt + 1) div 2"))
      .select(col(groupCol), col("__cnt").as("n_points"),
        col("__med").as("slope_q"))
      .orderBy(col(groupCol))
  }

  /** Generalized-Pareto tail fit by method of moments over the
    * exceedances of the per-group exact p90 — the peaks-over-threshold
    * companion to [[hillTail]] (Hill assumes a pure power law; GPD-MOM
    * also covers light and bounded tails, and its sign of ξ is the
    * headline: ξ>0 heavy, ξ≈0 exponential, ξ<0 bounded):
    *
    *   ξ = (1 − m²/s²)/2,    σ = m·(1−ξ) = m·(1 + m²/s²)/2
    *
    * The threshold is [[Quantiles.exactQuantiles]]' integer-rank p90
    * (never a float percentile), exceedances y = v − u are integers,
    * so m and s² derive from exact Σy/Σy² and the two outputs are one
    * mirrored fp chain each, quantized ⌊10⁶·.⌋. NULL when fewer than
    * 2 exceedances or zero spread. Plan: the quantile's two bounded
    * passes, then one broadcast threshold join + one hash agg.
    */
  def gpdMomFit(df: DataFrame, groupCol: String, valueCol: String,
                bucketWidth: Long): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val d = (c: Column) => c.cast("double")
    val thr = Quantiles.exactQuantiles(df, groupCol, valueCol,
        bucketWidth, Seq(("u", 9, 10)))
      .select(col(groupCol), col("value").as("__u"))
    val agg = df.select(col(groupCol).cast("string").as(groupCol),
        col(valueCol).cast("long").as("__v"))
      .na.drop()
      .join(broadcast(thr), Seq(groupCol))
      .filter(col("__v") > col("__u"))
      .withColumn("__y", col("__v") - col("__u"))
      .groupBy(col(groupCol))
      .agg(first(col("__u")).as("threshold"),
        count(lit(1)).as("n_exceed"),
        sum(dec(col("__y"))).as("__s1"),
        sum(dec(col("__y")) * dec(col("__y"))).as("__s2"))
    val m = d(col("__s1")) / d(col("n_exceed"))
    val v = d(col("__s2")) / d(col("n_exceed")) - m * m
    val r = m * m / v
    val ok = col("n_exceed") >= 2 && v > 0
    agg.select(col(groupCol), col("threshold"), col("n_exceed"),
        when(ok, floor(lit(1000000.0) * (lit(1.0) - r) / lit(2.0))
          .cast("long")).as("xi_q"),
        when(ok, floor(lit(1000000.0) * m * (lit(1.0) + r) / lit(2.0))
          .cast("long")).as("sigma_q"))
      .orderBy(col(groupCol))
  }

  def hillTail(df: DataFrame, groupCol: String, valueCol: String,
               k: Int): DataFrame = {
    require(k >= 1 && k <= 10000, s"k ($k) must be in [1, 10000]")
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__v").desc)
    // ref/count via a SECOND window over the already-limited frame
    // (same partitioning — one exchange total, no self-join, and no
    // checkpoint that would hide the map-side WindowGroupLimit stage
    // or re-scan the corpus)
    val wg = Window.partitionBy(col(groupCol))
    df.select(col(groupCol), col(valueCol).cast("long").as("__v"))
      .filter(col("__v") > 0)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k + 1)
      .withColumn("__n", count(lit(1)).over(wg))
      .withColumn("__ref", min(col("__v")).over(wg))
      .filter(col("__n") >= 2 && col("__rn") < col("__n"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_tail"), first(col("__ref")).as("x_ref"),
        sum(floor(lit(1.0e12) *
          log(col("__v").cast("double") / col("__ref").cast("double")))
          .cast("long")).as("__hsum"))
      .select(col(groupCol), col("n_tail"), col("x_ref"),
        expr("__hsum div n_tail").as("hill_q"))
      .withColumn("alpha_q",
        when(col("hill_q") > 0,
          // ⌊10²⁴/hill_q⌋ in decimal — 10¹²/H on the same grid
          expr("CAST(CAST(1000000000000000000000000 AS DECIMAL(38,0))" +
            " div hill_q AS LONG)")))
  }

  /** Shared two-sample ECDF grid: the pooled DISTINCT-value grid with
    * each group's cumulative count at every value (ECDFs step at every
    * observed value), the per-value pooled multiplicity, and the gap
    * to the next value. One corpus scan to the (group, value) counts,
    * bounded-grid windows after — the [[ksDrift]] scale contract.
    *
    * @return (v, c_pool, gap, cum_a, cum_b, scum_a, scum_b) plus
    *         broadcast-joined one-row totals (__na, __nb, __sa, __sb)
    */
  private def ecdfGrid(df: DataFrame, groupCol: String, xCol: String,
                       gA: String, gB: String): DataFrame = {
    val counts = df
      .filter(col(groupCol).isin(gA, gB) && col(xCol).isNotNull)
      .select(col(groupCol).as("__g"), col(xCol).cast("long").as("__v"))
      .groupBy(col("__g"), col("__v")).agg(count(lit(1)).as("__c"))
    val byV = counts.groupBy(col("__v")).agg(
      sum(when(col("__g") === gA, col("__c")).otherwise(0L)).as("__ca"),
      sum(when(col("__g") === gB, col("__c")).otherwise(0L)).as("__cb"))
    val w = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = byV.agg(sum(col("__ca")).as("__na"), sum(col("__cb")).as("__nb"),
      sum(col("__ca") * col("__v")).as("__sa"),
      sum(col("__cb") * col("__v")).as("__sb"))
    byV
      .withColumn("c_pool", col("__ca") + col("__cb"))
      .withColumn("cum_a", sum(col("__ca")).over(w))
      .withColumn("cum_b", sum(col("__cb")).over(w))
      .withColumn("scum_a", sum(col("__ca") * col("__v")).over(w))
      .withColumn("scum_b", sum(col("__cb") * col("__v")).over(w))
      .withColumn("gap",
        coalesce(lead(col("__v"), 1).over(Window.orderBy(col("__v"))) -
          col("__v"), lit(0L)))
      .crossJoin(broadcast(tot))
  }

  /** Exact 1-Wasserstein (earth mover's) distance between two named
    * groups' empirical distributions of an integer metric — the drift
    * statistic that reports HOW FAR the mass moved, where [[ksDrift]]
    * reports the largest single ECDF gap (KS can miss a broad small
    * shift that moves a lot of mass):
    *
    *   W₁ = ∫|F_A − F_B| = Σ_v |cum_a(v)·n_b − cum_b(v)·n_a|·gap(v)
    *        / (n_a·n_b)
    *
    * — the numerator is an exact decimal(38,0) sum over the pooled
    * value grid, the division the ONE fp op.
    *
    * @return one row (n_a, n_b, num_l, w1_q = ⌊10⁶·W₁⌋)
    */
  def wasserstein1(df: DataFrame, groupCol: String, xCol: String,
                   gA: String, gB: String): DataFrame = {
    val dec38 = (c: Column) => c.cast("decimal(38,0)")
    ecdfGrid(df, groupCol, xCol, gA, gB)
      .select(col("__na"), col("__nb"),
        (abs(dec38(col("cum_a")) * col("__nb") -
          dec38(col("cum_b")) * col("__na")) * col("gap")).as("__t"))
      .groupBy(col("__na").as("n_a"), col("__nb").as("n_b"))
      .agg(sum(col("__t")).as("num_l"))
      .select(col("n_a"), col("n_b"), col("num_l"),
        when(col("n_a") > 0 && col("n_b") > 0,
          floor(lit(1.0e6) * col("num_l").cast("double") /
            (col("n_a").cast("double") * col("n_b").cast("double")))
            .cast("long")).as("w1_q"))
  }

  /** Two-sample Cramér–von Mises statistic — the WHOLE-curve ECDF
    * discrepancy ([[ksDrift]] = sup norm, [[wasserstein1]] = L1 of
    * the difference, CvM = count-weighted L2):
    *
    *   T = (n_a·n_b / N²)·Σ_z (F_A(z) − F_B(z))²   (z over all N
    *       pooled sample points, ties via multiplicity)
    *     = Σ_v c_pool(v)·(cum_a(v)·n_b − cum_b(v)·n_a)²
    *       / (n_a·n_b·N²)
    *
    * — exact decimal numerator, one division.
    *
    * @return one row (n_a, n_b, num_l, t_q = ⌊10⁶·T⌋)
    */
  def cramerVonMises(df: DataFrame, groupCol: String, xCol: String,
                     gA: String, gB: String): DataFrame = {
    val dec38 = (c: Column) => c.cast("decimal(38,0)")
    val d = dec38(col("cum_a")) * col("__nb") -
      dec38(col("cum_b")) * col("__na")
    ecdfGrid(df, groupCol, xCol, gA, gB)
      .select(col("__na"), col("__nb"),
        (dec38(col("c_pool")) * d * d).as("__t"))
      .groupBy(col("__na").as("n_a"), col("__nb").as("n_b"))
      .agg(sum(col("__t")).as("num_l"))
      .select(col("n_a"), col("n_b"), col("num_l"),
        when(col("n_a") > 0 && col("n_b") > 0,
          floor(lit(1.0e6) * col("num_l").cast("double") /
            (col("n_a").cast("double") * col("n_b").cast("double") *
              (col("n_a") + col("n_b")).cast("double") *
              (col("n_a") + col("n_b")).cast("double")))
            .cast("long")).as("t_q"))
  }

  /** Exact (squared) energy distance between two named groups — the
    * characteristic-function drift metric that is zero IFF the
    * distributions are identical, sensitive to shape differences KS
    * underweights:
    *
    *   E² = 2·E|X−Y| − E|X−X′| − E|Y−Y′|
    *
    * Each pairwise-|diff| expectation computes EXACTLY from the
    * sorted-grid prefix sums (no pair enumeration): with cum/scum
    * the cumulative count/value-sum at v,
    *
    *   Σ_x |x − v| = (cum·v − scum) + ((S_tot − scum) − (n − cum)·v)
    *
    * so S_XY = Σ_v cY(v)·Σ_x|x−v| is one grid fold per pair. Clearing
    * denominators: E²·n_a²·n_b² = 2·S_AB·n_a·n_b − S_AA·n_b² −
    * S_BB·n_a², an exact decimal — then ONE division.
    *
    * @return one row (n_a, n_b, sab_l, saa_l, sbb_l, e2_q = ⌊10⁶·E²⌋)
    */
  def energyDistance(df: DataFrame, groupCol: String, xCol: String,
                     gA: String, gB: String): DataFrame = {
    val dec38 = (c: Column) => c.cast("decimal(38,0)")
    def absSum(cum: Column, scum: Column, n: Column, stot: Column) =
      (dec38(cum) * col("__v") - scum) +
        ((dec38(stot) - scum) - (dec38(n) - cum) * col("__v"))
    val g = ecdfGrid(df, groupCol, xCol, gA, gB)
      .withColumn("__absA",
        absSum(col("cum_a"), dec38(col("scum_a")), col("__na"), col("__sa")))
      .withColumn("__absB",
        absSum(col("cum_b"), dec38(col("scum_b")), col("__nb"), col("__sb")))
    val one = g.groupBy(col("__na").as("n_a"), col("__nb").as("n_b"))
      .agg(
        sum(dec38(col("__cb")) * col("__absA")).as("sab_l"),
        sum(dec38(col("__ca")) * col("__absA")).as("saa_l"),
        sum(dec38(col("__cb")) * col("__absB")).as("sbb_l"))
    one.select(col("n_a"), col("n_b"), col("sab_l"), col("saa_l"),
      col("sbb_l"),
      when(col("n_a") > 0 && col("n_b") > 0,
        floor(lit(1.0e6) *
          (lit(2L).cast("decimal(38,0)") * col("sab_l") * col("n_a") *
            col("n_b") - col("saa_l") * col("n_b") * col("n_b") -
            col("sbb_l") * col("n_a") * col("n_a")).cast("double") /
          (col("n_a").cast("double") * col("n_a").cast("double") *
            col("n_b").cast("double") * col("n_b").cast("double")))
          .cast("long")).as("e2_q"))
  }

  /** Yuen's trimmed-mean two-sample test — the Welch t that a handful
    * of boilerplate mega-documents can't drag: each side drops its
    * g = ⌊n·trimNum/trimDen⌋ smallest and largest order statistics,
    * compares TRIMMED means, and scales by the WINSORIZED variance
    * (clamp, don't drop, for the spread — Yuen 1974's pairing).
    *
    * Exact pipeline: one per-group sort (row_number by value — equal
    * values make the position choice irrelevant for every sum below),
    * trimmed sums Σv over positions (g, n−g], winsorized sums
    * Σw / Σw² with w = clamp(v, v_{g+1}, v_{n−g}) as exact
    * longs/decimals. With h = n − 2g, SSW·n = n·Σw² − (Σw)² (the
    * n-cleared centered sum, decimal-exact),
    *
    *   d_j = (n_j·Σw² − (Σw)²) / (n_j · h_j·(h_j−1))     [double]
    *   t   = (Σt₁/h₁ − Σt₂/h₂) / sqrt(d₁ + d₂)
    *
    * — five double ops in a FIXED order after exact integer
    * arithmetic, mirrored verbatim in the oracle.
    *
    * Plan shape: two hash aggregations over one per-group sorted
    * window pass; the quantile clamp values ride the same window (max
    * over the prefix at position g+1 / n−g) — no second scan, no
    * driver collect.
    *
    * @return one row (n_a, n_b, h_a, h_b, tsum_a, tsum_b, t_q)
    */
  def yuenTrimmed(df: DataFrame, groupCol: String, xCol: String,
                  gA: String, gB: String,
                  trimNum: Int = 1, trimDen: Int = 5): DataFrame = {
    require(trimNum >= 0 && trimDen > 0 && 2 * trimNum < trimDen,
      s"trim fraction $trimNum/$trimDen must sit in [0, 1/2)")
    val dec38 = (c: Column) => c.cast("decimal(38,0)")
    val base = df
      .filter(col(groupCol) === gA || col(groupCol) === gB)
      .select(col(groupCol).as("__g"), col(xCol).cast("long").as("__v"))
      .na.drop()
    val w = Window.partitionBy(col("__g")).orderBy(col("__v"))
    val pos = base
      .withColumn("__i", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(
        Window.partitionBy(col("__g"))))
      .withColumn("__trim", expr(s"(__n * $trimNum) div $trimDen"))
    // the clamp bounds are order statistics at positions trim+1 and
    // n−trim — grab each with a conditional max over the full group
    val bounds = pos.groupBy(col("__g"))
      .agg(max(when(col("__i") === col("__trim") + 1L, col("__v")))
          .as("__lo"),
        max(when(col("__i") === col("__n") - col("__trim"), col("__v")))
          .as("__hi"))
    val stats = pos.join(broadcast(bounds), Seq("__g"))
      .withColumn("__w",
        least(greatest(col("__v"), col("__lo")), col("__hi")))
      .groupBy(col("__g"))
      .agg(max(col("__n")).as("__nn"), max(col("__trim")).as("__gg"),
        sum(when(col("__i") > col("__trim") &&
          col("__i") <= col("__n") - col("__trim"), col("__v")))
          .as("__tsum"),
        sum(dec38(col("__w"))).as("__wsum"),
        sum(dec38(col("__w")) * dec38(col("__w"))).as("__wsq"))
      .withColumn("__h", col("__nn") - lit(2L) * col("__gg"))
      .withColumn("__ssn",
        dec38(col("__nn")) * col("__wsq") - col("__wsum") * col("__wsum"))
    val a = stats.filter(col("__g") === gA)
    val b = stats.filter(col("__g") === gB)
    a.crossJoin(b.select(col("__nn").as("__nn2"), col("__gg").as("__gg2"),
        col("__tsum").as("__tsum2"), col("__h").as("__h2"),
        col("__ssn").as("__ssn2")))
      .select(col("__nn").as("n_a"), col("__nn2").as("n_b"),
        col("__h").as("h_a"), col("__h2").as("h_b"),
        col("__tsum").as("tsum_a"), col("__tsum2").as("tsum_b"),
        when(col("__h") >= 2 && col("__h2") >= 2,
          floor(lit(1.0e6) *
            (col("__tsum").cast("double") / col("__h").cast("double") -
              col("__tsum2").cast("double") / col("__h2").cast("double")) /
            sqrt(col("__ssn").cast("double") /
                (col("__nn").cast("double") * col("__h").cast("double") *
                  (col("__h") - 1L).cast("double")) +
              col("__ssn2").cast("double") /
                (col("__nn2").cast("double") * col("__h2").cast("double") *
                  (col("__h2") - 1L).cast("double"))))
            .cast("long")).as("t_q"))
  }

  /** Quantile–quantile drift profile between two groups — WHERE in
    * the distribution did the shift happen: at each vigintile
    * p/20 (p = 1..19), both groups' integer-rank lower quantiles
    * (first value with 20·cum ≥ p·n — the [[tukeyFences]] rank
    * convention) and their signed gap. [[ksDrift]] answers "how far
    * apart at the worst point"; this answers "is it the tails or the
    * body", which decides whether a dedup cap or a length filter is
    * the fix.
    *
    * Exact end to end: value-grid cumulative counts per group, one
    * 19-row broadcast grid join, min-fold per (group, p) — zero fp
    * anywhere.
    *
    * @return 19 rows (p, q_a, q_b, gap = q_a − q_b) ordered by p
    */
  def qqDrift(df: DataFrame, groupCol: String, xCol: String,
              gA: String, gB: String): DataFrame = {
    val base = df
      .filter(col(groupCol) === gA || col(groupCol) === gB)
      .select(col(groupCol).as("__g"), col(xCol).cast("long").as("__v"))
      .na.drop()
    val cum = base.groupBy(col("__g"), col("__v"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(
        Window.partitionBy(col("__g")).orderBy(col("__v"))))
      .withColumn("__n", sum(col("__c")).over(
        Window.partitionBy(col("__g"))))
    val ps = base.sparkSession.range(1, 20).select(col("id").as("p"))
    val quant = cum.crossJoin(broadcast(ps))
      .filter(col("__cum") * 20 >= col("p") * col("__n"))
      .groupBy(col("__g"), col("p")).agg(min(col("__v")).as("__q"))
    quant.filter(col("__g") === gA)
      .select(col("p"), col("__q").as("q_a"))
      .join(quant.filter(col("__g") === gB)
        .select(col("p"), col("__q").as("q_b")), Seq("p"))
      .select(col("p"), col("q_a"), col("q_b"),
        (col("q_a") - col("q_b")).as("gap"))
      .orderBy(col("p"))
  }
}
