package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Engine-exact statistical audits: dimension covariance over
  * embedding columns, grouped Pearson correlation, truncated
  * exponential smoothing, and Simpson concentration — each computed
  * from exact integer sums with every floating-point op in a fixed
  * operand order, so the quantized outputs are bit-identical on any
  * engine (the suite's standing reproducibility contract).
  */
object Stats {

  /** Quantized-grid covariance between the first `dims` embedding
    * dimensions: per-row products ⌊10⁶·x_j·x_k⌋ (j ≤ k) are summed as
    * exact longs, per-dimension sums ⌊10⁶·x_j⌋ likewise, and
    *
    *   cov_q(j,k) = ⌊ S_xy/n − S_x·S_y/(n·n·10⁶) ⌋
    *
    * (covariance on the 10⁻⁶ quantization grid, scaled 10⁶ — the
    * audit that catches dead, duplicated, or linearly-tied embedding
    * dimensions before a training run bakes them in).
    *
    * Plan: ONE explode to dims²/2 struct rows per vector + one hash
    * agg; the per-dim sums ride a second bounded agg broadcast back.
    * Sums are decimal(38,0) — corpus-scale Σ|10⁶·x·y| overflows long.
    */
  def dimCovariance(df: DataFrame, vecCol: String, dims: Int): DataFrame = {
    require(dims >= 1 && dims <= 64, s"dims ($dims) must be in [1, 64]")
    val pairCols = for { j <- 1 to dims; k <- j to dims } yield
      struct(lit(j).as("dj"), lit(k).as("dk"),
        floor(lit(1000000.0) *
          element_at(col(vecCol), j).cast("double") *
          element_at(col(vecCol), k).cast("double")).cast("long").as("pq"))
    val prod = df.filter(size(col(vecCol)) >= dims)
      .select(explode(array(pairCols: _*)).as("p"))
      .select(col("p.dj"), col("p.dk"), col("p.pq"))
      .groupBy(col("dj"), col("dk"))
      .agg(count(lit(1)).as("n"),
        sum(col("pq").cast("decimal(38,0)")).as("sxy"))
    val dimCols = (1 to dims).map(j =>
      struct(lit(j).as("d"),
        floor(lit(1000000.0) * element_at(col(vecCol), j).cast("double"))
          .cast("long").as("xq")))
    val sums = df.filter(size(col(vecCol)) >= dims)
      .select(explode(array(dimCols: _*)).as("s"))
      .select(col("s.d"), col("s.xq"))
      .groupBy(col("d"))
      .agg(sum(col("xq").cast("decimal(38,0)")).as("sx"))
    prod
      .join(broadcast(sums.select(col("d").as("dj"), col("sx").as("__sj"))),
        Seq("dj"))
      .join(broadcast(sums.select(col("d").as("dk"), col("sx").as("__sk"))),
        Seq("dk"))
      .select(col("dj"), col("dk"), col("n"),
        floor(col("sxy").cast("double") / col("n").cast("double") -
          col("__sj").cast("double") * col("__sk").cast("double") /
            (col("n").cast("double") * col("n").cast("double") *
              lit(1000000.0))).cast("long").as("cov_q"))
  }

  /** Per-group Pearson correlation of two INTEGER metrics, from the
    * five exact sums:
    *
    *   r_q = ⌊10⁶ · (n·Sxy − Sx·Sy) / (√(n·Sxx − Sx²)·√(n·Syy − Sy²))⌋
    *
    * Sums and products run in decimal(38,0) (corpus-scale products
    * pass 10¹⁹); the two sqrt/divide ops happen once per GROUP on the
    * exact integers, so the result is engine-identical. Degenerate
    * groups (zero variance on either axis) yield null.
    */
  def pearson(df: DataFrame, groupCol: String, xCol: String,
              yCol: String): DataFrame = {
    val d = (c: Column) => c.cast("decimal(38,0)")
    val agg = df.select(col(groupCol), col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y"))
      .na.drop()
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(d(col("__x"))).as("sx"), sum(d(col("__y"))).as("sy"),
        sum(d(col("__x")) * d(col("__x"))).as("sxx"),
        sum(d(col("__y")) * d(col("__y"))).as("syy"),
        sum(d(col("__x")) * d(col("__y"))).as("sxy"))
    val vx = (d(col("n")) * col("sxx") - col("sx") * col("sx"))
    val vy = (d(col("n")) * col("syy") - col("sy") * col("sy"))
    val cov = (d(col("n")) * col("sxy") - col("sx") * col("sy"))
    agg.select(col(groupCol), col("n"),
      when(vx > 0 && vy > 0,
        floor(lit(1000000.0) * cov.cast("double") /
          (sqrt(vx.cast("double")) * sqrt(vy.cast("double"))))
          .cast("long")).as("pearson_q"))
  }

  /** Truncated exponential smoothing over a bucketed per-group series:
    *
    *   ewma(i) = Σ_{d=0..W−1} x_{i−d} / 2^(d+1)
    *
    * — the α = 1/2 EWMA cut off after `window` lags (the tail beyond W
    * contributes < 2^−W of one observation). Every weight is an exact
    * power of two and the W-term chain adds in a fixed order, so the
    * quantized output is engine-identical; missing lags (series head)
    * contribute 0, exactly like the recursive form started from 0.
    * One per-group window sort, W lag() reads over it.
    */
  def ewmaSmooth(buckets: DataFrame, groupCol: String, bucketCol: String,
                 xCol: String, window: Int): DataFrame = {
    require(window >= 1 && window <= 62, s"window ($window) must be in [1, 62]")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(bucketCol))
    val chain = (0 until window).map { dlag =>
      coalesce(lag(col(xCol).cast("long"), dlag).over(w), lit(0L))
        .cast("double") / lit(math.pow(2.0, dlag + 1.0))
    }.reduceLeft(_ + _)
    buckets.select(col(groupCol), col(bucketCol),
      col(xCol).cast("long").as("x"),
      floor(lit(1000000.0) * chain).cast("long").as("ewma_q"))
  }

  /** Simpson concentration per group: λ = Σ_c (n_c/n)² over the
    * categories of `catCol` — 1 = one category dominates, 1/k = k
    * uniform categories. The "is this source one language or twenty"
    * audit with NO transcendentals: λ_q = ⌊10⁶·Σn_c²/n²⌋ from exact
    * counts (decimal products).
    */
  def simpson(df: DataFrame, groupCol: String, catCol: String): DataFrame =
    df.select(col(groupCol), col(catCol))
      .na.drop()
      .groupBy(col(groupCol), col(catCol))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_cats"),
        sum(col("__c")).as("n"),
        sum(col("__c").cast("decimal(38,0)") *
          col("__c").cast("decimal(38,0)")).as("__s2"))
      .select(col(groupCol), col("n"), col("n_cats"),
        floor(lit(1000000.0) * col("__s2").cast("double") /
          (col("n").cast("double") * col("n").cast("double")))
          .cast("long").as("simpson_q"))
}
