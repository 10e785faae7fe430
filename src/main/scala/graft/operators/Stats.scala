package graft.operators

import graft.operators.Mat._
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

  /** Top principal component of the first `dims` embedding dimensions
    * by INTEGER power iteration on the [[dimCovariance]] grid — the
    * whitening/compression direction an embedding pipeline audits
    * before quantizing or projecting (a dominant component explaining
    * most variance means the effective dimensionality is lower than
    * the stored one).
    *
    * The distributed work is exactly one covariance pass (the d²/2
    * grid); the d×d iteration then runs on the driver in EXACT BigInt
    * (d² values — bounded by the dims cap, never corpus-sized),
    * mirroring [[graft.operators.Packing.neymanAllocation]]'s
    * bounded-collect shape. Per iteration, with C the symmetrized
    * quantized covariance and v on the Q = 10¹² grid:
    *
    *   w_j = Σ_k C_jk·v_k      (exact BigInt)
    *   v'_j = sign(w_j)·⌊Q·|w_j| / Σ|w|⌋   (L1 normalize, sign-safe:
    *                            both engines floor a NON-NEGATIVE quotient)
    *
    * After the last round the sign is canonicalized (component with
    * the largest |v|, ties to the smaller dim, made positive) and the
    * Rayleigh-style eigenvalue estimate λ = trunc(Σv·w / Σv·v) is
    * emitted on cov_q's 10⁶ grid (truncating division — BigInt's and
    * HUGEINT //'s shared semantics). Zero iterations of float anywhere past the
    * covariance quantization → bit-identical on any engine.
    *
    * @return (dim, v_q, lambda_q) — one row per dimension
    */
  def pcaPower(df: DataFrame, vecCol: String, dims: Int,
               iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 10, s"iters ($iters) must be in [1, 10]")
    import df.sparkSession.implicits._
    val Qv = BigInt(1000000000000L)
    val grid = dimCovariance(df, vecCol, dims).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> BigInt(r.getLong(3))).toMap
    val c = Array.tabulate(dims, dims)((j, k) =>
      grid.getOrElse((math.min(j, k) + 1, math.max(j, k) + 1), BigInt(0)))
    // start vector Q+j, not uniform Q: the all-ones vector can be
    // EXACTLY orthogonal to the dominant eigenvector (e.g. a perfectly
    // anti-correlated pair), and C maps it to zero — distinct per-dim
    // offsets break the symmetry deterministically
    var v = Array.tabulate(dims)(j => Qv + j + 1)
    var w = v
    for (_ <- 1 to iters) {
      w = Array.tabulate(dims)(j =>
        (0 until dims).map(k => c(j)(k) * v(k)).sum)
      val s = w.map(_.abs).sum
      if (s != 0)
        v = w.map(x => x.signum * ((Qv * x.abs) / s))
    }
    val anchor = v.zipWithIndex.maxBy { case (x, i) => (x.abs, BigInt(-i)) }
    if (anchor._1 < 0) { v = v.map(-_); w = w.map(-_) }
    val vv = v.map(x => x * x).sum
    val lambda = if (vv == 0) 0L
      else {
        val vw = v.indices.map(j => v(j) * w(j)).sum
        // BigInt / truncates toward zero — exactly DuckDB's HUGEINT //
        (vw / vv).toLong
      }
    v.zipWithIndex.map { case (x, i) => (i + 1, x.toLong, lambda) }
      .toSeq.toDF("dim", "v_q", "lambda_q")
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

  /** Pearson chi-square contingency audit over two categorical
    * columns ("is language independent of source"): per cell the
    * observed count o, the expected count under independence, and the
    * cell's chi-square contribution, computed from the EXACT identity
    *
    *   (o − e)²/e  =  (N·o − r·c)² / (N·r·c)
    *
    * with r = row total, c = column total. Products stay in
    * decimal(38,0); the single divide per cell runs on the exact
    * integers (doubles, correctly-rounded IEEE ops in a fixed order)
    * so e_q = ⌊10⁶·r·c/N⌋ and contrib_q = ⌊10⁶·(N·o−r·c)²/(N·r·c)⌋
    * are engine-identical. Plan: one hash agg to cells, two bounded
    * marginal aggs broadcast back — the corpus is scanned once.
    * (At 10¹⁰⁺ rows (N·o−r·c)² approaches decimal38's ceiling —
    * sub-sample or bucket first; the audit is about proportions.)
    */
  def chiSquare(df: DataFrame, rowCol: String, colCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    // compute-once: cells feeds itself + three marginal subtrees —
    // without materialization the corpus scan re-executes per subtree
    val cells = df.select(col(rowCol), col(colCol)).na.drop()
      .groupBy(col(rowCol), col(colCol)).agg(count(lit(1)).as("o"))
      .mat
    val rows = cells.groupBy(col(rowCol)).agg(sum(col("o")).as("__r"))
    val cols = cells.groupBy(col(colCol)).agg(sum(col("o")).as("__c"))
    val tot = cells.agg(sum(col("o")).as("__t"))
    val dev = dec(col("__t")) * dec(col("o")) - dec(col("__r")) * dec(col("__c"))
    cells
      .join(broadcast(rows), Seq(rowCol))
      .join(broadcast(cols), Seq(colCol))
      .crossJoin(broadcast(tot))
      .select(col(rowCol), col(colCol), col("o"),
        floor(lit(1000000.0) *
          (dec(col("__r")) * dec(col("__c"))).cast("double") /
          col("__t").cast("double")).cast("long").as("e_q"),
        floor(lit(1000000.0) * (dev * dev).cast("double") /
          (dec(col("__t")) * dec(col("__r")) * dec(col("__c")))
            .cast("double")).cast("long").as("contrib_q"))
  }

  /** Per-group Spearman rank correlation: average-rank transform on
    * each axis, then [[pearson]] on the ranks. Average ranks are kept
    * EXACT as doubled integers — for a tie run starting at min-rank m
    * with t members, 2·avgrank = 2·m + t − 1 — so the downstream
    * Pearson runs on exact longs and inherits its bit-reproducibility
    * (the shared ×2 cancels in the correlation). Two per-group window
    * sorts (one per axis); everything after is [[pearson]]'s hash agg.
    */
  def spearman(df: DataFrame, groupCol: String, xCol: String,
               yCol: String): DataFrame = {
    def r2(c: String, out: String) = {
      val w = Window.partitionBy(col(groupCol)).orderBy(col(c))
      val t = Window.partitionBy(col(groupCol), col(c))
      (lit(2L) * rank().over(w) + count(lit(1)).over(t) - lit(1L)).as(out)
    }
    val ranked = df
      .select(col(groupCol), col(xCol).cast("long").as("__xv"),
        col(yCol).cast("long").as("__yv"))
      .na.drop()
      .select(col(groupCol), r2("__xv", "__rx"), r2("__yv", "__ry"))
    pearson(ranked, groupCol, "__rx", "__ry")
      .withColumnRenamed("pearson_q", "spearman_q")
  }

  /** Gini concentration of a non-negative integer mass per group
    * ("how unequal is token mass across this source's documents"):
    * with the group's masses sorted ascending (ties broken by `idCol`
    * so the permutation — and through it the rank-weighted sum — is
    * unique),
    *
    *   gini_q = ⌊10⁶ · (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx)⌋
    *
    * Exact integer numerator/denominator in decimal(38,0), one
    * correctly-rounded divide per group. Plan: one per-group window
    * sort for the rank weights + one hash agg. Groups with zero total
    * mass yield null.
    */
  def gini(df: DataFrame, groupCol: String, idCol: String,
           wCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__w").asc, col(idCol).asc)
    val ranked = df
      .select(col(groupCol), col(idCol), col(wCol).cast("long").as("__w"))
      .na.drop()
      .withColumn("__i", row_number().over(w))
    val agg = ranked.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(dec(col("__w"))).as("s"),
        sum(dec(col("__i")) * dec(col("__w"))).as("__sw"))
    agg.select(col(groupCol), col("n"), col("s").cast("long").as("total"),
      when(col("s") > 0,
        floor(lit(1000000.0) *
          (lit(2) * col("__sw") - (dec(col("n")) + lit(1)) * col("s"))
            .cast("double") /
          (dec(col("n")) * col("s")).cast("double")).cast("long"))
        .as("gini_q"))
  }

  /** Total-variation distance between each group's categorical
    * distribution and the corpus distribution — the transcendental-free
    * divergence audit (exact where KL/JSD would smuggle in ln):
    *
    *   TVD_g = ½ Σ_t |c_{g,t}/S_g − C_t/T|
    *
    * computed over the common denominator S_g·T so every term is an
    * exact decimal: Σ_{t∈g} |c_{g,t}·T − C_t·S_g| plus S_g·(T − Σ_{t∈g} C_t)
    * for the mass of categories the group never emits — no group ×
    * full-vocabulary frame is ever materialized. One divide per group
    * at the end: tvd_q = ⌊10⁶·num/(2·S_g·T)⌋.
    *
    * Plan: map-side-combined (group, item) counts equi-join the
    * bounded per-item corpus table, then one per-group agg.
    */
  def tvdVsCorpus(df: DataFrame, groupCol: String,
                  itemCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    // compute-once: the (group, item) grid feeds the join plus three
    // aggregate subtrees — one corpus scan, not four
    val gi = df.select(col(groupCol), col(itemCol)).na.drop()
      .groupBy(col(groupCol), col(itemCol)).agg(count(lit(1)).as("__c"))
      .mat
    val corpus = gi.groupBy(col(itemCol)).agg(sum(col("__c")).as("__ct"))
    val totals = gi.groupBy(col(groupCol)).agg(sum(col("__c")).as("__s"))
    val grand = gi.agg(sum(col("__c")).as("__t"))
    gi.join(corpus, Seq(itemCol))
      .join(broadcast(totals), Seq(groupCol))
      .crossJoin(broadcast(grand))
      .groupBy(col(groupCol))
      .agg(first(col("__s")).as("n"),
        sum(abs(dec(col("__c")) * dec(col("__t")) -
          dec(col("__ct")) * dec(col("__s")))).as("__present"),
        sum(dec(col("__ct"))).as("__covered"),
        first(dec(col("__s"))).as("__sg"), first(dec(col("__t"))).as("__tt"))
      .select(col(groupCol), col("n"),
        floor(lit(1000000.0) *
          (col("__present") + col("__sg") * (col("__tt") - col("__covered")))
            .cast("double") /
          (lit(2) * col("__sg") * col("__tt")).cast("double"))
          .cast("long").as("tvd_q"))
  }

  /** One-vs-rest Mann–Whitney U on a bounded-cardinality integer
    * metric — the rank-based two-sample location test that backs the
    * KS-drift audit with an effect-size statistic. Entirely on the
    * (distinct value) grid, so there is NO row-level global sort:
    * for value v with corpus count n_v and smaller-value mass
    * cum_v, the doubled midrank is 2·cum_v + n_v + 1, and
    *
    *   2·U_g = Σ_v c_{g,v}·(2·cum_v + n_v + 1) − n_g·(n_g + 1)
    *
    * (doubling keeps tie midranks integer; halve downstream if the
    * classical U is wanted). Also emits the doubled expected value
    * 2·E[U] = n_g·(N − n_g) under H₀ — comparing u2 against eu2 gives
    * the direction of the shift exactly.
    *
    * Plan: one hash agg to the (group, value) grid, one window over
    * the BOUNDED distinct-value grid for cumulative counts, one
    * per-group agg. Decimal products (corpus-scale rank sums pass
    * 10²⁰).
    */
  def mannWhitney(df: DataFrame, groupCol: String,
                  xCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    // compute-once: gv feeds the join plus the value-grid and grand
    // totals — one corpus scan, not three
    val gv = df.select(col(groupCol), col(xCol).cast("long").as("__v"))
      .na.drop()
      .groupBy(col(groupCol), col("__v")).agg(count(lit(1)).as("__c"))
      .mat
    val vals = gv.groupBy(col("__v")).agg(sum(col("__c")).as("__nv"))
      .withColumn("__cum",
        coalesce(sum(col("__nv")).over(
          Window.orderBy(col("__v"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val grand = gv.agg(sum(col("__c")).as("__t"))
    gv.join(broadcast(vals), Seq("__v"))
      .crossJoin(broadcast(grand))
      .groupBy(col(groupCol))
      .agg(sum(col("__c")).as("n"),
        sum(dec(col("__c")) *
          (lit(2) * dec(col("__cum")) + dec(col("__nv")) + lit(1)))
          .as("__r2"),
        first(col("__t")).as("__t"))
      .select(col(groupCol), col("n"),
        (col("__r2") - dec(col("n")) * (dec(col("n")) + lit(1)))
          .cast("long").as("u2"),
        (dec(col("n")) * (dec(col("__t")) - dec(col("n"))))
          .cast("long").as("eu2"))
    // decimal(38,0) internally; the long gate surface holds to ~10⁹
    // rows per side — past that read the decimals before the cast
  }

  /** Mutual information between two categorical columns, decomposed
    * per cell — the information-theoretic companion to [[chiSquare]]
    * (chi-square asks "is there association"; MI says how many NATS
    * of one label the other reveals):
    *
    *   contrib_q = ⌊10⁶ · o · ln((N·o)/(r·c)) / N⌋
    *
    * MI = Σ contrib_q / 10⁶ over cells. The ln argument is built from
    * EXACT integer products (decimal(38,0) → double, correctly
    * rounded), and the fp chain per cell is fixed-order: divide, ln,
    * scale — the same ln-on-exact-inputs contract as token entropy
    * (q166). Negative contributions (cells rarer than independence
    * predicts) are real and kept. Plan: identical shape to
    * [[chiSquare]] — one corpus scan, bounded marginals broadcast
    * back.
    */
  def mutualInfo(df: DataFrame, rowCol: String, colCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    // compute-once cell grid (see chiSquare)
    val cells = df.select(col(rowCol), col(colCol)).na.drop()
      .groupBy(col(rowCol), col(colCol)).agg(count(lit(1)).as("o"))
      .mat
    val rows = cells.groupBy(col(rowCol)).agg(sum(col("o")).as("__r"))
    val cols = cells.groupBy(col(colCol)).agg(sum(col("o")).as("__c"))
    val tot = cells.agg(sum(col("o")).as("__t"))
    cells
      .join(broadcast(rows), Seq(rowCol))
      .join(broadcast(cols), Seq(colCol))
      .crossJoin(broadcast(tot))
      .select(col(rowCol), col(colCol), col("o"),
        floor(lit(1000000.0) * col("o").cast("double") *
          log((dec(col("__t")) * dec(col("o"))).cast("double") /
            (dec(col("__r")) * dec(col("__c"))).cast("double")) /
          col("__t").cast("double")).cast("long").as("mi_contrib_q"))
  }

  /** Benford first-significant-digit audit of a positive numeric
    * column: per digit d ∈ 1..9 the observed count, the observed
    * share ⌊10⁶·n_d/N⌋, and the deviation from Benford's
    * ⌊10⁶·log₁₀(1+1/d)⌋ — the expected shares are nine COMPILED
    * constants (evaluated once on the driver), so no runtime
    * transcendental enters the plan. The digit extract is string-form
    * (first char of the digits of the absolute value), which for
    * DECIMAL inputs is exact — no float formatting ambiguity.
    * Plan shape: scan + 9-row hash agg.
    */
  def benford(df: DataFrame, numCol: String): DataFrame = {
    val digits = (1 to 9).map(dd =>
      dd -> math.floor(1000000.0 * math.log10(1.0 + 1.0 / dd)).toLong).toMap
    val expected = typedLit(digits)
    val d = df.select(regexp_extract(col(numCol).cast("string"),
        "[1-9]", 0).as("__d"))
      .filter(col("__d") =!= "")
      .groupBy(col("__d").cast("int").as("digit"))
      .agg(count(lit(1)).as("n"))
      .mat // 9-row grid: scan once, not twice
    val tot = d.agg(sum(col("n")).as("__t"))
    d.crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        floor(lit(1000000.0) * col("n").cast("double") /
          col("__t").cast("double")).cast("long").as("share_q"),
        element_at(expected, col("digit")).as("benford_q"))
      .withColumn("dev_q", col("share_q") - col("benford_q"))
  }

  /** Jensen–Shannon divergence of each group's item distribution
    * against the REST of the corpus — the bounded, symmetric
    * complement to [[tvdVsCorpus]] (TVD weights all mass shifts
    * equally; JSD amplifies items one side has and the other lacks,
    * which is what actually flags a source whose vocabulary is alien
    * rather than merely re-weighted).
    *
    * Per (group g, item t): p = c_{g,t}/n_g, q = (c_t − c_{g,t})/n_r,
    * m = (p+q)/2, contribution ½·p·ln(p/m) + ½·q·ln(q/m) (x·ln(x/m)
    * := 0 at x = 0), quantized ⌊10¹²·⌋ per ITEM and summed as longs —
    * partition-order free, and every double is produced by the same
    * operand-order expression on any engine.
    *
    * Scale shape: the naive grid is |groups|·|vocab| (dense in the
    * vocabulary). This implementation only materializes PRESENT
    * (group, item) pairs; items absent from a group contribute the
    * closed form ½·q·ln2 that depends ONLY on the item's corpus count
    * — so absent mass aggregates on the (group, corpus-count) grid
    * (distinct counts are O(√mass) under Zipf, not O(vocab)): count
    * how many items with corpus count c the group does NOT contain,
    * times the per-item quantized contribution at c.
    *
    * @return (group, n_tokens, n_rest, n_present, n_absent, jsd_q)
    */
  def jsDivergence(df: DataFrame, groupCol: String,
                   itemCol: String): DataFrame = {
    // compute-once: the present grid feeds four aggregate subtrees
    val gi = df.select(col(groupCol), col(itemCol)).na.drop()
      .groupBy(col(groupCol), col(itemCol)).agg(count(lit(1)).as("__c"))
      .mat
    val corpus = gi.groupBy(col(itemCol)).agg(sum(col("__c")).as("__ct"))
      .mat
    val totals = gi.groupBy(col(groupCol)).agg(sum(col("__c")).as("__ng"))
    val grand = gi.agg(sum(col("__c")).as("__t"))
    val withRest = broadcast(totals.crossJoin(grand)
      .select(col(groupCol), col("__ng"), (col("__t") - col("__ng")).as("__nr")))
    // present pairs: exact per-item quantized contribution
    val p = col("__c").cast("double") / col("__ng").cast("double")
    val q = (col("__ct") - col("__c")).cast("double") / col("__nr").cast("double")
    val m = (p + q) / lit(2.0)
    val contrib =
      lit(0.5) * p * log(p / m) +
        when(col("__ct") > col("__c"), lit(0.5) * q * log(q / m)).otherwise(lit(0.0))
    val present = gi.join(corpus, Seq(itemCol))
      .join(withRest, Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_present"),
        // decimal accumulator: vocab-scale item counts × 10¹² grid
        // contributions pass long range
        sum(floor(lit(1.0e12) * contrib).cast("decimal(38,0)"))
          .as("__jsd_present"),
        // per-(group, corpus-count) present-item tallies for the
        // absent-side complement below
        first(col("__ng")).as("n_tokens"), first(col("__nr")).as("n_rest"))
    val presentByCount = gi.join(corpus, Seq(itemCol))
      .groupBy(col(groupCol), col("__ct"))
      .agg(count(lit(1)).as("__npres"))
    // items with corpus count c: bounded grid under Zipf
    val countGrid = corpus.groupBy(col("__ct")).agg(count(lit(1)).as("__nitems"))
    val qa = col("__ct").cast("double") / col("__nr").cast("double")
    val absent = withRest.crossJoin(countGrid)
      .join(presentByCount, Seq(groupCol, "__ct"), "left")
      .select(col(groupCol),
        (col("__nitems") - coalesce(col("__npres"), lit(0L))).as("__nabs"),
        floor(lit(1.0e12) * (lit(0.5) * qa * log(lit(2.0))))
          .cast("long").as("__cq"))
      .groupBy(col(groupCol))
      .agg(sum(col("__nabs")).as("n_absent"),
        sum(col("__nabs").cast("decimal(38,0)") *
          col("__cq").cast("decimal(38,0)")).as("__jsd_absent"))
    present.join(absent, Seq(groupCol))
      .select(col(groupCol), col("n_tokens"), col("n_rest"),
        col("n_present"), col("n_absent"),
        // JSD ≤ ln 2, so the 10¹² grid total is back in long range
        (col("__jsd_present") + col("__jsd_absent")).cast("long").as("jsd_q"))
  }

  /** Lag-k autocorrelation of a bucketed per-group series, computed as
    * the exact-integer Pearson kernel over (x_b, x_{b+lag}) pairs on a
    * DENSIFIED bucket grid (missing buckets count 0 — the series is a
    * count series, and skipping gaps would silently correlate
    * non-adjacent buckets). One sequence-explode per group to densify
    * (grid-bounded, not corpus-bounded), one self-join shifted by each
    * lag, one hash agg per (group, lag).
    *
    * @param buckets (groupCol, bucketCol, valueCol) — one row per
    *                present bucket; bucketCol an integer grid (e.g.
    *                [[TimeAgg.timeBucketSec]] output), stepSec its step
    * @return (group, lag, n_pairs, acf_q) — ⌊10⁶·r⌋, null when either
    *         side of the pair window is constant
    */
  def acf(buckets: DataFrame, groupCol: String, bucketCol: String,
          valueCol: String, stepSec: Long, maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 64, s"maxLag ($maxLag) must be in [1, 64]")
    val d = (c: Column) => c.cast("decimal(38,0)")
    val span = buckets.groupBy(col(groupCol))
      .agg(min(col(bucketCol)).as("__lo"), max(col(bucketCol)).as("__hi"))
    val dense = span
      .select(col(groupCol),
        explode(sequence(col("__lo"), col("__hi"), lit(stepSec)))
          .as("__b"))
      .join(buckets.select(col(groupCol), col(bucketCol).as("__b"),
        col(valueCol).cast("long").as("__v")), Seq(groupCol, "__b"), "left")
      .select(col(groupCol), col("__b"), coalesce(col("__v"), lit(0L)).as("__v"))
      .mat
    val lagged = (1 to maxLag).map { l =>
      val shifted = dense.select(col(groupCol),
        (col("__b") - lit(l * stepSec)).as("__b"), col("__v").as("__y"))
      dense.join(shifted, Seq(groupCol, "__b"))
        .select(col(groupCol), lit(l).as("lag"), col("__v").as("__x"), col("__y"))
    }.reduce(_ unionByName _)
    val agg = lagged.groupBy(col(groupCol), col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(d(col("__x"))).as("sx"), sum(d(col("__y"))).as("sy"),
        sum(d(col("__x")) * d(col("__x"))).as("sxx"),
        sum(d(col("__y")) * d(col("__y"))).as("syy"),
        sum(d(col("__x")) * d(col("__y"))).as("sxy"))
    val vx = (d(col("n_pairs")) * col("sxx") - col("sx") * col("sx"))
    val vy = (d(col("n_pairs")) * col("syy") - col("sy") * col("sy"))
    val cov = (d(col("n_pairs")) * col("sxy") - col("sx") * col("sy"))
    agg.select(col(groupCol), col("lag"), col("n_pairs"),
      when(vx > 0 && vy > 0,
        floor(lit(1000000.0) * cov.cast("double") /
          (sqrt(vx.cast("double")) * sqrt(vy.cast("double"))))
          .cast("long")).as("acf_q"))
  }

  /** Lagged cross-correlation function between two bucketed series
    * per group ("do purchases FOLLOW views, and by how many days") —
    * the cross-series companion to [[acf]], on the same shift-join
    * device: for each lag h ∈ [−maxLag, maxLag], corr(x_t, y_{t+h})
    * from exact decimal moments over the densified overlap, one
    * fp chain per (group, lag). Positive lags mean y LAGS x.
    *
    * Plan: one densify (zeros are REAL), 2·maxLag+1 self-equi-joins
    * on the bucket grid (bounded by the series span, never the raw
    * corpus), one hash agg.
    */
  def ccf(buckets: DataFrame, groupCol: String, bucketCol: String,
          xCol: String, yCol: String, stepSec: Long,
          maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 64, s"maxLag ($maxLag) must be in [1, 64]")
    val d = (c: Column) => c.cast("decimal(38,0)")
    val span = buckets.groupBy(col(groupCol))
      .agg(min(col(bucketCol)).as("__lo"), max(col(bucketCol)).as("__hi"))
    val dense = span
      .select(col(groupCol),
        explode(sequence(col("__lo"), col("__hi"), lit(stepSec)))
          .as("__b"))
      .join(buckets.select(col(groupCol), col(bucketCol).as("__b"),
        col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y")),
        Seq(groupCol, "__b"), "left")
      .select(col(groupCol), col("__b"),
        coalesce(col("__x"), lit(0L)).as("__x"),
        coalesce(col("__y"), lit(0L)).as("__y"))
      .mat
    val lagged = (-maxLag to maxLag).map { l =>
      val shifted = dense.select(col(groupCol),
        (col("__b") - lit(l * stepSec)).as("__b"),
        col("__y").as("__yl"))
      dense.join(shifted, Seq(groupCol, "__b"))
        .select(col(groupCol), lit(l).as("lag"), col("__x"), col("__yl"))
    }.reduce(_ unionByName _)
    val agg = lagged.groupBy(col(groupCol), col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(d(col("__x"))).as("sx"), sum(d(col("__yl"))).as("sy"),
        sum(d(col("__x")) * d(col("__x"))).as("sxx"),
        sum(d(col("__yl")) * d(col("__yl"))).as("syy"),
        sum(d(col("__x")) * d(col("__yl"))).as("sxy"))
    val vx = (d(col("n_pairs")) * col("sxx") - col("sx") * col("sx"))
    val vy = (d(col("n_pairs")) * col("syy") - col("sy") * col("sy"))
    val cov = (d(col("n_pairs")) * col("sxy") - col("sx") * col("sy"))
    agg.select(col(groupCol), col("lag"), col("n_pairs"),
      when(vx > 0 && vy > 0,
        floor(lit(1000000.0) * cov.cast("double") /
          (sqrt(vx.cast("double")) * sqrt(vy.cast("double"))))
          .cast("long")).as("ccf_q"))
  }

  /** Jonckheere–Terpstra ordered k-sample test ("does x INCREASE
    * along the ordered groups") — the ordered-alternative upgrade of
    * [[kruskalWallis]] (KW asks "any difference"; JT asks "a trend in
    * the group ORDER", with far more power when order is the
    * hypothesis). J = Σ_{i<j} U_ij over ordered group pairs; doubled
    * (ties count once):
    *
    *   J2 = Σ_{i<j} Σ_v c_j(v)·(2·cumBelow_i(v) + c_i(v))
    *
    * exact longs from the groups × distinct-values grid. Under H0,
    * E[J2] = (N² − Σn_i²)/2 and Var(J) = [N²(2N+3) −
    * Σn_i²(2n_i+3)]/72 (no tie correction — the [[friedman]]
    * convention), so z = (J2/2 − E[J2]/2)/√Var is one mirrored fp
    * chain on exact integers. Group ORDER is the group key's natural
    * sort — the caller encodes the dose in the key.
    *
    * Plan: one hash agg to cells, a groups × values densified grid
    * with per-group windows (grid bounded by value cardinality — the
    * [[acf]]/[[kendallTau]] input contract), one pair join on the
    * value (k²·|values| rows, bounded), two scalar aggs.
    *
    * @return one row (k, n_total, j2, e2, z_q)
    */
  def jonckheereTerpstra(df: DataFrame, groupCol: String,
                         xCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val cells = df.select(col(groupCol).cast("string").as("__g"),
        col(xCol).cast("long").as("__v"))
      .na.drop()
      .groupBy(col("__g"), col("__v")).agg(count(lit(1)).as("__c"))
      .mat
    val groups = cells.groupBy(col("__g")).agg(sum(col("__c")).as("__n"))
    val vals = cells.select(col("__v")).distinct()
    val grid = groups.select(col("__g"))
      .crossJoin(broadcast(vals))
      .join(cells, Seq("__g", "__v"), "left")
      .na.fill(0L, Seq("__c"))
    val wCum = Window.partitionBy(col("__g")).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = grid
      .withColumn("__below", sum(col("__c")).over(wCum) - col("__c"))
      .mat
    val j2 = cum.as("a").join(cum.as("b"),
        col("a.__v") === col("b.__v") && col("a.__g") < col("b.__g"))
      .agg(sum(col("b.__c") *
        (lit(2L) * col("a.__below") + col("a.__c"))).as("j2"))
    val mom = groups.agg(count(lit(1)).as("k"), sum(col("__n")).as("n_total"),
      sum(dec(col("__n")) * dec(col("__n"))).as("__sn2"),
      sum(dec(col("__n")) * dec(col("__n")) *
        (lit(2) * dec(col("__n")) + lit(3))).as("__sn3"))
    val d = (c: Column) => c.cast("double")
    // N² − Σn² = 2·Σ_{i<j} n_i·n_j is always even — exact div
    val e2 = expr("CAST((CAST(n_total AS decimal(38,0)) * n_total" +
      " - __sn2) div 2 AS LONG)")
    val varJ = (d(col("n_total")) * d(col("n_total")) *
      (lit(2.0) * d(col("n_total")) + lit(3.0)) - d(col("__sn3"))) /
      lit(72.0)
    j2.crossJoin(broadcast(mom))
      .withColumn("e2", e2)
      .select(col("k"), col("n_total"), col("j2"), col("e2"),
        when(col("k") >= 2 && varJ > lit(0.0),
          floor(lit(1000000.0) *
            ((d(col("j2")) - d(col("e2"))) * lit(0.5)) /
            sqrt(varJ)).cast("long")).as("z_q"))
  }

  /** Kendall τ-b rank correlation per group over a keyed series — the
    * tie-corrected, outlier-immune companion to [[spearman]] (Spearman
    * squares rank gaps; Kendall counts pair inversions, so one wild
    * bucket perturbs it by at most its own pairs). Exact pair counts:
    *
    *   C / D   = concordant / discordant pairs
    *   n1 / n2 = Σ t(t−1)/2 over x-ties / y-ties
    *   τ_b     = (C − D) / √((n0 − n1)(n0 − n2)),  n0 = n(n−1)/2
    *
    * C, D, n0, n1, n2 are exact integers; the single fp step is the
    * final sqrt-divide (two exact longs → double), quantized ⌊10⁶·⌋.
    *
    * CONTRACT: rows are a bounded per-group series (time buckets, band
    * grids — the [[acf]]/[[ewmaSmooth]] input class), keyed uniquely
    * within the group by `keyCol`. The pair build is a within-group
    * self-join (grid² rows) — bounded because the grid is, exactly the
    * weekly/daily-profile contract, NEVER a per-row corpus. For
    * corpus-sized inputs, pre-aggregate to a grid first; that is the
    * honest O(g·m²) shape, not a hidden global sort.
    */
  def kendallTau(df: DataFrame, groupCol: String, keyCol: String,
                 xCol: String, yCol: String): DataFrame = {
    val base = df.select(col(groupCol).as("__g"), col(keyCol).as("__k"),
        col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"))
      .na.drop()
      .mat
    val rhs = base.select(col("__g"), col("__k").as("__k2"),
      col("__x").as("__x2"), col("__y").as("__y2"))
    val pairs = base.join(rhs, Seq("__g")).filter(col("__k") < col("__k2"))
      .select(col("__g"),
        (signum(col("__x") - col("__x2")) *
          signum(col("__y") - col("__y2"))).cast("int").as("__s"),
        (col("__x") === col("__x2")).cast("long").as("__tx"),
        (col("__y") === col("__y2")).cast("long").as("__ty"))
    val agg = pairs.groupBy(col("__g"))
      .agg(count(lit(1)).as("n0"),
        sum(when(col("__s") === 1, 1L).otherwise(0L)).as("concordant"),
        sum(when(col("__s") === -1, 1L).otherwise(0L)).as("discordant"),
        sum(col("__tx")).as("__n1"), sum(col("__ty")).as("__n2"))
    val den = (col("n0") - col("__n1")).cast("double") *
      (col("n0") - col("__n2")).cast("double")
    agg.select(col("__g").as(groupCol), col("n0"), col("concordant"),
        col("discordant"),
        when(den > 0,
          floor(lit(1000000.0) *
            (col("concordant") - col("discordant")).cast("double") /
            sqrt(den)).cast("long")).as("tau_q"))
  }

  /** One-vs-rest Welch's t-test per group over an integer-valued
    * measure ("does this source's token-count distribution differ from
    * the rest of the corpus"): moments (n, Σx, Σx²) accumulate as
    * exact decimal(38,0) longs, the rest-side moments are the exact
    * integer difference total − group, and only the FINAL statistic
    * touches doubles — in one fixed operand order mirrored by the
    * oracle, so t_q = ⌊10⁶·t⌋ and the Welch–Satterthwaite df_q are
    * engine-identical.
    *
    *   v_i = (Σx² − (Σx)²/n_i) / (n_i − 1)         (sample variance)
    *   t   = (m₁ − m₂) / √(v₁/n₁ + v₂/n₂)
    *   df  = (v₁/n₁ + v₂/n₂)² / ((v₁/n₁)²/(n₁−1) + (v₂/n₂)²/(n₂−1))
    *
    * Plan: ONE corpus scan → per-group moment agg; the global moment
    * row is an aggregate of the per-group rows (never a second scan)
    * broadcast back. Groups with n < 2 on either side yield null t.
    *
    * @return (group, n1, n2, t_q, df_q)
    */
  def welchT(df: DataFrame, groupCol: String, xCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val g = df.select(col(groupCol).as("__g"), col(xCol).cast("long").as("__x"))
      .na.drop()
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("n1"), sum(dec(col("__x"))).as("__s1"),
        sum(dec(col("__x")) * dec(col("__x"))).as("__q1"))
      .mat
    val tot = g.agg(sum(col("n1")).as("__nt"), sum(col("__s1")).as("__st"),
      sum(col("__q1")).as("__qt"))
    val d = (c: Column) => c.cast("double")
    val n1 = d(col("n1"))
    val n2 = d(col("__nt") - col("n1"))
    val s1 = d(col("__s1")); val q1 = d(col("__q1"))
    val s2 = d(col("__st") - col("__s1")); val q2 = d(col("__qt") - col("__q1"))
    val v1 = (q1 - s1 * s1 / n1) / (n1 - lit(1.0))
    val v2 = (q2 - s2 * s2 / n2) / (n2 - lit(1.0))
    val se1 = v1 / n1; val se2 = v2 / n2
    val tt = (s1 / n1 - s2 / n2) / sqrt(se1 + se2)
    val dfW = (se1 + se2) * (se1 + se2) /
      (se1 * se1 / (n1 - lit(1.0)) + se2 * se2 / (n2 - lit(1.0)))
    g.crossJoin(broadcast(tot))
      .select(col("__g").as(groupCol), col("n1"),
        (col("__nt") - col("n1")).as("n2"),
        when(col("n1") >= 2 && col("__nt") - col("n1") >= 2,
          floor(lit(1000000.0) * tt).cast("long")).as("t_q"),
        when(col("n1") >= 2 && col("__nt") - col("n1") >= 2,
          floor(lit(1000000.0) * dfW).cast("long")).as("df_q"))
  }

  /** Friedman test over a complete block design ("do the event types
    * genuinely RANK differently across days, ignoring scale"): the
    * non-parametric repeated-measures ANOVA. Cells are densified to
    * the (block × treatment) grid with REAL zeros, ranks within each
    * block use the exact doubled-midrank transform (2m + t − 1, the
    * [[spearman]] device), per-treatment rank sums R2_j accumulate as
    * exact longs, and with R_j = R2_j/2 the statistic
    *
    *   Q = 12/(n·k·(k+1)) · Σ_j R_j² − 3·n·(k+1)
    *     = 3·Σ_j R2_j² / (n·k·(k+1)) − 3·n·(k+1)
    *
    * is ONE mirrored fp sequence over exact integers (no tie
    * correction — midranks make ties well-defined; the classical
    * correction is a calibration layer the caller can add).
    *
    * Plan: one hash agg to cells, a (blocks × k) densify via broadcast
    * of the tiny treatment list, one per-block window sort over the
    * k-bounded rows, two scalar aggs.
    *
    * @return one row (n_blocks, k, r2_ssq, q_q)
    */
  def friedman(df: DataFrame, blockCol: String, treatCol: String,
               valueCol: String): DataFrame = {
    val cells = df.select(col(blockCol).as("__b"), col(treatCol).as("__t"),
        col(valueCol).cast("long").as("__x"))
      .na.drop()
      .groupBy(col("__b"), col("__t")).agg(sum(col("__x")).as("__x"))
      .mat
    val grid = cells.select("__b").distinct()
      .crossJoin(broadcast(cells.select("__t").distinct()))
      .join(cells, Seq("__b", "__t"), "left")
      .na.fill(0L, Seq("__x"))
    val wRank = Window.partitionBy(col("__b")).orderBy(col("__x"))
    val wTie = Window.partitionBy(col("__b"), col("__x"))
    val sums = grid
      .withColumn("__r2",
        lit(2L) * rank().over(wRank) + count(lit(1)).over(wTie) - lit(1L))
      .groupBy(col("__t")).agg(sum(col("__r2")).as("__rs"))
      .agg(count(lit(1)).as("k"), sum(col("__rs") * col("__rs")).as("r2_ssq"))
    val n = cells.select("__b").distinct().agg(count(lit(1)).as("n_blocks"))
    sums.crossJoin(broadcast(n))
      .select(col("n_blocks"), col("k"), col("r2_ssq"),
        when(col("n_blocks") >= 1 && col("k") >= 2,
          floor(lit(1000000.0) *
            (lit(3.0) * col("r2_ssq").cast("double") /
              (col("n_blocks") * col("k") * (col("k") + lit(1L)))
                .cast("double") -
              lit(3.0) * (col("n_blocks") * (col("k") + lit(1L)))
                .cast("double"))).cast("long")).as("q_q"))
  }

  /** Kruskal–Wallis H over k groups ("do the groups genuinely shift
    * the DISTRIBUTION of x, ignoring shape") — the k-sample extension
    * of [[mannWhitney]], built on the same value-grid device: doubled
    * rank sums R2_j = Σ_v c_jv·(2·cum_v + n_v + 1) from one hash agg
    * plus a window over the DISTINCT-value grid (bounded by value
    * cardinality, never a global row sort). With R_j = R2_j/2,
    *
    *   H = 12/(N(N+1)) · Σ_j R_j²/n_j − 3(N+1).
    *
    * The per-group term is quantized ⌊10⁹·R_j²/(n_j·N·(N+1))⌋ as an
    * exact long BEFORE the cross-group sum, so the fold is a LONG sum
    * — partition-order-free — and `h_q9 = 12·Σt_j − 3·10⁹·(N+1)` is
    * pure integer arithmetic after it (the 10⁻⁹-grid H; deviation
    * from the real-valued H is < 12k·10⁻⁹). No tie correction —
    * midranks make ties well-defined (the [[friedman]] convention).
    * R2 stays exact in double to ~10⁸ rows per group (R2 ≤ 3N·n_j
    * < 2⁵³).
    *
    * @return one row (k, n_total, t_sum, h_q9)
    */
  def kruskalWallis(df: DataFrame, groupCol: String,
                    xCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val gv = df.select(col(groupCol), col(xCol).cast("long").as("__v"))
      .na.drop()
      .groupBy(col(groupCol), col("__v")).agg(count(lit(1)).as("__c"))
      .mat
    val vals = gv.groupBy(col("__v")).agg(sum(col("__c")).as("__nv"))
      .withColumn("__cum",
        coalesce(sum(col("__nv")).over(
          Window.orderBy(col("__v"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val grand = gv.agg(sum(col("__c")).as("__t"))
    val perGroup = gv.join(broadcast(vals), Seq("__v"))
      .crossJoin(broadcast(grand))
      .groupBy(col(groupCol))
      .agg(sum(col("__c")).as("n"),
        sum(dec(col("__c")) *
          (lit(2) * dec(col("__cum")) + dec(col("__nv")) + lit(1)))
          .cast("long").as("__r2"),
        first(col("__t")).as("__t"))
    val tj = floor(lit(1000000000.0) *
      (col("__r2").cast("double") * col("__r2").cast("double")) /
      (lit(4.0) * col("n").cast("double") * col("__t").cast("double") *
        (col("__t") + lit(1L)).cast("double"))).cast("long")
    perGroup
      .select(col("n"), col("__t"), tj.as("__tj"))
      .agg(count(lit(1)).as("k"), first(col("__t")).as("n_total"),
        sum(col("__tj")).as("t_sum"))
      .select(col("k"), col("n_total"), col("t_sum"),
        (lit(12L) * col("t_sum") -
          lit(3000000000L) * (col("n_total") + lit(1L))).as("h_q9"))
  }

  /** Two-sample Kolmogorov–Smirnov distance ("are the two samples
    * drawn from the SAME distribution" — the shape-sensitive
    * companion to [[mannWhitney]]'s location test): D is the max
    * ECDF gap, computed EXACTLY as integers on the common denominator
    * n_a·n_b — D_num(v) = |CA(v)·n_b − CB(v)·n_a| over the merged
    * distinct-value grid, one double division at the very end.
    *
    * Plan: one hash agg to the value grid (label split inline), one
    * window pass over the DISTINCT values (bounded by value
    * cardinality — lengths/scores, never raw row count), one scalar
    * max. Null labels count toward the B side (CASE semantics,
    * mirrored by any SQL engine).
    *
    * @return one row (n_a, n_b, d_num, d_q)
    */
  def ksTwoSample(df: DataFrame, xCol: String, label: Column): DataFrame = {
    val cells = df.select(col(xCol).cast("long").as("__v"),
        when(label, 1L).otherwise(0L).as("__a"))
      .na.drop(Seq("__v"))
      .groupBy(col("__v"))
      .agg(sum(col("__a")).as("__ca"),
        (count(lit(1)) - sum(col("__a"))).as("__cb"))
      .mat
    val tot = cells.agg(sum(col("__ca")).as("n_a"),
      sum(col("__cb")).as("n_b"))
    val w = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("__CA", sum(col("__ca")).over(w))
      .withColumn("__CB", sum(col("__cb")).over(w))
      .crossJoin(broadcast(tot))
      .select(col("n_a"), col("n_b"),
        abs(col("__CA") * col("n_b") - col("__CB") * col("n_a")).as("__d"))
      .groupBy(col("n_a"), col("n_b"))
      .agg(max(col("__d")).as("d_num"))
      .select(col("n_a"), col("n_b"), col("d_num"),
        when(col("n_a") > 0 && col("n_b") > 0,
          floor(lit(1000000.0) * col("d_num").cast("double") /
            (col("n_a").cast("double") * col("n_b").cast("double")))
            .cast("long")).as("d_q"))
  }

  /** Cochran's Q over blocks × k binary treatments ("do the k
    * event types differ in per-user PRESENCE rate" — the binary
    * repeated-measures sibling of [[friedman]]): with column totals
    * C_j, row totals R_i, and N = ΣR_i,
    *
    *   Q = (k−1)·Σ_j (k·C_j − N)² / (k·(k·ΣR_i − ΣR_i²))
    *
    * (the k·C_j − N form clears the N/k rational, so numerator and
    * denominator are EXACT longs and the statistic is one mirrored
    * double division). Absent cells are structural zeros — presence
    * is DISTINCT (block, treatment), so densification is implicit in
    * the margins.
    *
    * Plan: one distinct, two hash aggs (rows, columns), broadcast
    * scalar combine.
    *
    * @return one row (n_blocks, k, num, den, q_q)
    */
  def cochranQ(df: DataFrame, blockCol: String,
               treatCol: String): DataFrame = {
    val pres = df.select(col(blockCol).as("__b"), col(treatCol).as("__t"))
      .na.drop().distinct().mat
    val kT = pres.select(col("__t")).distinct().agg(count(lit(1)).as("k"))
    val rows = pres.groupBy(col("__b")).agg(count(lit(1)).as("__r"))
      .agg(count(lit(1)).as("n_blocks"), sum(col("__r")).as("__sr"),
        sum(col("__r") * col("__r")).as("__sr2"))
    val colsT = pres.groupBy(col("__t")).agg(count(lit(1)).as("__cj"))
    colsT.crossJoin(broadcast(kT)).crossJoin(broadcast(rows))
      .select((col("k") * col("__cj") - col("__sr")).as("__d"), col("k"),
        col("n_blocks"), col("__sr"), col("__sr2"))
      .groupBy(col("k"), col("n_blocks"), col("__sr"), col("__sr2"))
      .agg(sum(col("__d") * col("__d")).as("__ssd"))
      .select(col("n_blocks"), col("k"),
        ((col("k") - lit(1L)) * col("__ssd")).as("num"),
        (col("k") * (col("k") * col("__sr") - col("__sr2"))).as("den"),
        when(col("k") >= 2 &&
            (col("k") * col("__sr") - col("__sr2")) > 0,
          floor(lit(1000000.0) *
            ((col("k") - lit(1L)) * col("__ssd")).cast("double") /
            (col("k") * (col("k") * col("__sr") - col("__sr2")))
              .cast("double")).cast("long")).as("q_q"))
  }

  /** Population Stability Index per group vs the corpus — the
    * model-monitoring drift metric ("has this source's length/score
    * distribution moved away from the pooled one"):
    *
    *   PSI_g = Σ_bins (p_b − q_b) · ln(p_b / q_b)
    *
    * with p from the group, q from the corpus, over fixed-width value
    * bins. Zero bins are additively smoothed (+1 per bin on both
    * sides — the deterministic Laplace rule, so ln never sees 0 and
    * every engine derives the same rationals). Each bin's
    * contribution is ⌊10⁹·(p−q)·ln(p/q)⌋ quantized as a long BEFORE
    * the per-group sum — contributions are provably ≥ 0 ((p−q) and
    * ln(p/q) share sign), so the fold is an order-free long sum.
    *
    * Plan: one hash agg to (group, bin) cells, bin margins broadcast,
    * a group × bins densified grid (bins are bounded by binWidth —
    * the caller's contract), one hash agg back to groups.
    *
    * @return (group, n, n_bins, psi_q9) — the industry read: < 0.1
    *         stable, 0.1–0.2 moderate, > 0.2 drifted (in 1e-9 units)
    */
  def psi(df: DataFrame, groupCol: String, valueCol: String,
          binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth ($binWidth) must be positive")
    val cells = df.select(col(groupCol).as("__g"),
        expr(s"CAST($valueCol AS LONG) div ${binWidth}L").as("__b"))
      .na.drop()
      .groupBy(col("__g"), col("__b")).agg(count(lit(1)).as("__c"))
      .mat
    val bins = cells.groupBy(col("__b")).agg(sum(col("__c")).as("__cb"))
    val nb = bins.agg(count(lit(1)).as("__nbins"), sum(col("__cb")).as("__ntot"))
    val groups = cells.groupBy(col("__g")).agg(sum(col("__c")).as("__ng"))
    val grid = groups.crossJoin(broadcast(bins)).crossJoin(broadcast(nb))
      .join(cells, Seq("__g", "__b"), "left")
      .na.fill(0L, Seq("__c"))
    val p = (col("__c") + lit(1L)).cast("double") /
      (col("__ng") + col("__nbins")).cast("double")
    val q = (col("__cb") + lit(1L)).cast("double") /
      (col("__ntot") + col("__nbins")).cast("double")
    val contrib = floor(lit(1000000000.0) * ((p - q) * log(p / q)))
      .cast("long")
    grid
      .withColumn("__k", contrib)
      .groupBy(col("__g").as(groupCol))
      .agg(first(col("__ng")).as("n"), first(col("__nbins")).as("n_bins"),
        sum(col("__k")).as("psi_q9"))
  }

  /** Sequential probability ratio test curve (Wald 1945) for a
    * conversion rate — H0: p = p0 vs H1: p = p1, the
    * peeking-safe sequential A/B monitor: after each day the
    * cumulative log-likelihood ratio is
    *
    *   LLR = S·ln(p1/p0) + (N−S)·ln((1−p1)/(1−p0))
    *
    * and the caller stops when it crosses ln((1−β)/α) (accept H1) or
    * ln(β/(1−α)) (accept H0). The two ln constants are computed ONCE
    * here from the micro-quantized rates and embedded as ⌊10⁶·c⌋
    * longs, so the whole curve is PURE INTEGER arithmetic — no engine
    * evaluates ln at query time and the walk is bit-identical
    * anywhere (the [[PoissonCdf1]] constant-table device).
    *
    * Plan: one hash agg to days, one window over the bounded day
    * grid.
    *
    * @return (day, n_day, s_day, n_cum, s_cum, llr_q) per day
    */
  def sprtCurve(df: DataFrame, epochMicrosCol: String, outcome: Column,
                p0Q: Long, p1Q: Long): DataFrame = {
    require(p0Q > 0 && p0Q < 1000000 && p1Q > 0 && p1Q < 1000000 &&
      p0Q != p1Q, s"rates p0=$p0Q p1=$p1Q must be distinct in (0, 1e6)")
    val p0 = p0Q.toDouble / 1e6
    val p1 = p1Q.toDouble / 1e6
    val c1 = math.floor(1e6 * math.log(p1 / p0)).toLong
    val c2 = math.floor(1e6 * math.log((1.0 - p1) / (1.0 - p0))).toLong
    val days = df
      .select(expr(s"CAST($epochMicrosCol AS LONG) div 86400000000L")
        .as("day"), when(outcome, 1L).otherwise(0L).as("__y"))
      .na.drop(Seq("day"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_day"), sum(col("__y")).as("s_day"))
    val w = Window.orderBy(col("day").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    days
      .withColumn("n_cum", sum(col("n_day")).over(w))
      .withColumn("s_cum", sum(col("s_day")).over(w))
      .withColumn("llr_q",
        col("s_cum") * lit(c1) + (col("n_cum") - col("s_cum")) * lit(c2))
  }

  /** Live SPRT totals — [[sprtCurve]]'s streaming twin: one global
    * (n, s) aggregate and the integer LLR from the same precomputed
    * constants, legal as a Structured Streaming COMPLETE-mode query
    * (a global aggregate is incrementally maintainable state), so the
    * sequential monitor updates per micro-batch with no reprocessing.
    * Batch/stream parity is structural: the same plan computes both.
    */
  def sprtTotals(df: DataFrame, outcome: Column, p0Q: Long,
                 p1Q: Long): DataFrame = {
    require(p0Q > 0 && p0Q < 1000000 && p1Q > 0 && p1Q < 1000000 &&
      p0Q != p1Q, s"rates p0=$p0Q p1=$p1Q must be distinct in (0, 1e6)")
    val p0 = p0Q.toDouble / 1e6
    val p1 = p1Q.toDouble / 1e6
    val c1 = math.floor(1e6 * math.log(p1 / p0)).toLong
    val c2 = math.floor(1e6 * math.log((1.0 - p1) / (1.0 - p0))).toLong
    df.select(when(outcome, 1L).otherwise(0L).as("__y"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("s"))
      .select(col("n"), col("s"),
        (col("s") * lit(c1) + (col("n") - col("s")) * lit(c2))
          .as("llr_q"))
  }

  /** CUPED variance reduction (Deng et al. 2013): adjust the
    * experiment metric with a pre-period covariate,
    * ŷ = y − θ·(x − x̄), θ = cov(x, y)/var(x) — the industry device
    * that removes between-unit variance an A/B test doesn't care
    * about. θ comes from EXACT pooled moments (Σx, Σy, Σxy, Σx², n in
    * decimal(38,0)):  θ = (n·Σxy − Σx·Σy) / (n·Σx² − Σx²ᵗᵒᵗ), and
    * each arm's adjusted mean is ȳ_a − θ·(x̄_a − x̄) — ONE mirrored
    * fp chain after the exact aggregates. Also reports the variance
    * ratio (1 − ρ²) the adjustment buys.
    *
    * Plan: one hash agg per arm, broadcast pooled scalars.
    *
    * @return one row per arm (variant, n, mean_y_q, mean_adj_q,
    *         theta_q, var_ratio_q)
    */
  def cuped(df: DataFrame, variant: Column, metricCol: String,
            covariateCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val base = df.select(when(variant, "treatment").otherwise("control")
        .as("__v"), col(metricCol).cast("long").as("__y"),
        col(covariateCol).cast("long").as("__x"))
      .na.drop()
    val arms = base.groupBy(col("__v"))
      .agg(count(lit(1)).as("n"), sum(dec(col("__y"))).as("__sy"),
        sum(dec(col("__x"))).as("__sx"))
      .mat
    val pooled = base.agg(count(lit(1)).as("__n"),
      sum(dec(col("__x"))).as("__tsx"), sum(dec(col("__y"))).as("__tsy"),
      sum(dec(col("__x")) * dec(col("__x"))).as("__sxx"),
      sum(dec(col("__x")) * dec(col("__y"))).as("__sxy"),
      sum(dec(col("__y")) * dec(col("__y"))).as("__syy"))
    val d = (c: Column) => c.cast("double")
    val n = d(col("__n"))
    val covN = n * d(col("__sxy")) - d(col("__tsx")) * d(col("__tsy"))
    val varXN = n * d(col("__sxx")) - d(col("__tsx")) * d(col("__tsx"))
    val varYN = n * d(col("__syy")) - d(col("__tsy")) * d(col("__tsy"))
    val theta = covN / varXN
    val rho2 = covN * covN / (varXN * varYN)
    val meanAdj = d(col("__sy")) / d(col("n")) -
      theta * (d(col("__sx")) / d(col("n")) - d(col("__tsx")) / n)
    val okX = col("__n") >= 2 && varXN > lit(0.0)
    arms.crossJoin(broadcast(pooled))
      .select(col("__v").as("variant"), col("n"),
        floor(lit(1000000.0) * (d(col("__sy")) / d(col("n"))))
          .cast("long").as("mean_y_q"),
        when(okX, floor(lit(1000000.0) * meanAdj)
          .cast("long")).as("mean_adj_q"),
        when(okX, floor(lit(1000000.0) * theta)
          .cast("long")).as("theta_q"),
        when(okX && varYN > lit(0.0), floor(lit(1000000.0) *
          (lit(1.0) - rho2)).cast("long")).as("var_ratio_q"))
  }

  /** Difference-in-differences ("did the change CAUSE the lift, or
    * was the cohort already trending") — the two-period, two-group
    * causal baseline: with cell means ȳ over (variant × period),
    *
    *   DiD = (ȳ_t,post − ȳ_t,pre) − (ȳ_c,post − ȳ_c,pre).
    *
    * One scan, four conditional exact (n, Σy) pairs, ONE mirrored fp
    * chain of four divisions and three subtractions. Cell means are
    * also emitted so the parallel-trends eyeball check is possible.
    * Null when any cell is empty (no estimate without all four).
    *
    * @return one row (n_t_pre, n_t_post, n_c_pre, n_c_post,
    *         m_t_pre_q, m_t_post_q, m_c_pre_q, m_c_post_q, did_q)
    */
  def diffInDiff(df: DataFrame, variant: Column, post: Column,
                 metricCol: String): DataFrame = {
    val base = df.select(when(variant, 1L).otherwise(0L).as("__v"),
        when(post, 1L).otherwise(0L).as("__p"),
        col(metricCol).cast("long").as("__y"))
      .na.drop(Seq("__y"))
    def cell(v: Int, p: Int, what: Column) =
      sum(when(col("__v") === v && col("__p") === p, what).otherwise(0L))
    val agg = base.agg(
      cell(1, 0, lit(1L)).as("n_t_pre"), cell(1, 1, lit(1L)).as("n_t_post"),
      cell(0, 0, lit(1L)).as("n_c_pre"), cell(0, 1, lit(1L)).as("n_c_post"),
      cell(1, 0, col("__y")).as("__stp"), cell(1, 1, col("__y")).as("__sto"),
      cell(0, 0, col("__y")).as("__scp"), cell(0, 1, col("__y")).as("__sco"))
    val d = (s: String, n: String) => col(s).cast("double") /
      col(n).cast("double")
    val ok = col("n_t_pre") > 0 && col("n_t_post") > 0 &&
      col("n_c_pre") > 0 && col("n_c_post") > 0
    val q = (c: Column) => floor(lit(1000000.0) * c).cast("long")
    agg.select(col("n_t_pre"), col("n_t_post"), col("n_c_pre"),
      col("n_c_post"),
      when(col("n_t_pre") > 0, q(d("__stp", "n_t_pre"))).as("m_t_pre_q"),
      when(col("n_t_post") > 0, q(d("__sto", "n_t_post"))).as("m_t_post_q"),
      when(col("n_c_pre") > 0, q(d("__scp", "n_c_pre"))).as("m_c_pre_q"),
      when(col("n_c_post") > 0, q(d("__sco", "n_c_post"))).as("m_c_post_q"),
      when(ok, q((d("__sto", "n_t_post") - d("__stp", "n_t_pre")) -
        (d("__sco", "n_c_post") - d("__scp", "n_c_pre")))).as("did_q"))
  }

  /** Cochran–Armitage trend test ("does the success RATE move
    * monotonically with the ordered dose") — the 2×k trend companion
    * to [[chiSquare]]'s unordered association: with integer scores
    * s_i, per-dose trials n_i and successes r_i, R = Σr, N = Σn,
    *
    *   T = Σ s_i·(r_i·N − n_i·R)           (exact — decimal(38,0))
    *   Var = R(N−R)/N · (N·Σs²n − (Σsn)²) / N
    *
    * and z = T/√Var is ONE mirrored fp chain on exact-integer-valued
    * doubles. The dose score IS the bucket index — the caller's
    * bucketing defines the ordering.
    *
    * @return one row (k, n_total, r_total, t_num, z_q)
    */
  def cochranArmitage(df: DataFrame, doseCol: String,
                      outcome: Column): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val cells = df.select(col(doseCol).cast("long").as("__s"),
        when(outcome, 1L).otherwise(0L).as("__y"))
      .na.drop(Seq("__s"))
      .groupBy(col("__s"))
      .agg(count(lit(1)).as("__n"), sum(col("__y")).as("__r"))
    val agg = cells.agg(count(lit(1)).as("k"), sum(col("__n")).as("n_total"),
      sum(col("__r")).as("r_total"),
      sum(dec(col("__s")) * dec(col("__n"))).as("__sn"),
      sum(dec(col("__s")) * dec(col("__s")) * dec(col("__n"))).as("__ssn"),
      sum(dec(col("__s")) * dec(col("__r"))).as("__sr"))
    val d = (c: Column) => c.cast("double")
    // T = Σs·r·N − Σs·n·R (the Σ distributes — exact in decimal)
    val tNum = dec(col("__sr")) * dec(col("n_total")) -
      dec(col("__sn")) * dec(col("r_total"))
    val varT = (d(col("r_total")) *
      (d(col("n_total")) - d(col("r_total"))) / d(col("n_total"))) *
      ((d(col("n_total")) * d(col("__ssn")) -
        d(col("__sn")) * d(col("__sn"))) / d(col("n_total")))
    agg.select(col("k"), col("n_total"), col("r_total"),
      tNum.cast("long").as("t_num"),
      when(col("r_total") > 0 && col("r_total") < col("n_total") &&
          col("k") >= 2,
        floor(lit(1000000.0) * d(tNum.cast("long")) / sqrt(varT))
          .cast("long")).as("z_q"))
  }

  /** Mantel–Haenszel pooled odds ratio across strata ("is exposure
    * associated with outcome AFTER controlling for the stratifying
    * confounder" — the A/B-test answer Simpson's paradox breaks when
    * you pool naively; [[simpson]] DETECTS the reversal, this
    * estimates the deconfounded effect):
    *
    *   OR_MH = Σ_i (a_i·d_i/n_i) / Σ_i (b_i·c_i/n_i)
    *
    * over per-stratum 2×2 tables (a=exposed-positive, b=exposed-
    * negative, c=unexposed-positive, d=unexposed-negative). Each
    * stratum term is ⌊10⁶·x⌋ quantized to a long BEFORE the sums
    * (order-free folds), and the ratio is one exact integer-to-double
    * division. Null when the denominator is 0 (no discordant pairs).
    *
    * Plan: one hash agg to strata (four conditional counts), one
    * scalar agg.
    *
    * @return one row (n_strata, num_q, den_q, or_q)
    */
  def mantelHaenszel(df: DataFrame, stratumCol: String, exposure: Column,
                     outcome: Column): DataFrame = {
    val strata = df
      .select(col(stratumCol).as("__s"),
        when(exposure, 1L).otherwise(0L).as("__e"),
        when(outcome, 1L).otherwise(0L).as("__y"))
      .na.drop(Seq("__s"))
      .groupBy(col("__s"))
      .agg(sum(col("__e") * col("__y")).as("__a"),
        sum(col("__e") * (lit(1L) - col("__y"))).as("__b"),
        sum((lit(1L) - col("__e")) * col("__y")).as("__c"),
        sum((lit(1L) - col("__e")) * (lit(1L) - col("__y"))).as("__d"),
        count(lit(1)).as("__n"))
    strata
      .select(
        // each count casts to double BEFORE the product — a·d as a
        // long would overflow past ~3·10⁹ rows per stratum
        floor(lit(1000000.0) *
          (col("__a").cast("double") * col("__d").cast("double")) /
          col("__n").cast("double")).cast("long").as("__t"),
        floor(lit(1000000.0) *
          (col("__b").cast("double") * col("__c").cast("double")) /
          col("__n").cast("double")).cast("long").as("__u"))
      .agg(count(lit(1)).as("n_strata"), sum(col("__t")).as("num_q"),
        sum(col("__u")).as("den_q"))
      .select(col("n_strata"), col("num_q"), col("den_q"),
        when(col("den_q") > 0,
          floor(lit(1000000.0) * col("num_q").cast("double") /
            col("den_q").cast("double")).cast("long")).as("or_q"))
  }

  /** One-way ANOVA F over k groups ("do the group MEANS differ,
    * relative to within-group spread") — the parametric companion to
    * [[kruskalWallis]], from exact per-group moments (n_j, ΣX as
    * long, ΣX² as long): with t_j = ⌊S_j²/n_j⌋ and g = ⌊S²/N⌋
    * (each ONE mirrored double floor on exact-integer inputs,
    * quantized per group so the cross-group fold is an order-free
    * LONG sum),
    *
    *   ssb = Σt_j − g,   ssw = ΣX² − Σt_j,
    *   F = (ssb/(k−1)) / (ssw/(N−k)).
    *
    * The ⌊·⌋ deviates from the real SS by < k absolute — noise at SS
    * magnitudes — while making the statistic bit-identical on any
    * engine and partitioning. Degenerate guards: F is null when
    * k < 2 or ssw ≤ 0 (all within-group spread consumed).
    *
    * @return one row (k, n_total, ssb_l, ssw_l, f_q)
    */
  def anovaF(df: DataFrame, groupCol: String, xCol: String): DataFrame = {
    val g = df.select(col(groupCol).as("__g"), col(xCol).cast("long").as("__x"))
      .na.drop()
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("__n"), sum(col("__x")).as("__s"),
        sum(col("__x") * col("__x")).as("__q"))
      .withColumn("__t",
        floor(col("__s").cast("double") * col("__s").cast("double") /
          col("__n").cast("double")).cast("long"))
    g.agg(count(lit(1)).as("k"), sum(col("__n")).as("n_total"),
        sum(col("__s")).as("__S"), sum(col("__q")).as("__Q"),
        sum(col("__t")).as("__T"))
      .select(col("k"), col("n_total"),
        (col("__T") - floor(col("__S").cast("double") *
          col("__S").cast("double") / col("n_total").cast("double"))
          .cast("long")).as("ssb_l"),
        (col("__Q") - col("__T")).as("ssw_l"))
      .select(col("k"), col("n_total"), col("ssb_l"), col("ssw_l"),
        when(col("k") >= 2 && col("n_total") > col("k") &&
            col("ssw_l") > 0,
          floor(lit(1000000.0) *
            (col("ssb_l").cast("double") / (col("k") - lit(1L)).cast("double")) /
            (col("ssw_l").cast("double") / (col("n_total") - col("k")).cast("double")))
            .cast("long")).as("f_q"))
  }

  /** Bartlett's test of variance homogeneity across k groups (the
    * parametric spread test [[brownForsythe]] robustifies; Bartlett
    * is the textbook companion when normality is defensible):
    *
    *   χ² = [ (N−k)·ln s_p² − Σ (n_j−1)·ln s_j² ] / C,
    *   C  = 1 + ( Σ 1/(n_j−1) − 1/(N−k) ) / (3(k−1)),
    *
    * with s_j² the unbiased group variance and s_p² the pooled one.
    *
    * Exactness: the group sum-of-squared-deviations is the [[anovaF]]
    * integer device (ssd_j = ΣX² − ⌊S²/n⌋, a long); each variance is
    * ONE long/long double division; ln runs on those exactly-agreed
    * doubles (the standing ln contract) and quantizes ⌊10⁹·⌋ PER
    * GROUP, multiplied by the integer (n_j−1) and folded as an
    * order-free long sum. The reciprocal sum quantizes as the exact
    * integer 10¹² div (n_j−1) per group. One mirrored fp chain builds
    * the final statistic. Groups with n_j < 2 or zero spread
    * (ssd ≤ 0, where ln is undefined) are excluded and reported via
    * k/n_total (the scipy-adjacent convention, documented here as the
    * operator's contract).
    *
    * Plan: one hash agg to per-group moments, one k-row fold.
    *
    * @return one row (k, n_total, pooled_ssd_l, sumlog_term_l,
    *         pooled_term_l, invsum_q, stat_q)
    */
  def bartlett(df: DataFrame, groupCol: String, xCol: String): DataFrame = {
    val g = df.select(col(groupCol).as("__g"), col(xCol).cast("long").as("__x"))
      .na.drop()
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("__n"), sum(col("__x")).as("__s"),
        sum(col("__x") * col("__x")).as("__q"))
      .withColumn("__ssd",
        col("__q") - floor(col("__s").cast("double") *
          col("__s").cast("double") / col("__n").cast("double")).cast("long"))
      .filter(col("__n") >= 2 && col("__ssd") > 0)
      // s_j² = ssd/(n−1): one long/long division; ⌊10⁹·ln⌋ quantized
      // per group, ×(n−1) exact in integers
      .withColumn("__lnq",
        (col("__n") - 1) * floor(lit(1.0e9) *
          log(col("__ssd").cast("double") / (col("__n") - 1).cast("double")))
          .cast("long"))
      // integer div (Spark `/` on longs is DOUBLE division)
      .withColumn("__inv", expr("CAST(1000000000000 AS BIGINT) div (__n - 1)"))
    g.agg(count(lit(1)).as("k"), sum(col("__n")).as("n_total"),
        sum(col("__ssd")).as("pooled_ssd_l"),
        sum(col("__lnq")).as("sumlog_term_l"),
        sum(col("__inv")).as("invsum_q"))
      .select(col("k"), col("n_total"), col("pooled_ssd_l"),
        col("sumlog_term_l"), col("invsum_q"),
        ((col("n_total") - col("k")) * floor(lit(1.0e9) *
          log(col("pooled_ssd_l").cast("double") /
            (col("n_total") - col("k")).cast("double"))).cast("long"))
          .as("pooled_term_l"))
      .select(col("k"), col("n_total"), col("pooled_ssd_l"),
        col("sumlog_term_l"), col("pooled_term_l"), col("invsum_q"),
        when(col("k") >= 2 && col("n_total") > col("k"),
          floor(lit(1000000.0) *
            ((col("pooled_term_l") - col("sumlog_term_l")).cast("double") /
              lit(1.0e9)) /
            (lit(1.0) + (col("invsum_q").cast("double") / lit(1.0e12) -
              lit(1.0) / (col("n_total") - col("k")).cast("double")) /
              (lit(3.0) * (col("k") - lit(1L)).cast("double"))))
            .cast("long")).as("stat_q"))
  }

  /** G-test (log-likelihood-ratio independence test) over a
    * contingency of two categorical columns — [[chiSquare]]'s
    * information-theoretic twin (G = 2N·MI in nats):
    *
    *   G = 2·Σ_cells o·ln(o/e),  e = r·c/N.
    *
    * Exactness: the [[mutualInfo]] kernel exactly — the ln argument is
    * (N·o)/(r·c) with both products in decimal(38,0) before ONE cast
    * to double, the per-cell contribution quantizes ⌊10⁹·o·ln⌋ as a
    * long, and the fold is an order-free long sum; zero cells
    * contribute zero by the o·ln(o) → 0 convention (they never enter
    * the grid). Plan: one corpus scan to the cell grid, marginals
    * broadcast back, one k-cell fold.
    *
    * @return one row (n_cells, n_total, g_sum_q = Σ⌊10⁹·o·ln(o/e)⌋,
    *         g_q = 2·g_sum_q)
    */
  def gTest(df: DataFrame, rowCol: String, colCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val cells = df.select(col(rowCol), col(colCol)).na.drop()
      .groupBy(col(rowCol), col(colCol)).agg(count(lit(1)).as("o"))
      .mat
    val rows = cells.groupBy(col(rowCol)).agg(sum(col("o")).as("__r"))
    val cols = cells.groupBy(col(colCol)).agg(sum(col("o")).as("__c"))
    val tot = cells.agg(sum(col("o")).as("__t"))
    cells
      .join(broadcast(rows), Seq(rowCol))
      .join(broadcast(cols), Seq(colCol))
      .crossJoin(broadcast(tot))
      .select(col("o"), col("__t"),
        floor(lit(1.0e9) * col("o").cast("double") *
          log((dec(col("__t")) * dec(col("o"))).cast("double") /
            (dec(col("__r")) * dec(col("__c"))).cast("double")))
          .cast("long").as("__gq"))
      .agg(count(lit(1)).as("n_cells"), max(col("__t")).as("n_total"),
        sum(col("__gq")).as("g_sum_q"))
      .select(col("n_cells"), col("n_total"), col("g_sum_q"),
        (lit(2L) * col("g_sum_q")).as("g_q"))
  }

  /** Brown–Forsythe robust variance-equality test ("do the groups
    * differ in SPREAD, not location"): [[anovaF]] applied to the
    * absolute deviations |x − median_g| — the median-centered Levene
    * variant that keeps its size under heavy tails. Group medians are
    * the EXACT lower medians (smallest v with 2·cum ≥ n — an integer
    * rule any engine reproduces; no interpolation, no floats), from
    * one per-group window over the DISTINCT-value grid.
    *
    * Plan: one hash agg to the (group, value) grid (the corpus scans
    * once and feeds both the median derivation and — via the grid,
    * not a rescan — the deviation moments), one bounded window, then
    * the anovaF aggregate on grid rows weighted by their counts.
    *
    * @return one row (k, n_total, ssb_l, ssw_l, f_q)
    */
  def brownForsythe(df: DataFrame, groupCol: String,
                    xCol: String): DataFrame = {
    val gv = df.select(col(groupCol).as("__g"), col(xCol).cast("long").as("__v"))
      .na.drop()
      .groupBy(col("__g"), col("__v")).agg(count(lit(1)).as("__c"))
      .mat
    val wCum = Window.partitionBy(col("__g")).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("__g"))
    val med = gv
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__n", sum(col("__c")).over(wAll))
      .filter(lit(2L) * col("__cum") >= col("__n"))
      .groupBy(col("__g")).agg(min(col("__v")).as("__med"))
    // anovaF over |v - med| with grid multiplicities (exact longs)
    val z = gv.join(med, Seq("__g"))
      .select(col("__g"), col("__c"),
        abs(col("__v") - col("__med")).as("__z"))
    val g = z.groupBy(col("__g"))
      .agg(sum(col("__c")).as("__n"), sum(col("__c") * col("__z")).as("__s"),
        sum(col("__c") * col("__z") * col("__z")).as("__q"))
      .withColumn("__t",
        floor(col("__s").cast("double") * col("__s").cast("double") /
          col("__n").cast("double")).cast("long"))
    g.agg(count(lit(1)).as("k"), sum(col("__n")).as("n_total"),
        sum(col("__s")).as("__S"), sum(col("__q")).as("__Q"),
        sum(col("__t")).as("__T"))
      .select(col("k"), col("n_total"),
        (col("__T") - floor(col("__S").cast("double") *
          col("__S").cast("double") / col("n_total").cast("double"))
          .cast("long")).as("ssb_l"),
        (col("__Q") - col("__T")).as("ssw_l"))
      .select(col("k"), col("n_total"), col("ssb_l"), col("ssw_l"),
        when(col("k") >= 2 && col("n_total") > col("k") &&
            col("ssw_l") > 0,
          floor(lit(1000000.0) *
            (col("ssb_l").cast("double") / (col("k") - lit(1L)).cast("double")) /
            (col("ssw_l").cast("double") / (col("n_total") - col("k")).cast("double")))
            .cast("long")).as("f_q"))
  }

  /** λ=1 Poisson CDF thresholds P(K ≤ k), k = 0..8 — the inversion
    * table for [[poissonBootstrap]]'s seeded weights. Computed ONCE
    * here with a fixed summation order; the oracle interpolates the
    * same doubles via their shortest round-trip decimal strings, so
    * no engine ever evaluates exp/factorial at query time.
    */
  val PoissonCdf1: Array[Double] = {
    val e = math.exp(-1.0)
    var fact = 1.0
    var cum = 0.0
    (0 to 8).map { k =>
      if (k > 0) fact = fact * k
      cum = cum + e / fact
      cum
    }.toArray
  }

  /** Poisson bootstrap confidence interval for a per-row metric's
    * mean (Chamandy et al. 2012, the bootstrap that works on streams
    * and shards: each replicate reweights every row by an independent
    * Poisson(1) draw instead of resampling — no global shuffle, no
    * fixed-n resample). Fully DETERMINISTIC: replicate r's weight for
    * a row is the λ=1 inverse CDF (the [[PoissonCdf1]] table, capped
    * at 9) of u = (md5₆₀(id:r:salt)+½)/2⁶⁰ — replayable on any
    * engine, any partitioning, any day.
    *
    * Replicate means are exact integer divisions ((10⁶·Σw·v) div Σw),
    * the point estimate is the unweighted exact mean, and the CI
    * bounds are EXACT order statistics of the `reps` replicate means
    * (indices ⌊0.025·reps⌋+1 and reps−⌊0.025·reps⌋ of the sorted
    * list — the percentile bootstrap, no normality assumed).
    *
    * Plan: one `reps`-way explode (document the ×reps scan cost: for
    * error bars on corpus stats, reps ≤ ~64 — this is the designed
    * trade against a global resample's shuffle), two hash aggs, one
    * window over the reps-row table.
    *
    * @return one row (n, n_reps, est_mean_q, ci_lo_q, ci_hi_q)
    */
  def poissonBootstrap(df: DataFrame, idCol: String, valueCol: String,
                       reps: Int, salt: String): DataFrame = {
    require(reps >= 4 && reps <= 256, s"reps ($reps) must be in [4, 256]")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val base = df.select(col(idCol).cast("string").as("__id"),
        col(valueCol).cast("long").as("__v"))
      .na.drop()
      .mat
    val est = base.agg(count(lit(1)).as("n"),
      expr("(1000000L * CAST(sum(__v) AS decimal(38,0))) div count(1)")
        .cast("long").as("est_mean_q"))
    val u = (Dedup.md5Hash60(concat_ws(":", col("__id"),
      col("__r").cast("string"), lit(salt))).cast("double") + lit(0.5)) /
      lit(math.pow(2, 60))
    val wgt = PoissonCdf1.zipWithIndex.foldRight(lit(9L)) {
      case ((c, k), acc) => when(u < lit(c), lit(k.toLong)).otherwise(acc)
    }
    val repMeans = base
      .select(col("__id"), col("__v"),
        explode(sequence(lit(0), lit(reps - 1))).as("__r"))
      .select(col("__r"), wgt.as("__w"), col("__v"))
      .groupBy(col("__r"))
      .agg(sum(col("__w")).as("__sw"),
        sum(dec(col("__w")) * dec(col("__v"))).as("__swv"))
      .select(col("__r"),
        when(col("__sw") > 0,
          expr("(1000000 * __swv) div CAST(__sw AS decimal(38,0))")
            .cast("long")).as("__m"))
    val loIdx = (reps * 25) / 1000 + 1
    val hiIdx = reps - (reps * 25) / 1000
    val wRank = Window.orderBy(col("__m").asc, col("__r").asc)
    val ci = repMeans
      .withColumn("__rn", row_number().over(wRank))
      .agg(count(lit(1)).as("n_reps"),
        max(when(col("__rn") === loIdx, col("__m"))).as("ci_lo_q"),
        max(when(col("__rn") === hiIdx, col("__m"))).as("ci_hi_q"))
    est.crossJoin(broadcast(ci))
      .select(col("n"), col("n_reps"), col("est_mean_q"),
        col("ci_lo_q"), col("ci_hi_q"))
  }

  /** Poisson-bootstrap confidence interval for the MEDIAN — the
    * robust companion to [[poissonBootstrap]]'s mean CI (corpus
    * length/score distributions are heavy-tailed; the median is the
    * number people should quote, and it needs an error bar too).
    * Same deterministic device: replicate r reweights each row by the
    * seeded Poisson(1) inverse CDF; each replicate's weighted LOWER
    * median is the smallest value v with 2·cumweight(v) ≥ totalweight
    * — an integer rule over the per-replicate value grid, no floats
    * at all until nothing (the estimate is a data value). CI bounds
    * are exact order statistics of the replicate medians.
    *
    * Plan: reps-way explode → (rep, value) hash agg (grid is reps ×
    * distinct values — bounded by value cardinality), per-rep window
    * over the grid, one reps-row window for the percentiles.
    *
    * @return one row (n, n_reps, est_median, ci_lo, ci_hi) — all in
    *         the metric's own units (exact data values)
    */
  def poissonBootstrapMedian(df: DataFrame, idCol: String,
                             valueCol: String, reps: Int,
                             salt: String): DataFrame = {
    require(reps >= 4 && reps <= 256, s"reps ($reps) must be in [4, 256]")
    val base = df.select(col(idCol).cast("string").as("__id"),
        col(valueCol).cast("long").as("__v"))
      .na.drop()
      .mat
    // exact corpus lower median from the value grid
    val grid0 = base.groupBy(col("__v")).agg(count(lit(1)).as("__c"))
    val wCum0 = Window.orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val est = grid0
      .withColumn("__cum", sum(col("__c")).over(wCum0))
      .withColumn("__n", sum(col("__c")).over(
        Window.orderBy(col("__v").asc).rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      .filter(lit(2L) * col("__cum") >= col("__n"))
      .agg(max(col("__n")).as("n"), min(col("__v")).as("est_median"))
    val u = (Dedup.md5Hash60(concat_ws(":", col("__id"),
      col("__r").cast("string"), lit(salt))).cast("double") + lit(0.5)) /
      lit(math.pow(2, 60))
    val wgt = PoissonCdf1.zipWithIndex.foldRight(lit(9L)) {
      case ((c, k), acc) => when(u < lit(c), lit(k.toLong)).otherwise(acc)
    }
    val grid = base
      .select(col("__id"), col("__v"),
        explode(sequence(lit(0), lit(reps - 1))).as("__r"))
      .select(col("__r"), col("__v"), wgt.as("__w"))
      .groupBy(col("__r"), col("__v")).agg(sum(col("__w")).as("__cw"))
    val wCum = Window.partitionBy(col("__r")).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("__r"))
    val repMed = grid
      .withColumn("__cum", sum(col("__cw")).over(wCum))
      .withColumn("__tot", sum(col("__cw")).over(wAll))
      .filter(lit(2L) * col("__cum") >= col("__tot") && col("__tot") > 0)
      .groupBy(col("__r")).agg(min(col("__v")).as("__m"))
    val loIdx = (reps * 25) / 1000 + 1
    val hiIdx = reps - (reps * 25) / 1000
    val wRank = Window.orderBy(col("__m").asc, col("__r").asc)
    val ci = repMed
      .withColumn("__rn", row_number().over(wRank))
      .agg(count(lit(1)).as("n_reps"),
        max(when(col("__rn") === loIdx, col("__m"))).as("ci_lo"),
        max(when(col("__rn") === hiIdx, col("__m"))).as("ci_hi"))
    est.crossJoin(broadcast(ci))
      .select(col("n"), col("n_reps"), col("est_median"),
        col("ci_lo"), col("ci_hi"))
  }

  /** Cramér's V effect size over two categorical columns — the
    * normalized companion to [[chiSquare]] ("HOW strongly are source
    * and language associated", on the engine-exact [0, 1] scale).
    *
    * [[chiSquare]] emits only cells with o ≥ 1, but an ABSENT cell
    * contributes its full expected mass e = r·c/N to χ² — dropping it
    * understates association exactly when association is strongest
    * (a perfect diagonal is ALL absent off-cells). The identity
    * Σ_all e = N recovers that mass without materializing zero cells:
    *
    *   χ²_q = Σ_present contrib_q + (10⁶·N − Σ_present e_q)
    *   v_q  = ⌊10⁶ · √(χ²_q / (10⁶ · N · (min(r,c) − 1)))⌋
    *
    * — integer sums of the per-cell floored quantities (order-free),
    * one final sqrt. A perfect 2×2 diagonal lands v_q = 10⁶ exactly.
    *
    * @return one row (n, n_rows, n_cols, chi2_q, v_q)
    */
  def cramersV(df: DataFrame, rowCol: String, colCol: String): DataFrame =
    chiSquare(df, rowCol, colCol)
      .agg(sum(col("o")).as("n"),
        countDistinct(col(rowCol)).as("n_rows"),
        countDistinct(col(colCol)).as("n_cols"),
        sum(col("contrib_q")).as("__pres_q"),
        sum(col("e_q")).as("__e_q"))
      .select(col("n"), col("n_rows"), col("n_cols"),
        (col("__pres_q") + lit(1000000L) * col("n") - col("__e_q"))
          .as("chi2_q"))
      .select(col("n"), col("n_rows"), col("n_cols"), col("chi2_q"),
        when(least(col("n_rows"), col("n_cols")) >= 2,
          floor(lit(1000000.0) * sqrt(col("chi2_q").cast("double") /
            (lit(1000000.0) * col("n").cast("double") *
              (least(col("n_rows"), col("n_cols")) - lit(1L)).cast("double"))))
            .cast("long")).otherwise(lit(0L)).as("v_q"))

  /** Two-group effect sizes — the "is the difference big enough to
    * matter" numbers that belong next to every significance test
    * (a 100 TB corpus makes EVERYTHING significant; effect size is
    * what survives):
    *
    *   Cohen's d  = (m̄₁ − m̄₂) / s_pooled      (parametric)
    *   Hedges' g  = d · (1 − 3/(4(n₁+n₂) − 9)) (small-sample correction)
    *   Cliff's δ  = 2U/(n₁n₂) − 1              (ordinal, rank-based)
    *
    * Determinism: Cliff's δ is EXACT — the doubled-tie U statistic
    * U₂ = Σ_v cnt₁(v)·(2·cum₂(<v) + cnt₂(v)) is pure integer (value-
    * grid window, the q201 machinery), and
    * δ_q = (10⁶·(U₂ − n₁n₂)) div (n₁n₂). d and g are one mirrored
    * correctly-rounded fp chain over six exact long sums (n, Σx, Σx²
    * per group), floored at 10⁶; NULL when the pooled variance is 0
    * or a group has < 2 rows.
    *
    * Plan: one hash agg for the moments + one value-grid aggregate
    * with a single cumulative window (grid is DISTINCT values, never
    * rows).
    *
    * @param label true = group 1
    * @return one row (n1, n2, u2, cliffs_q, cohen_d_q, hedges_g_q)
    */
  def effectSizes(df: DataFrame, xCol: String, label: Column): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val x = col(xCol).cast("long")
    val g1 = label.cast("boolean")
    val base = df.filter(x.isNotNull)
      .select(x.as("__x"), when(g1, 1L).otherwise(0L).as("__g"))
      .mat
    val grid = base.groupBy(col("__x"))
      .agg(sum(col("__g")).as("__c1"),
        sum(lit(1L) - col("__g")).as("__c2"))
    val wLess = Window.orderBy(col("__x").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val u = grid
      .withColumn("__cum2", coalesce(sum(col("__c2")).over(wLess), lit(0L)))
      .agg(sum(dec(col("__c1")) * dec(lit(2L) * col("__cum2") + col("__c2")))
        .as("__u2"))
    val mom = base.agg(
      sum(col("__g")).as("n1"),
      sum(lit(1L) - col("__g")).as("n2"),
      sum(when(col("__g") === 1, dec(col("__x"))).otherwise(dec(lit(0L))))
        .as("__s1"),
      sum(when(col("__g") === 0, dec(col("__x"))).otherwise(dec(lit(0L))))
        .as("__s2"),
      sum(when(col("__g") === 1, dec(col("__x")) * dec(col("__x")))
        .otherwise(dec(lit(0L)))).as("__q1"),
      sum(when(col("__g") === 0, dec(col("__x")) * dec(col("__x")))
        .otherwise(dec(lit(0L)))).as("__q2"))
    val d = (c: String) => col(c).cast("double")
    val m1 = d("__s1") / d("n1")
    val m2 = d("__s2") / d("n2")
    val ssw = (d("__q1") - d("__s1") * d("__s1") / d("n1")) +
      (d("__q2") - d("__s2") * d("__s2") / d("n2"))
    val pooled = ssw / (d("n1") + d("n2") - lit(2.0))
    val cohen = (m1 - m2) / sqrt(pooled)
    val j = lit(1.0) - lit(3.0) /
      (lit(4.0) * (d("n1") + d("n2")) - lit(9.0))
    mom.crossJoin(broadcast(u))
      // dec38 products: 10⁶·n₁·n₂ wraps int64 past ~3M rows per group.
      // The remaining long bound is the u2 OUTPUT column itself
      // (n₁·n₂ ≤ 9.2e18 pairs ⇔ ~3e9 rows per group).
      .withColumn("u2", col("__u2").cast("long"))
      .select(col("n1"), col("n2"), col("u2"),
        expr("(CAST(1000000 AS DECIMAL(38,0)) * " +
          "(u2 - CAST(n1 AS DECIMAL(38,0)) * n2)) div " +
          "(CAST(n1 AS DECIMAL(38,0)) * n2)").as("cliffs_q"),
        when(col("n1") >= 2 && col("n2") >= 2 && ssw > 0,
          floor(lit(1000000.0) * cohen).cast("long")).as("cohen_d_q"),
        when(col("n1") >= 2 && col("n2") >= 2 && ssw > 0,
          floor(lit(1000000.0) * (cohen * j)).cast("long"))
          .as("hedges_g_q"))
  }

  /** Closed-form OLS with intercept and TWO regressors,
    * y ~ β₀ + β₁x₁ + β₂x₂ — the multiple-regression step up from
    * [[pearson]]/Theil–Sen: solved by Cramer's rule on the 3×3 normal
    * equations, whose determinants are degree-3 POLYNOMIALS IN EXACT
    * INTEGER SUMS (n, Σx₁, Σx₂, Σx₁², Σx₂², Σx₁x₂, Σy, Σx₁y, Σx₂y,
    * Σy²) — computed entirely in Decimal(38,0), so every βᵢ is ONE
    * double division of two exact decimals, ⌊10⁶·detᵢ/det⌋.
    * Exactness bound: triple products of sums must fit 38 digits
    * (|Σ|³ < 10³⁸ — holds to ~10¹² per sum; quantize inputs upstream
    * past that). R² = 1 − SSE/SST is one mirrored fp chain over the
    * unquantized β doubles. NULL β/R² when the design is singular
    * (det = 0) or SST = 0.
    *
    * Plan: ONE hash aggregate over the scan (ten map-side-combined
    * sums), scalar output — the cheapest possible shape; nothing
    * iterative, nothing shuffled beyond one row.
    *
    * @return (n, beta0_q, beta1_q, beta2_q, r2_q)
    */
  def olsFit2(df: DataFrame, yCol: String, x1Col: String,
              x2Col: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val y = dec(col(yCol).cast("long"))
    val x1 = dec(col(x1Col).cast("long"))
    val x2 = dec(col(x2Col).cast("long"))
    val m = df
      .filter(col(yCol).isNotNull && col(x1Col).isNotNull &&
        col(x2Col).isNotNull)
      .agg(count(lit(1)).as("n"),
        sum(x1).as("sx1"), sum(x2).as("sx2"),
        sum(x1 * x1).as("sx11"), sum(x2 * x2).as("sx22"),
        sum(x1 * x2).as("sx12"),
        sum(y).as("sy"), sum(x1 * y).as("sx1y"), sum(x2 * y).as("sx2y"),
        sum(y * y).as("syy"))
    val n = dec(col("n"))
    val det = n * (col("sx11") * col("sx22") - col("sx12") * col("sx12")) -
      col("sx1") * (col("sx1") * col("sx22") - col("sx12") * col("sx2")) +
      col("sx2") * (col("sx1") * col("sx12") - col("sx11") * col("sx2"))
    val det0 =
      col("sy") * (col("sx11") * col("sx22") - col("sx12") * col("sx12")) -
      col("sx1") * (col("sx1y") * col("sx22") - col("sx12") * col("sx2y")) +
      col("sx2") * (col("sx1y") * col("sx12") - col("sx11") * col("sx2y"))
    val det1 =
      n * (col("sx1y") * col("sx22") - col("sx12") * col("sx2y")) -
      col("sy") * (col("sx1") * col("sx22") - col("sx12") * col("sx2")) +
      col("sx2") * (col("sx1") * col("sx2y") - col("sx1y") * col("sx2"))
    val det2 =
      n * (col("sx11") * col("sx2y") - col("sx1y") * col("sx12")) -
      col("sx1") * (col("sx1") * col("sx2y") - col("sx1y") * col("sx2")) +
      col("sy") * (col("sx1") * col("sx12") - col("sx11") * col("sx2"))
    val d = (c: Column) => c.cast("double")
    val b0 = d(det0) / d(det)
    val b1 = d(det1) / d(det)
    val b2 = d(det2) / d(det)
    val sse = d(col("syy")) - b0 * d(col("sy")) - b1 * d(col("sx1y")) -
      b2 * d(col("sx2y"))
    val sst = d(col("syy")) - d(col("sy")) * d(col("sy")) / d(col("n"))
    m.select(col("n"),
      when(det =!= 0, floor(lit(1000000.0) * b0).cast("long"))
        .as("beta0_q"),
      when(det =!= 0, floor(lit(1000000.0) * b1).cast("long"))
        .as("beta1_q"),
      when(det =!= 0, floor(lit(1000000.0) * b2).cast("long"))
        .as("beta2_q"),
      when(det =!= 0 && sst > 0,
        floor(lit(1000000.0) * (lit(1.0) - sse / sst)).cast("long"))
        .as("r2_q"))
  }

  /** Durbin–Watson residual-autocorrelation diagnostic per group: fit
    * the linear trend x ~ a + b·t over the group's bucket series
    * (closed-form simple OLS on exact integer sums), quantize each
    * residual ONCE to a long (⌊10⁶·(x_t − â − b̂·t)⌋), and test the
    * residual stream for serial correlation:
    *
    *   DW = Σ_{t≥2} (e_t − e_{t−1})² / Σ e_t²   ∈ [0, 4], 2 ≈ none
    *
    * — the "is the de-trended series actually noise" check run before
    * trusting any per-group rate model; DW → 0 flags momentum the
    * trend didn't absorb, → 4 flags oscillation. Both DW sums are
    * exact decimal sums of quantized longs, so the statistic is one
    * final double division (fp enters only at the per-row quantize,
    * whose inputs are a literal-identical chain of the two OLS
    * doubles).
    *
    * Plan: one hash agg for the per-group OLS sums, a broadcast-able
    * join back, one per-group lag window, one hash agg. Groups with
    * < 3 buckets or a singular trend emit NULL.
    *
    * @return (group, n, slope_q, dw_q)
    */
  def durbinWatson(buckets: DataFrame, groupCol: String, bucketCol: String,
                   xCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val d = (c: Column) => c.cast("double")
    val ws = Window.partitionBy(col(groupCol)).orderBy(col(bucketCol))
    val staged = buckets
      .select(col(groupCol), col(bucketCol), col(xCol).cast("long").as("__x"))
      .withColumn("__t", row_number().over(ws).cast("long"))
      .mat
    val sums = staged.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"),
        sum(dec(col("__t"))).as("__st"),
        sum(dec(col("__t")) * dec(col("__t"))).as("__stt"),
        sum(dec(col("__x"))).as("__sx"),
        sum(dec(col("__t")) * dec(col("__x"))).as("__stx"))
    val detT = dec(col("__n")) * col("__stt") - col("__st") * col("__st")
    val b1 = d(dec(col("__n")) * col("__stx") - col("__st") * col("__sx")) /
      when(detT > 0, d(detT)).otherwise(lit(1.0))
    val b0 = (d(col("__sx")) - b1 * d(col("__st"))) / d(col("__n"))
    val fitted = sums.select(col(groupCol), col("__n"),
      when(detT > 0, b1).as("__b1"), when(detT > 0, b0).as("__b0"))
    val resid = staged.join(broadcast(fitted), Seq(groupCol))
      .withColumn("__eq",
        floor(lit(1000000.0) *
          (d(col("__x")) - (col("__b0") + col("__b1") * d(col("__t")))))
          .cast("long"))
      .withColumn("__lag", lag(col("__eq"), 1).over(ws))
    resid.groupBy(col(groupCol))
      .agg(max(col("__n")).as("n"),
        max(floor(lit(1000000.0) * col("__b1")).cast("long"))
          .as("slope_q"),
        sum(when(col("__lag").isNotNull,
          dec(col("__eq") - col("__lag")) * dec(col("__eq") - col("__lag")))
          .otherwise(dec(lit(0L)))).as("__num"),
        sum(dec(col("__eq")) * dec(col("__eq"))).as("__den"))
      .select(col(groupCol), col("n"), col("slope_q"),
        when(col("n") >= 3 && col("__den") > 0,
          floor(lit(1000000.0) * d(col("__num")) /
            when(col("__den") > 0, d(col("__den"))).otherwise(lit(1.0)))
            .cast("long"))
          .as("dw_q"))
  }

  /** First-order partial correlation r_ab·z — the correlation between
    * a and b with the confounder z regressed out:
    *
    *   r_ab·z = (r_ab − r_az·r_bz) / √((1 − r_az²)(1 − r_bz²))
    *
    * the "is doc length related to token count beyond what language
    * explains" number; the difference r_ab − r_ab·z is the confound's
    * share. Each pairwise r is one mirrored fp chain over EXACT
    * decimal sums (numerator n·S_ab − S_a·S_b, denominator
    * √(n·S_aa − S_a²)·√(n·S_bb − S_b²) — two IEEE-exact sqrts), and
    * the partial combines the three r doubles in one more mirrored
    * chain; everything quantized ⌊10⁶·⌋ at the end. NULL when any
    * marginal variance is 0 or either |r·z| = 1.
    *
    * Plan: ONE hash aggregate (nine map-side-combined sums), scalar
    * output.
    *
    * @return (n, r_ab_q, r_az_q, r_bz_q, partial_q)
    */
  def partialCorrelation(df: DataFrame, aCol: String, bCol: String,
                         zCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val a = dec(col(aCol).cast("long"))
    val b = dec(col(bCol).cast("long"))
    val z = dec(col(zCol).cast("long"))
    val m = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull &&
        col(zCol).isNotNull)
      .agg(count(lit(1)).as("n"),
        sum(a).as("sa"), sum(b).as("sb"), sum(z).as("sz"),
        sum(a * a).as("saa"), sum(b * b).as("sbb"), sum(z * z).as("szz"),
        sum(a * b).as("sab"), sum(a * z).as("saz"), sum(b * z).as("sbz"))
    val d = (c: Column) => c.cast("double")
    val n = dec(col("n"))
    // ANSI divide-by-zero guard: a degenerate radicand is replaced by 1
    // INSIDE the (hoisted) subexpression — harmless, because every
    // output that could see the substituted value is nulled by `ok` /
    // the denom>0 guard below (values in the admitted region unchanged)
    def safe(c: Column): Column = when(c > 0, d(c)).otherwise(lit(1.0))
    def r(sxy: String, sx: String, sy: String, sxx: String,
          syy: String): Column =
      d(n * col(sxy) - col(sx) * col(sy)) /
        (sqrt(safe(n * col(sxx) - col(sx) * col(sx))) *
          sqrt(safe(n * col(syy) - col(sy) * col(sy))))
    val rab = r("sab", "sa", "sb", "saa", "sbb")
    val raz = r("saz", "sa", "sz", "saa", "szz")
    val rbz = r("sbz", "sb", "sz", "sbb", "szz")
    val varA = n * col("saa") - col("sa") * col("sa")
    val varB = n * col("sbb") - col("sb") * col("sb")
    val varZ = n * col("szz") - col("sz") * col("sz")
    val denom = sqrt(lit(1.0) - raz * raz) * sqrt(lit(1.0) - rbz * rbz)
    val denomSafe = when(denom > 0, denom).otherwise(lit(1.0))
    val ok = varA > 0 && varB > 0 && varZ > 0
    m.select(col("n"),
      when(ok, floor(lit(1000000.0) * rab).cast("long")).as("r_ab_q"),
      when(ok, floor(lit(1000000.0) * raz).cast("long")).as("r_az_q"),
      when(ok, floor(lit(1000000.0) * rbz).cast("long")).as("r_bz_q"),
      when(ok && denom > 0,
        floor(lit(1000000.0) * ((rab - raz * rbz) / denomSafe))
          .cast("long"))
        .as("partial_q"))
  }

  /** Theil's uncertainty coefficient U(X|Y) = I(X;Y)/H(X) — the
    * asymmetric, 0-to-1-normalized association measure ("how much of
    * the source identity does knowing the language remove"), the
    * feature-selection companion to [[mutualInfo]]'s raw cell
    * contributions.
    *
    * Both numerator and denominator are integer sums of per-term
    * quantized contributions (the PSI/q265 pattern):
    *   hx_q = Σ_r ⌊10⁹·(r/N)·ln(N/r)⌋,
    *   mi_q = Σ_cells ⌊10⁹·(o/N)·ln(N·o/(r·c))⌋
    * and u_q = ⌊10⁶·mi_q/hx_q⌋ is one division of the two longs.
    * Zero-entropy X (one category) → NULL.
    *
    * Plan: the chiSquare grid shape — one compute-once cell grid, two
    * marginal aggs, broadcast joins, scalar output.
    */
  def uncertaintyCoefficient(df: DataFrame, rowCol: String,
                             colCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val cells = df.select(col(rowCol), col(colCol)).na.drop()
      .groupBy(col(rowCol), col(colCol)).agg(count(lit(1)).as("o"))
      .mat
    val rows = cells.groupBy(col(rowCol)).agg(sum(col("o")).as("__r"))
      .mat
    val cols = cells.groupBy(col(colCol)).agg(sum(col("o")).as("__c"))
    val tot = rows.agg(sum(col("__r")).as("__t"),
      count(lit(1)).as("n_rows"))
    val hx = rows.crossJoin(broadcast(tot))
      .select(floor(lit(1.0e9) * col("__r").cast("double") *
        log(col("__t").cast("double") / col("__r").cast("double")) /
        col("__t").cast("double")).cast("long").as("__h"))
      .agg(sum(col("__h")).as("hx_q"))
    val mi = cells
      .join(broadcast(rows), Seq(rowCol))
      .join(broadcast(cols), Seq(colCol))
      .crossJoin(broadcast(tot))
      .select(floor(lit(1.0e9) * col("o").cast("double") *
        log((dec(col("__t")) * dec(col("o"))).cast("double") /
          (dec(col("__r")) * dec(col("__c"))).cast("double")) /
        col("__t").cast("double")).cast("long").as("__m"))
      .agg(sum(col("__m")).as("mi_q"))
    tot.crossJoin(broadcast(hx)).crossJoin(broadcast(mi))
      .select(col("__t").cast("long").as("n"), col("n_rows"),
        col("hx_q"), col("mi_q"),
        when(col("hx_q") > 0,
          expr("(1000000L * mi_q) div hx_q")).as("u_q"))
  }

  /** Chapman capture–recapture estimate from two deterministic
    * "samplers" over the same population — the dedup-QA question
    * "how many duplicates exist IN TOTAL, given what two independent
    * detectors each caught":
    *
    *   N̂ = (n₁+1)(n₂+1)/(m+1) − 1
    *   V̂ = (n₁+1)(n₂+1)(n₁−m)(n₂−m) / ((m+1)²(m+2))
    *
    * — both EXACT integer products with one integral division each
    * (the +1 Chapman correction also guarantees m+1 > 0). Plan: one
    * scan, one agg row.
    */
  def chapmanEstimate(df: DataFrame, mark1: Column,
                      mark2: Column): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val m1 = when(mark1, 1L).otherwise(0L)
    val m2 = when(mark2, 1L).otherwise(0L)
    val _ = dec // decimal arithmetic lives in the exprs below
    df.agg(count(lit(1)).as("n_pop"), sum(m1).as("n1"), sum(m2).as("n2"),
        sum(m1 * m2).as("m_both"))
      .select(col("n_pop"), col("n1"), col("n2"), col("m_both"),
        // integral div, NOT decimal '/': '/' rounds HALF_UP, // truncates
        (expr("""(CAST(1000000 AS DECIMAL(38,0)) * (n1 + 1) * (n2 + 1))
                 div (m_both + 1)""") - lit(1000000L)).as("chapman_q"),
        expr("""(CAST(1000000 AS DECIMAL(38,0)) * (n1 + 1) * (n2 + 1)
                 * (n1 - m_both) * (n2 - m_both))
                div (CAST(m_both + 1 AS DECIMAL(38,0)) * (m_both + 1)
                 * (m_both + 2))""").as("var_q"))
  }

  /** Leave-one-group-out jackknife for a RATIO estimator ΣY/ΣX — the
    * influence audit for rate-style metrics (chars-per-token, bytes-
    * per-doc) where [[looInfluence]]'s plain-mean algebra doesn't
    * apply. Per group the full and delete-group ratios are one
    * mirrored fp chain each from exact totals ΣY, ΣX (decimal) and
    * the group's own sums:
    *
    *   R = ΣY/ΣX,   R₋g = (ΣY − y_g)/(ΣX − x_g)
    *   pseudo_g = k·R − (k−1)·R₋g
    *
    * NULL when a group carries the whole X mass. Plan: one keyed hash
    * agg, bounded totals broadcast back.
    */
  def jackknifeRatio(df: DataFrame, groupCol: String, yCol: String,
                     xCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val d = (c: Column) => c.cast("double")
    val g = df.select(col(groupCol), col(yCol).cast("long").as("__y"),
        col(xCol).cast("long").as("__x"))
      .na.drop()
      .groupBy(col(groupCol))
      .agg(sum(dec(col("__y"))).as("__yg"), sum(dec(col("__x"))).as("__xg"))
      .mat
    val tot = g.agg(count(lit(1)).as("__k"), sum(col("__yg")).as("__yt"),
      sum(col("__xg")).as("__xt"))
    val rFull = d(col("__yt")) / d(col("__xt"))
    val rLoo = d(col("__yt") - col("__yg")) / d(col("__xt") - col("__xg"))
    g.crossJoin(broadcast(tot))
      .select(col(groupCol), col("__yg").cast("long").as("y_g"),
        col("__xg").cast("long").as("x_g"),
        when(col("__xt") > 0,
          floor(lit(1000000.0) * rFull).cast("long")).as("r_full_q"),
        when(col("__xt") - col("__xg") > 0,
          floor(lit(1000000.0) * rLoo).cast("long")).as("r_loo_q"),
        when(col("__xt") > 0 && col("__xt") - col("__xg") > 0,
          floor(lit(1000000.0) * (d(col("__k")) * rFull -
            (d(col("__k")) - lit(1.0)) * rLoo)).cast("long"))
          .as("pseudo_q"))
      .orderBy(col(groupCol))
  }

  /** Wilson score interval for a per-group proportion — the CI that
    * behaves at small n and extreme rates (the Wald interval collapses
    * to zero width at p̂ ∈ {0,1}; Wilson doesn't). One mirrored fp
    * chain per group from the exact (x, n):
    *
    *   center = p̂ + z²/2n,  margin = z·√(p̂(1−p̂)/n + z²/4n²)
    *   [lo, hi] = (center ∓ margin) / (1 + z²/n)
    *
    * z is a caller literal (default 1.96) and z² is evaluated as the
    * same product on both engines. Plan: one hash agg, bounded rows.
    */
  def wilsonInterval(df: DataFrame, groupCol: String, success: Column,
                     z: Double = 1.96): DataFrame = {
    val d = (c: Column) => c.cast("double")
    val g = df.select(col(groupCol),
        when(success, 1L).otherwise(0L).as("__s"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col("__s")).as("x"))
    val zc = lit(z)
    val z2 = zc * zc
    val nD = d(col("n"))
    val ph = d(col("x")) / nD
    val center = ph + z2 / (lit(2.0) * nD)
    val margin = zc * sqrt(ph * (lit(1.0) - ph) / nD +
      z2 / (lit(4.0) * nD * nD))
    val den = lit(1.0) + z2 / nD
    g.select(col(groupCol), col("n"), col("x"),
        expr("(CAST(1000000 AS DECIMAL(38,0)) * x) div n").as("p_q"),
        floor(lit(1000000.0) * (center - margin) / den).cast("long")
          .as("lo_q"),
        floor(lit(1000000.0) * (center + margin) / den).cast("long")
          .as("hi_q"))
      .orderBy(col(groupCol))
  }

  /** Empirical-Bayes (beta-binomial, method of moments) shrinkage of
    * per-group rates toward the cross-group prior — the "smoothed
    * source quality rate" every per-shard dashboard needs once small
    * shards start winning leaderboards on 3 observations. Rates
    * quantize FIRST (p_q = (10⁹·x) div n, exact), so the cross-group
    * moment sums are integers; the prior strength
    *
    *   ν = p̄(1−p̄)/var(p) − 1,   α = p̄·ν,   β = (1−p̄)·ν
    *
    * and each group's posterior mean (x + α)/(n + ν) are one mirrored
    * fp chain. NULL shrunk rates when the between-group variance is
    * degenerate or ν ≤ 0 (prior stronger than the data supports the
    * other way). Plan: one hash agg to groups, one bounded moment agg
    * broadcast back.
    */
  def ebShrinkage(df: DataFrame, groupCol: String,
                  success: Column): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val d = (c: Column) => c.cast("double")
    val g = df.select(col(groupCol),
        when(success, 1L).otherwise(0L).as("__s"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col("__s")).as("x"))
      // dec38: 10⁹·x wraps int64 for a group with >9.2e9 successes
      .withColumn("__pq",
        expr("(CAST(1000000000 AS DECIMAL(38,0)) * x) div n"))
      .mat
    val mom = g.agg(count(lit(1)).as("__k"),
      sum(dec(col("__pq"))).as("__m"),
      sum(dec(col("__pq")) * dec(col("__pq"))).as("__mm"))
    val kD = d(col("__k"))
    val pbar = d(col("__m")) / (kD * lit(1.0e9))
    val varp = (kD * d(col("__mm")) - d(col("__m")) * d(col("__m"))) /
      (kD * kD * lit(1.0e18))
    val nu = pbar * (lit(1.0) - pbar) / varp - lit(1.0)
    g.crossJoin(broadcast(mom))
      .select(col(groupCol), col("n"), col("x"),
        expr("(CAST(1000000 AS DECIMAL(38,0)) * x) div n").as("raw_q"),
        when(varp > 0 && nu > 0,
          floor(lit(1000000.0) * (d(col("x")) + pbar * nu) /
            (d(col("n")) + nu)).cast("long")).as("shrunk_q"))
      .orderBy(col(groupCol))
  }

  /** Mood's median test — k-group location comparison by counting
    * each group's mass strictly above the GRAND lower median: the
    * coarse-but-assumption-free sibling of [[kruskalWallis]] (only
    * the sign of each value relative to M matters, so one corrupt
    * tail can't move it). The median is the exact integer-rank rule
    * (smallest v with cum ≥ (N+1) div 2) on the value grid; per-group
    * 2×1 chi-square contributions quantize ⌊10⁹·(o−e)²/e⌋ with e from
    * exact integer products — summing the bounded per-group rows
    * gives the test statistic with k−1 df.
    *
    * Plan: one scan to the (group, value) grid; the global median
    * derives from the VALUE-grid window (value-cardinality-bounded);
    * per-group counts are a second bounded agg.
    */
  def moodMedian(df: DataFrame, groupCol: String, xCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val d = (c: Column) => c.cast("double")
    val gv = df.select(col(groupCol), col(xCol).cast("long").as("__v"))
      .na.drop()
      .groupBy(col(groupCol), col("__v")).agg(count(lit(1)).as("__c"))
      .mat
    val vals = gv.groupBy(col("__v")).agg(sum(col("__c")).as("__cv"))
    val tot = vals.agg(sum(col("__cv")).as("__n"))
    val med = vals.crossJoin(broadcast(tot))
      .withColumn("__cum", sum(col("__cv")).over(
        Window.orderBy(col("__v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("__cum") >= expr("(__n + 1) div 2"))
      .orderBy(col("__v")).limit(1)
      .select(col("__v").as("__m"), col("__n"))
    val grp = gv.crossJoin(broadcast(med))
      .groupBy(col(groupCol), col("__m"), col("__n"))
      .agg(sum(col("__c")).as("n_g"),
        sum(when(col("__v") > col("__m"), col("__c")).otherwise(lit(0L)))
          .as("n_above"))
    val above = grp.agg(sum(col("n_above")).as("__A"))
    grp.crossJoin(broadcast(above))
      .withColumn("__ea",
        (dec(col("n_g")) * dec(col("__A"))).cast("double") / d(col("__n")))
      .withColumn("__eb",
        (dec(col("n_g")) * dec(col("__n") - col("__A"))).cast("double") /
          d(col("__n")))
      .select(col(groupCol), col("__m").as("grand_median"), col("n_g"),
        col("n_above"),
        when(col("__ea") > 0, floor(lit(1.0e9) *
          (d(col("n_above")) - col("__ea")) *
          (d(col("n_above")) - col("__ea")) / col("__ea")).cast("long"))
          .as("cell_above_q"),
        when(col("__eb") > 0, floor(lit(1.0e9) *
          (d(col("n_g") - col("n_above")) - col("__eb")) *
          (d(col("n_g") - col("n_above")) - col("__eb")) / col("__eb"))
          .cast("long")).as("cell_below_q"))
      .orderBy(col(groupCol))
  }

  /** Kendall's W coefficient of concordance — "how much do the b
    * blocks agree on the ranking of the k treatments", the effect
    * size behind [[friedman]]'s test (same doubled-midrank grid, a
    * different normalization, WITH the tie correction Friedman's χ²
    * folds away). With doubled rank sums R2_j and d_j = R2_j −
    * b(k+1) (exact integers — 2× the centered rank sum):
    *
    *   W = 3·Σd_j² / (b²·k·(k²−1) − b·ΣT),   T = Σ_ties (t³−t)
    *
    * where ΣT accumulates per grid row as (t²−1) (each member of a
    * t-tie contributes t²−1, summing to t³−t per tie group) — all
    * decimal(38,0) exact; one integral division to the 10⁶ grid.
    * Plan: [[friedman]]'s grid + two bounded aggregates.
    */
  def kendallW(df: DataFrame, blockCol: String, treatCol: String,
               valueCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val cells = df.select(col(blockCol).as("__b"), col(treatCol).as("__t"),
        col(valueCol).cast("long").as("__x"))
      .na.drop()
      .groupBy(col("__b"), col("__t")).agg(sum(col("__x")).as("__x"))
      .mat
    val grid = cells.select("__b").distinct()
      .crossJoin(broadcast(cells.select("__t").distinct()))
      .join(cells, Seq("__b", "__t"), "left")
      .na.fill(0L, Seq("__x"))
      .mat
    val wRank = Window.partitionBy(col("__b")).orderBy(col("__x"))
    val wTie = Window.partitionBy(col("__b"), col("__x"))
    val ranked = grid
      .withColumn("__tc", count(lit(1)).over(wTie))
      .withColumn("__r2",
        lit(2L) * rank().over(wRank) + col("__tc") - lit(1L))
    val ties = ranked
      .agg(sum(dec(col("__tc")) * col("__tc") - lit(1)).as("__tsum"))
    val b = cells.select("__b").distinct().agg(count(lit(1)).as("n_blocks"))
    val k = cells.select("__t").distinct().agg(count(lit(1)).as("k"))
    val d2 = ranked.groupBy(col("__t")).agg(sum(col("__r2")).as("__rs"))
      .crossJoin(broadcast(b)).crossJoin(broadcast(k))
      .select((dec(col("__rs")) -
        dec(col("n_blocks")) * (col("k") + lit(1L))).as("__d"),
        col("n_blocks"), col("k"))
      .groupBy(col("n_blocks"), col("k"))
      .agg(sum(col("__d") * col("__d")).as("__d2"))
    d2.crossJoin(broadcast(ties))
      .select(col("n_blocks"), col("k"),
        col("__d2").cast("long").as("sum_d2"),
        col("__tsum").cast("long").as("tie_mass"))
      .withColumn("__den",
        expr("""CAST(n_blocks AS DECIMAL(38,0)) * n_blocks * k
                * (CAST(k AS DECIMAL(38,0)) * k - 1)
                - CAST(n_blocks AS DECIMAL(38,0)) * tie_mass"""))
      .select(col("n_blocks"), col("k"), col("sum_d2"), col("tie_mass"),
        when(col("__den") > 0,
          expr("""(CAST(3000000 AS DECIMAL(38,0)) * sum_d2)
                  div __den""")).as("w_q"))
  }

  /** Partial autocorrelation at lags 1 and 2 via the closed
    * Durbin–Levinson step on [[acf]]'s quantized correlations:
    * φ₁₁ = ρ₁ and
    *
    *   φ₂₂ = (ρ₂ − ρ₁²) / (1 − ρ₁²)
    *
    * — "is the lag-2 dependence real or just lag-1 echoed twice", the
    * AR-order diagnostic. Inputs are the 10⁻⁶-grid ρ_q (exact longs),
    * so the one fp chain per group starts from exactly-agreed
    * doubles; NULL when either ρ is undefined or |ρ₁| = 1. Plan:
    * [[acf]] (materialized once) + one bounded self-join.
    */
  def pacf2(buckets: DataFrame, groupCol: String, bucketCol: String,
            xCol: String, stepSec: Long): DataFrame = {
    val a = acf(buckets, groupCol, bucketCol, xCol, stepSec, maxLag = 2)
      .mat
    val l1 = a.filter(col("lag") === 1)
      .select(col(groupCol), col("acf_q").as("rho1_q"))
    val l2 = a.filter(col("lag") === 2)
      .select(col(groupCol), col("acf_q").as("rho2_q"))
    val r1 = col("rho1_q").cast("double") / lit(1000000.0)
    val r2 = col("rho2_q").cast("double") / lit(1000000.0)
    l1.join(l2, Seq(groupCol))
      .select(col(groupCol), col("rho1_q"), col("rho2_q"),
        when(col("rho1_q").isNotNull && col("rho2_q").isNotNull &&
            (lit(1.0) - r1 * r1) > 0,
          floor(lit(1000000.0) * (r2 - r1 * r1) / (lit(1.0) - r1 * r1))
            .cast("long")).as("phi22_q"))
      .orderBy(col(groupCol))
  }

  /** V-measure (homogeneity / completeness / their harmonic mean)
    * between a clustering and reference labels — the entropy-based
    * external cluster validity that, unlike ARI (q233), separates
    * "each cluster is one label" from "each label is one cluster".
    * With H(C|K) = H(C) − I the whole triple reduces to three
    * integer-quantized entropy sums (the [[uncertaintyCoefficient]]
    * kernel, ⌊10⁹·.⌋ per term), C = labels, K = clusters:
    *
    *   h = I/H(C),  c = I/H(K),  v = 2I/(H(C)+H(K))
    *
    * — three exact integer divisions, no fresh fp. Degenerate sides
    * follow the standard convention (Rosenberg & Hirschberg; sklearn):
    * H(C) = 0 ⇒ homogeneity 1, H(K) = 0 ⇒ completeness 1, both 0 ⇒
    * v = 1 — a single-cluster partition scores completeness 1 and
    * homogeneity 0, not NULL. Plan: one scan to the (cluster, label)
    * grid; marginals broadcast.
    */
  def vMeasure(df: DataFrame, clusterCol: String,
               labelCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val cells = df.select(col(clusterCol), col(labelCol)).na.drop()
      .groupBy(col(clusterCol), col(labelCol)).agg(count(lit(1)).as("o"))
      .mat
    val rows = cells.groupBy(col(clusterCol)).agg(sum(col("o")).as("__r"))
      .mat
    val cols = cells.groupBy(col(labelCol)).agg(sum(col("o")).as("__c"))
      .mat
    val tot = rows.agg(sum(col("__r")).as("__t"))
    def entropyQ(m: DataFrame, cnt: String, as: String) =
      m.crossJoin(broadcast(tot))
        .select(floor(lit(1.0e9) * col(cnt).cast("double") *
          log(col("__t").cast("double") / col(cnt).cast("double")) /
          col("__t").cast("double")).cast("long").as("__e"))
        .agg(sum(col("__e")).as(as))
    val hc = entropyQ(rows, "__r", "hc_q")
    val hk = entropyQ(cols, "__c", "hk_q")
    val mi = cells
      .join(broadcast(rows), Seq(clusterCol))
      .join(broadcast(cols), Seq(labelCol))
      .crossJoin(broadcast(tot))
      .select(floor(lit(1.0e9) * col("o").cast("double") *
        log((dec(col("__t")) * dec(col("o"))).cast("double") /
          (dec(col("__r")) * dec(col("__c"))).cast("double")) /
        col("__t").cast("double")).cast("long").as("__m"))
      .agg(sum(col("__m")).as("mi_q"))
    tot.crossJoin(broadcast(hc)).crossJoin(broadcast(hk))
      .crossJoin(broadcast(mi))
      .select(col("__t").cast("long").as("n"), col("hc_q"), col("hk_q"),
        col("mi_q"),
        when(col("hk_q") === 0, lit(1000000L))
          .when(col("hk_q") > 0, expr("(1000000L * mi_q) div hk_q"))
          .as("homogeneity_q"),
        when(col("hc_q") === 0, lit(1000000L))
          .when(col("hc_q") > 0, expr("(1000000L * mi_q) div hc_q"))
          .as("completeness_q"),
        when(col("hc_q") + col("hk_q") === 0, lit(1000000L))
          .when(col("hc_q") + col("hk_q") > 0,
            expr("(2000000L * mi_q) div (hc_q + hk_q)")).as("v_q"))
  }

  /** One-way random-effects intraclass correlation ICC(1) — "how much
    * of the variance is BETWEEN groups", the reliability companion to
    * [[anovaF]] (same decomposition, different ratio):
    *
    *   ICC = (MSB − MSW) / (MSB + (n₀−1)·MSW)
    *   n₀  = (N − Σn_g²/N) / (k−1)      (unbalanced-design size)
    *
    * Per-group fp terms are quantized BEFORE the cross-group sum
    * (T_g_q = ⌊10⁶·s_g²/n_g⌋, one division on exact inputs), so the
    * between-group sum is an integer and partition order can't
    * perturb it — the same discipline as every entropy gate. The
    * final ratio is one mirrored fp chain; NULL when k < 2, N ≤ k or
    * the denominator degenerates. Plan: one hash agg to group
    * moments, one bounded agg.
    */
  def iccOneWay(df: DataFrame, groupCol: String, xCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val d = (c: Column) => c.cast("double")
    val g = df.select(col(groupCol), col(xCol).cast("long").as("__x"))
      .na.drop()
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"), sum(dec(col("__x"))).as("__s"),
        sum(dec(col("__x")) * dec(col("__x"))).as("__q"))
      .select(col("__n"), col("__s"), col("__q"),
        floor(lit(1000000.0) * d(col("__s")) * d(col("__s")) /
          d(col("__n"))).cast("long").as("__tq"))
    val a = g.agg(count(lit(1)).as("k"), sum(col("__n")).as("n_total"),
      sum(col("__s")).as("__S"), sum(col("__q")).as("__Q"),
      sum(col("__tq")).as("__T6"),
      sum(dec(col("__n")) * dec(col("__n"))).as("__nn"))
    val ssb = (col("__T6") - floor(lit(1000000.0) * d(col("__S")) *
      d(col("__S")) / d(col("n_total"))).cast("long")).as("ssb_q6")
    val ssw = (dec(lit(1000000L)) * col("__Q") - dec(col("__T6")))
      .cast("decimal(38,0)").as("__ssw6")
    a.select(col("k"), col("n_total"), ssb, ssw, col("__nn"))
      .select(col("k"), col("n_total"), col("ssb_q6"),
        col("__ssw6").cast("long").as("ssw_q6"), col("__nn"))
      .withColumn("__ok", col("k") >= 2 && col("n_total") > col("k"))
      .withColumn("n0_q",
        when(col("__ok"), floor(lit(1000000.0) *
          (d(col("n_total")) - d(col("__nn")) / d(col("n_total"))) /
          (col("k") - lit(1L)).cast("double")).cast("long")))
      .withColumn("icc_q", {
        val msb = d(col("ssb_q6")) / lit(1000000.0) /
          (col("k") - lit(1L)).cast("double")
        val msw = d(col("ssw_q6")) / lit(1000000.0) /
          (col("n_total") - col("k")).cast("double")
        val n0 = (d(col("n_total")) - d(col("__nn")) / d(col("n_total"))) /
          (col("k") - lit(1L)).cast("double")
        when(col("__ok") &&
            (msb + (n0 - lit(1.0)) * msw) > 0,
          floor(lit(1000000.0) * (msb - msw) /
            (msb + (n0 - lit(1.0)) * msw)).cast("long"))
      })
      .drop("__ok", "__nn")
  }

  /** Randomization test for a two-group mean difference — the
    * finite-sample p-value that needs NO normality assumption. Labels
    * are re-assigned `reps` times by the engine-portable md5₆₀ draw
    * (u = md5₆₀(id:rep) mod 10⁶ < ⌊10⁶·n₁/n⌋ — binomial re-allocation
    * matched to the observed group rate; the draw is pure scan-stage
    * expression, identical on any engine), the observed and resampled
    * statistics share one quantized fp chain
    * t_q = ⌊10⁶·(s₁/n₁ − s₀/n₀)⌋, and
    *
    *   p_q = ⌊10⁶·(1 + #{|t_r| ≥ |t_obs|}) / (n_valid + 1)⌋
    *
    * (the add-one keeps p > 0, the standard Monte-Carlo correction;
    * degenerate reps with an empty side are excluded from both counts
    * — identically on both engines, since the draw is shared).
    *
    * Plan: one scan for the observed row, one reps-fan-out
    * (rows×reps) into a single reps-keyed hash agg — map-side
    * combine does the heavy lifting; no window, no driver loop.
    */
  def randomizationTest(df: DataFrame, idCol: String, xCol: String,
                        label: Column, reps: Int): DataFrame = {
    require(reps >= 1 && reps <= 10000, s"reps ($reps) out of range")
    val d = (c: Column) => c.cast("double")
    val base = df.select(col(idCol).cast("string").as("__id"),
        col(xCol).cast("long").as("__x"),
        when(label, 1L).otherwise(0L).as("__g"))
      .na.drop(Seq("__id", "__x"))
      .mat
    def tQ(s1: Column, n1: Column, s0: Column, n0: Column): Column =
      floor(lit(1000000.0) * (d(s1) / d(n1) - d(s0) / d(n0))).cast("long")
    val obs = base.agg(count(lit(1)).as("__n"), sum(col("__g")).as("__n1"),
        sum(col("__g") * col("__x")).as("__s1"),
        sum((lit(1L) - col("__g")) * col("__x")).as("__s0"))
      .select(col("__n"), col("__n1"),
        expr("(1000000L * __n1) div __n").as("__thr"),
        tQ(col("__s1"), col("__n1"), col("__s0"),
          col("__n") - col("__n1")).as("__tobs"))
    val assigned = base.crossJoin(broadcast(obs))
      .select(col("__n"), col("__n1"), col("__thr"), col("__tobs"),
        col("__x"),
        explode(sequence(lit(0), lit(reps - 1))).as("__r"), col("__id"))
      .withColumn("__a",
        when(Dedup.md5Hash60(concat(col("__id"), lit(":"),
          col("__r").cast("string"))) % 1000000L < col("__thr"), 1L)
          .otherwise(0L))
    val perRep = assigned.groupBy(col("__r"))
      .agg(first(col("__n")).as("__n"), first(col("__n1")).as("__on1"),
        first(col("__tobs")).as("__tobs"),
        sum(col("__a")).as("__rn1"), sum(col("__a") * col("__x")).as("__rs1"),
        sum((lit(1L) - col("__a")) * col("__x")).as("__rs0"))
      .withColumn("__valid",
        (col("__rn1") > 0 && col("__rn1") < col("__n")).cast("long"))
      .withColumn("__t",
        when(col("__valid") === 1,
          tQ(col("__rs1"), col("__rn1"), col("__rs0"),
            col("__n") - col("__rn1"))))
    perRep.groupBy(col("__n").as("n"), col("__on1").as("n1"),
        col("__tobs").as("t_obs_q"))
      .agg(sum(col("__valid")).as("n_valid"),
        coalesce(sum(when(abs(col("__t")) >= abs(col("__tobs")), 1L)
          .otherwise(0L)), lit(0L)).as("n_extreme"))
      .select(col("n"), col("n1"), col("t_obs_q"), col("n_valid"),
        col("n_extreme"),
        expr("(1000000L * (1 + n_extreme)) div (n_valid + 1)").as("p_q"))
  }

  /** Distance correlation (Székely's dCor) between two integer
    * columns, on a deterministic md5-ordered sample of `cap` rows —
    * the dependence measure that catches NONLINEAR relationships
    * Pearson/Spearman miss (dCor = 0 ⟺ independence, on the sample).
    * The double-centering is kept EXACT by scaling through n²:
    *
    *   α_jk = n²·d_jk − n·r_j − n·r_k + g     (all integers)
    *
    * (distance matrices are symmetric so row sums ≡ column sums);
    * then dCor² = Σαβ / √(Σα²·Σβ²) with the n⁶ scale cancelling. The
    * three product sums are decimal(38,0)-exact; one mirrored
    * fp chain (two casts, sqrt, divide) produces ⌊10⁶·dCor²⌋.
    *
    * The O(cap²) pair fan-out is the ESTIMATOR'S contract (same
    * stance as the bootstrap gates q261/q275): cap is fixed, so cost
    * is corpus-size-INDEPENDENT — the corpus only feeds the
    * md5-ordered top-cap sample (a TakeOrdered, no global sort).
    */
  def distanceCorrelation(df: DataFrame, idCol: String, xCol: String,
                          yCol: String, cap: Int): DataFrame = {
    require(cap >= 2 && cap <= 4096, s"cap ($cap) must be in [2, 4096]")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val d = (c: Column) => c.cast("double")
    val s = df.select(col(idCol).as("__id"), col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y"))
      .na.drop()
      .orderBy(Dedup.md5Hash60(col("__id").cast("string")), col("__id"))
      .limit(cap)
      .mat
    val b = s.select(col("__id").as("__jb"), col("__x").as("__xb"),
      col("__y").as("__yb"))
    val pairs = s.crossJoin(b)
      .select(col("__id").as("__ja"), col("__jb"),
        abs(col("__x") - col("__xb")).as("__da"),
        abs(col("__y") - col("__yb")).as("__db"))
      .mat
    val rs = pairs.groupBy(col("__ja").as("__j"))
      .agg(sum(col("__da")).as("__rx"), sum(col("__db")).as("__ry"))
      .mat
    val g = rs.agg(count(lit(1)).as("__n"), sum(col("__rx")).as("__gx"),
      sum(col("__ry")).as("__gy"))
    val alpha = dec(col("__n")) * dec(col("__n")) * dec(col("__da")) -
      dec(col("__n")) * dec(col("__rxa")) -
      dec(col("__n")) * dec(col("__rxb")) + dec(col("__gx"))
    val beta = dec(col("__n")) * dec(col("__n")) * dec(col("__db")) -
      dec(col("__n")) * dec(col("__rya")) -
      dec(col("__n")) * dec(col("__ryb")) + dec(col("__gy"))
    pairs
      .join(broadcast(rs.select(col("__j").as("__ja"),
        col("__rx").as("__rxa"), col("__ry").as("__rya"))), Seq("__ja"))
      .join(broadcast(rs.select(col("__j").as("__jb"),
        col("__rx").as("__rxb"), col("__ry").as("__ryb"))), Seq("__jb"))
      .crossJoin(broadcast(g))
      .select(col("__n"), alpha.as("__al"), beta.as("__be"))
      .groupBy(col("__n"))
      .agg(sum(col("__al") * col("__be")).as("__sab"),
        sum(col("__al") * col("__al")).as("__saa"),
        sum(col("__be") * col("__be")).as("__sbb"))
      .select(col("__n").as("n"),
        when(col("__saa") > 0 && col("__sbb") > 0,
          floor(lit(1000000.0) * d(col("__sab")) /
            sqrt(d(col("__saa")) * d(col("__sbb")))).cast("long"))
          .as("dcor2_q"))
  }

  /** Goodman–Kruskal gamma and Somers' D between two ordinal (integer
    * bucket) expressions — the ordinal-association companions to
    * [[kendallTau]]: gamma discards every tied pair; Somers' D keeps
    * pairs tied only on the "dependent" axis in its denominator (the
    * direction-asymmetric variant used for rank-score diagnostics).
    *
    * Concordant/discordant pair masses come from the bucket GRID, not
    * the row set: C = Σ o_ij·o_kl over cell pairs with k>i, l>j (each
    * unordered row pair lands in exactly one ordered cell pair), so
    * the grid self-join is bucket-cardinality²-bounded — never
    * row-scale — and the right side broadcasts. Tie masses are
    * closed-form from the marginals (Σr(r−1) = doubled pairs tied on
    * an axis; doubled throughout so no /2 leaves integers). All sums
    * are exact decimal(38,0); the gate surface casts to long (safe to
    * ~10⁹ rows — past that read the decimals) and the three ratios
    * are quantized integer divisions (both engines truncate toward
    * zero, verified for negative numerators):
    *
    *   gamma_q  = (10⁶·(C−D)) div (C+D)
    *   sdyx_q   = (2·10⁶·(C−D)) div (n(n−1) − Σr_x(r_x−1))
    *   sdxy_q   = (2·10⁶·(C−D)) div (n(n−1) − Σr_y(r_y−1))
    */
  def ordinalAssociation(df: DataFrame, xOrd: Column,
                         yOrd: Column): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val cells = df.select(xOrd.cast("long").as("__x"),
        yOrd.cast("long").as("__y"))
      .na.drop()
      .groupBy(col("__x"), col("__y")).agg(count(lit(1)).as("o"))
      .mat
    val b = cells.select(col("__x").as("__bx"), col("__y").as("__by"),
      col("o").as("__bo"))
    val cd = cells.join(broadcast(b), col("__bx") > col("__x"))
      .agg(
        coalesce(sum(when(col("__by") > col("__y"),
          dec(col("o")) * dec(col("__bo")))), dec(lit(0)))
          .as("__cc"),
        coalesce(sum(when(col("__by") < col("__y"),
          dec(col("o")) * dec(col("__bo")))), dec(lit(0)))
          .as("__dd"))
    val xm = cells.groupBy(col("__x")).agg(sum(col("o")).as("__r"))
      .agg(sum(dec(col("__r")) * (dec(col("__r")) - lit(1))).as("__tx2"))
    val ym = cells.groupBy(col("__y")).agg(sum(col("o")).as("__c"))
      .agg(sum(dec(col("__c")) * (dec(col("__c")) - lit(1))).as("__ty2"))
    val tot = cells.agg(sum(col("o")).as("__n"))
    tot.crossJoin(broadcast(cd)).crossJoin(broadcast(xm))
      .crossJoin(broadcast(ym))
      .select(col("__n").cast("long").as("n"),
        col("__cc").cast("long").as("c_pairs"),
        col("__dd").cast("long").as("d_pairs"),
        (dec(col("__n")) * (dec(col("__n")) - lit(1)) - col("__tx2"))
          .cast("long").as("__ux2"),
        (dec(col("__n")) * (dec(col("__n")) - lit(1)) - col("__ty2"))
          .cast("long").as("__uy2"))
      .select(col("n"), col("c_pairs"), col("d_pairs"),
        // dec38: pair counts are O(n²) — 10⁶·(c−d) wraps int64 already
        // at ~4e6 rows
        when(col("c_pairs") + col("d_pairs") > 0,
          expr("(CAST(1000000 AS DECIMAL(38,0)) * (c_pairs - d_pairs)) " +
            "div (c_pairs + d_pairs)")).as("gamma_q"),
        when(col("__ux2") > 0,
          expr("(CAST(2000000 AS DECIMAL(38,0)) * (c_pairs - d_pairs)) " +
            "div __ux2")).as("sdyx_q"),
        when(col("__uy2") > 0,
          expr("(CAST(2000000 AS DECIMAL(38,0)) * (c_pairs - d_pairs)) " +
            "div __uy2")).as("sdxy_q"))
  }

  /** Jarque–Bera normality diagnostic per group, from exact raw-moment
    * sums: Σx…Σx⁴ accumulate as decimal(38,0) (x⁴ overflows long at
    * corpus scale), then ONE mirrored fp chain per group derives the
    * central moments, skewness, excess-kurtosis and
    *
    *   JB = n/6 · (S² + (K−3)²/4)
    *
    * with every operand in a fixed order (the same parse tree the
    * oracle writes), quantized ⌊10⁶·.⌋. Guarded: groups need n ≥ 2 and
    * non-degenerate variance or the three stats are NULL. Plan: one
    * scan, one hash agg — the moment sums are the only shuffled state.
    */
  def jarqueBera(df: DataFrame, groupCol: String, xCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val x = dec(col("__x"))
    val d = (c: Column) => c.cast("double")
    val g = df.select(col(groupCol), col(xCol).cast("long").as("__x"))
      .na.drop()
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(x).as("__s1"),
        sum(x * x).as("__s2"), sum(x * x * x).as("__s3"),
        sum(x * x * x * x).as("__s4"))
    val nD = d(col("n"))
    val mu = d(col("__s1")) / nD
    val m2 = d(col("__s2")) / nD - mu * mu
    val m3 = d(col("__s3")) / nD - lit(3.0) * mu * (d(col("__s2")) / nD) +
      lit(2.0) * mu * mu * mu
    val m4 = d(col("__s4")) / nD - lit(4.0) * mu * (d(col("__s3")) / nD) +
      lit(6.0) * mu * mu * (d(col("__s2")) / nD) -
      lit(3.0) * mu * mu * mu * mu
    val skew = m3 / (m2 * sqrt(m2))
    val kurt = m4 / (m2 * m2)
    val ok = col("n") >= 2 && m2 > 0
    g.select(col(groupCol), col("n"),
        floor(lit(1000000.0) * mu).cast("long").as("mean_q"),
        when(ok, floor(lit(1000000.0) * skew).cast("long")).as("skew_q"),
        when(ok, floor(lit(1000000.0) * kurt).cast("long")).as("kurt_q"),
        when(ok, floor(lit(1000000.0) * (nD / lit(6.0) *
          (skew * skew + (kurt - lit(3.0)) * (kurt - lit(3.0)) / lit(4.0))))
          .cast("long")).as("jb_q"))
      .orderBy(col(groupCol))
  }

  /** Per-group goodness-of-fit battery with Benjamini–Hochberg FDR
    * control — the multiple-testing layer every per-source drift
    * audit needs once the source count grows. Each group's
    * distribution over {top-2 corpus categories, other} is tested
    * against the corpus shares (3 cells ⇒ exactly 2 df), which makes
    * the p-value CLOSED-FORM: P(χ²₂ ≥ x) = e^{−x/2} — no incomplete
    * gamma, just one exp on an exactly-agreed double. Cell
    * contributions are quantized ⌊10⁹·(o−e)²/e⌋ and summed as
    * integers (absent cells contribute ⌊10⁹·e⌋ via the full grid);
    * p_q = ⌊10¹²·e^{−χ²_q/(2·10⁹)}⌋. The BH step-up runs on the
    * bounded group table: rank ascending by (p_q, group),
    * raw_i = (m·p_q) div rank, adj_i = min over ranks ≥ i capped at
    * 10¹² — all integer, so the reject set is engine-exact at
    * α = 0.05 (adj_q ≤ 5·10¹⁰).
    *
    * Plan: one corpus scan to the (group, cat) grid; top-2 and
    * marginals are bounded broadcasts; the single-partition BH window
    * runs over #groups rows only.
    */
  def gofFdrBattery(df: DataFrame, groupCol: String,
                    catCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val cnt = df.select(col(groupCol).as("__g"), col(catCol).as("__c"))
      .na.drop()
      .groupBy(col("__g"), col("__c")).agg(count(lit(1)).as("o"))
      .mat
    val top2 = cnt.groupBy(col("__c")).agg(sum(col("o")).as("__ct"))
      .orderBy(col("__ct").desc, col("__c")).limit(2)
      .select(col("__c"), lit(1).as("__top"))
    // Tag-prefixed cell key: 'c:'+category for the top-2, 'o:' for the
    // rest bucket — no data value can collide with the sentinel (a
    // category literally named '~other' used to merge silently).
    val celled = cnt.join(broadcast(top2), Seq("__c"), "left")
      .select(col("__g"),
        when(col("__top").isNotNull, concat(lit("c:"), col("__c")))
          .otherwise(lit("o:")).as("__cell"),
        col("o"))
      .groupBy(col("__g"), col("__cell")).agg(sum(col("o")).as("o"))
      .mat
    val cellTot = celled.groupBy(col("__cell")).agg(sum(col("o")).as("__ct"))
    val grpTot = celled.groupBy(col("__g")).agg(sum(col("o")).as("__ng"))
    val tot = celled.agg(sum(col("o")).as("__t"))
    // full grid: a group missing a cell still contributes (0−e)²/e = e
    val grid = grpTot.crossJoin(broadcast(cellTot)).crossJoin(broadcast(tot))
      .join(celled, Seq("__g", "__cell"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
    val e = (dec(col("__ng")) * dec(col("__ct"))).cast("double") /
      col("__t").cast("double")
    val oD = col("o").cast("double")
    val chi = grid
      .select(col("__g"), col("__ng"),
        floor(lit(1.0e9) * (oD - e) * (oD - e) / e).cast("long").as("__cq"))
      .groupBy(col("__g"), col("__ng")).agg(sum(col("__cq")).as("chi_q"))
    val m = chi.agg(count(lit(1)).as("__m"))
    val w = Window.orderBy(col("p_q"), col("__g"))
    val wTail = Window.orderBy(col("p_q"), col("__g"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    chi.crossJoin(broadcast(m))
      .withColumn("p_q", floor(lit(1.0e12) *
        exp(-col("chi_q").cast("double") / lit(2.0e9))).cast("long"))
      .withColumn("rank", row_number().over(w).cast("long"))
      // dec38 product AND a decimal-side cap: Spark's `div` always
      // narrows its quotient to int64, so even a decimal numerator
      // wraps once m·p_q/rank ≥ 2⁶³ (p_q ≈ 1e12 at rank 1 → m ≈ 9.2e6
      // hypotheses). Since adj_q is clamped to 1e12 anyway, capping the
      // NUMERATOR at rank·1e12 first is an identity transform —
      // least(m·p_q, rank·1e12) div rank ≡ least(m·p_q div rank, 1e12)
      // — that keeps the quotient ≤ 1e12 (< 2⁶³) for ANY m, making the
      // step exact at every audit size instead of bounded at ~9.2e6.
      .withColumn("__raw",
        expr("least(CAST(__m AS DECIMAL(38,0)) * p_q, " +
          "CAST(rank AS DECIMAL(38,0)) * 1000000000000) div rank"))
      .withColumn("adj_q", least(min(col("__raw")).over(wTail),
        lit(1000000000000L)))
      .select(col("__g").as(groupCol), col("__ng").as("n"), col("chi_q"),
        col("p_q"), col("rank"), col("adj_q"),
        (col("adj_q") <= lit(50000000000L)).cast("int").as("reject"))
      .orderBy(col("rank"))
  }

  /** Shared rank grid for the two-sample rank tests below: collapse the
    * two samples to a (group, value, cnt) grid, then derive pooled and
    * within-group MID-ranks on the DOUBLED grid (2·midrank is always an
    * integer, so ties never touch a float):
    *
    *   2R_v (pooled) = 2·pcum_v − pcnt_v + 1,
    *   2r_v (within) = 2·wcum_v − cnt_v + 1,
    *
    * with pcum/wcum running counts over the value-ordered grid. The
    * windows run over the DISTINCT-VALUE grid, not the corpus (the
    * brownForsythe scale contract: one corpus scan to the grid, then
    * bounded-grid windows).
    */
  private def rankGrid(df: DataFrame, groupCol: String, xCol: String,
                       gA: String, gB: String): DataFrame = {
    val grid = df
      .filter(col(groupCol).isin(gA, gB) && col(xCol).isNotNull)
      .select(col(groupCol).as("__g"), col(xCol).cast("long").as("__v"))
      .groupBy(col("__g"), col("__v")).agg(count(lit(1)).as("__cnt"))
    val pooled = grid.groupBy(col("__v")).agg(sum(col("__cnt")).as("__pcnt"))
      .withColumn("__pcum", sum(col("__pcnt")).over(Window.orderBy(col("__v"))))
      .withColumn("__R2", lit(2L) * col("__pcum") - col("__pcnt") + 1L)
      .select(col("__v"), col("__R2"))
    grid
      .withColumn("__wcum", sum(col("__cnt"))
        .over(Window.partitionBy(col("__g")).orderBy(col("__v"))))
      // NOTE "__w2", not "__r2": Spark resolution is case-insensitive,
      // so "__r2" would collide with the pooled "__R2" at the join
      .withColumn("__w2", lit(2L) * col("__wcum") - col("__cnt") + 1L)
      .join(pooled, Seq("__v"))
  }

  /** Brunner–Munzel test ("generalized Wilcoxon") of the stochastic
    * ordering P(X_A < X_B) + ½P(X_A = X_B) = ½ between two named
    * groups — the rank test that stays valid under unequal variances
    * AND unequal shapes, where Mann–Whitney's permutation null does
    * not (Brunner & Munzel 2000, Biometrical J. 42).
    *
    * Exact skeleton on the doubled-rank grid ([[rankGrid]]): per row
    * d = 2R − 2r + (n_g + 1) is an integer; the rank-variance
    * numerator E_g = Σ(n_g·d − D_g)² with D_g = Σ2R accumulates in
    * decimal(38,0) (n_g·d ~ n²; squared ~ n⁴ — past long at corpus
    * scale); the statistic
    *
    *   W = (n_A·D_B − n_B·D_A) / ((n_A+n_B)·√(E_A/(n_A(n_A−1)) + E_B/(n_B(n_B−1))))
    *
    * is one mirrored fp chain (two casts, one add, one sqrt, one
    * divide). p̂ = (D_B − n_B(n_B+1)) / (2·n_A·n_B) is the
    * common-language effect size, exact rational → one division.
    *
    * Plan: one corpus scan → grid, two bounded-grid windows, two
    * broadcast one-row joins, one final fold. No corpus shuffle wider
    * than (group, value).
    *
    * @return one row (n_a, n_b, d_a_l, d_b_l, v_a_q, v_b_q, phat_q,
    *         w_q) with v_g_q = ⌊10⁶·E_g/(4n_g²(n_g−1))⌋ and
    *         w_q = ⌊10⁶·W⌋
    */
  def brunnerMunzel(df: DataFrame, groupCol: String, xCol: String,
                    gA: String, gB: String): DataFrame = {
    val dec38 = (c: Column) => c.cast("decimal(38,0)")
    val g = rankGrid(df, groupCol, xCol, gA, gB)
    val per = g.groupBy(col("__g"))
      .agg(sum(col("__cnt")).as("__n"),
        sum(col("__cnt") * col("__R2")).as("__D"))
    // "__dd", not "__d": a column named "__d" would case-insensitively
    // REPLACE the per-group "__D" sum from the withColumn
    val e = g.join(broadcast(per), Seq("__g"))
      .withColumn("__dd", col("__R2") - col("__w2") + col("__n") + 1L)
      .withColumn("__t", dec38(col("__n") * col("__dd") - col("__D")))
      .groupBy(col("__g"), col("__n"), col("__D"))
      .agg(sum(dec38(col("__cnt")) * col("__t") * col("__t")).as("__E"))
    val pick = (c: String, grp: String) =>
      max(when(col("__g") === grp, col(c)))
    val one = e.agg(
      pick("__n", gA).as("n_a"), pick("__n", gB).as("n_b"),
      pick("__D", gA).as("d_a_l"), pick("__D", gB).as("d_b_l"),
      pick("__E", gA).as("__ea"), pick("__E", gB).as("__eb"))
    val vq = (eCol: Column, n: Column) =>
      floor(lit(1.0e6) * eCol.cast("double") /
        (lit(4.0) * n.cast("double") * n.cast("double") *
          (n - 1L).cast("double"))).cast("long")
    val va = col("__ea").cast("double") /
      (col("n_a") * (col("n_a") - 1L)).cast("double")
    val vb = col("__eb").cast("double") /
      (col("n_b") * (col("n_b") - 1L)).cast("double")
    one.select(col("n_a"), col("n_b"), col("d_a_l"), col("d_b_l"),
      vq(col("__ea"), col("n_a")).as("v_a_q"),
      vq(col("__eb"), col("n_b")).as("v_b_q"),
      floor(lit(1.0e6) *
        (col("d_b_l") - col("n_b") * (col("n_b") + 1L)).cast("double") /
        (lit(2.0) * (col("n_a") * col("n_b")).cast("double")))
        .cast("long").as("phat_q"),
      when(col("n_a") >= 2 && col("n_b") >= 2 &&
        (col("__ea") > 0 || col("__eb") > 0),
        floor(lit(1.0e6) *
          (col("n_a") * col("d_b_l") - col("n_b") * col("d_a_l"))
            .cast("double") /
          ((col("n_a") + col("n_b")).cast("double") * sqrt(va + vb)))
          .cast("long")).as("w_q"))
  }

  /** Ansari–Bradley two-sample SCALE test: are the two groups equally
    * dispersed around a common center? Scores are the fold of the
    * pooled rank toward the extremes, a_i = min(R_i, N+1−R_i) — small
    * at both tails, large in the middle — so a concentrated sample
    * collects LARGE scores. Unlike Fligner–Killeen (normal quantiles)
    * or Mood (squared deviations), the AB score is pure integer
    * arithmetic on the doubled-rank grid: 2a = min(2R, 2(N+1)−2R).
    *
    * The statistic is T = Σ_{i∈A} a_i with the exact
    * finite-population moments of a linear rank statistic under ties:
    *
    *   E[T] = n_A·S/N,   Var[T] = n_A·n_B·(N·Q − S²)/(N²(N−1)),
    *
    * S = Σa, Q = Σa² over the pooled sample (both exact integers on
    * the doubled grid; products in decimal(38,0) — S² ~ N⁴ passes
    * long at corpus scale). z = (T − E)/√Var as one mirrored chain on
    * the ×2 grid: z = (N·t2 − n_A·s2) / √(n_A·n_B·(N·q4 − s2²)/(N−1))
    * with t2 = 2T, s2 = 2S, q4 = 4Q.
    *
    * Plan: identical to [[brunnerMunzel]] — grid, one bounded window,
    * one fold.
    *
    * @return one row (n_a, n_b, n_total, t2_l, s2_l, q4_l, z_q)
    */
  def ansariBradley(df: DataFrame, groupCol: String, xCol: String,
                    gA: String, gB: String): DataFrame = {
    val dec38 = (c: Column) => c.cast("decimal(38,0)")
    val g = rankGrid(df, groupCol, xCol, gA, gB)
    val tot = g.agg(sum(col("__cnt")).as("__N"))
    val scored = g.crossJoin(broadcast(tot))
      .withColumn("__a2",
        least(col("__R2"), lit(2L) * (col("__N") + 1L) - col("__R2")))
    val one = scored.agg(
      max(col("__N")).as("n_total"),
      sum(when(col("__g") === gA, col("__cnt")).otherwise(0L)).as("n_a"),
      sum(when(col("__g") === gB, col("__cnt")).otherwise(0L)).as("n_b"),
      sum(when(col("__g") === gA, col("__cnt") * col("__a2"))
        .otherwise(0L)).as("t2_l"),
      sum(col("__cnt") * col("__a2")).as("s2_l"),
      sum(dec38(col("__cnt")) * dec38(col("__a2")) * dec38(col("__a2")))
        .as("__q4"))
    one.select(col("n_a"), col("n_b"), col("n_total"), col("t2_l"),
      col("s2_l"), col("__q4").as("q4_l"),
      when(col("n_total") >= 3 &&
        dec38(col("n_total")) * col("__q4") -
          dec38(col("s2_l")) * dec38(col("s2_l")) > 0,
        floor(lit(1.0e6) *
          (dec38(col("n_total")) * dec38(col("t2_l")) -
            dec38(col("n_a")) * dec38(col("s2_l"))).cast("double") /
          sqrt((dec38(col("n_a")) * dec38(col("n_b")) *
            (dec38(col("n_total")) * col("__q4") -
              dec38(col("s2_l")) * dec38(col("s2_l")))).cast("double") /
            (col("n_total") - 1L).cast("double")))
          .cast("long")).as("z_q"))
  }

  /** Page's L trend test for ordered alternatives in a complete
    * randomized-block design — [[friedman]]'s directional sibling:
    * where Friedman asks "do the k treatments differ at all across n
    * blocks", Page asks "do they INCREASE in a pre-specified order",
    * which is strictly more powerful when the order is right. The
    * hypothesized order here is the treatment's ascending sort key —
    * the caller encodes the hypothesis in the treatment labels.
    *
    *   L = Σ_j c_j·R_j  (c_j = hypothesized rank of treatment j,
    *                     R_j = Σ over blocks of treatment j's
    *                     within-block mid-rank),
    *   E[L] = n·k(k+1)²/4,  Var[L] = n·k²(k+1)(k²−1)/144,
    *   z = (L − E)/√Var = 3·(2L·2/2… ) — carried on the ×2/×4 integer
    *   grids: l2 = 2L, e4 = 4E = n·k(k+1)², v144 = 144·Var, and
    *   z = 3·(2·l2 − e4)/√v144 (one sqrt, one divide).
    *
    * Cell observation = Σx per (block, treatment), exact long.
    * Incomplete blocks (missing a treatment) are dropped — Page's
    * design requirement. Within-block mid-ranks make ties exact on
    * the doubled grid; the no-tie Var is the documented convention
    * (ties are rare on continuous-ish cell sums).
    *
    * Plan: one corpus scan → k·n cell grid, per-block bounded window
    * for ranks, one k-row fold. Nothing wider than the cell grid ever
    * shuffles.
    *
    * @return one row (n_blocks, k, l2_l, e4_l, v144_l, z_q)
    */
  def pageL(df: DataFrame, blockCol: String, treatCol: String,
            xCol: String): DataFrame = {
    val cells = df
      .filter(col(blockCol).isNotNull && col(treatCol).isNotNull &&
        col(xCol).isNotNull)
      .groupBy(col(blockCol).as("__b"), col(treatCol).as("__t"))
      .agg(sum(col(xCol).cast("long")).as("__x"))
      .mat
    val k = cells.select(col("__t")).distinct().count().toInt
    val full = cells
      .withColumn("__kb", count(lit(1)).over(Window.partitionBy(col("__b"))))
      .filter(col("__kb") === k)
    // within-block doubled mid-rank of the cell value
    val ranked = full
      .withColumn("__lt", count(lit(1)).over(Window.partitionBy(col("__b"))
        .orderBy(col("__x")).rangeBetween(Window.unboundedPreceding, -1)))
      .withColumn("__eq", count(lit(1)).over(Window.partitionBy(col("__b"))
        .orderBy(col("__x")).rangeBetween(0, 0)))
      .withColumn("__R2", lit(2L) * col("__lt") + col("__eq") + 1L)
    // hypothesized order: ascending treatment sort key
    val order = cells.select(col("__t")).distinct()
      .withColumn("__c", row_number().over(Window.orderBy(col("__t")))
        .cast("long"))
    val one = ranked.join(broadcast(order), Seq("__t"))
      .agg((sum(col("__c") * col("__R2"))).as("l2_l"),
        (count(lit(1)) / lit(k)).cast("long").as("n_blocks"))
    val kL = lit(k.toLong)
    one.select(col("n_blocks"), kL.as("k"), col("l2_l"),
      (col("n_blocks") * kL * (kL + 1L) * (kL + 1L)).as("e4_l"),
      (col("n_blocks") * kL * kL * (kL + 1L) * (kL * kL - 1L)).as("v144_l"),
      when(col("n_blocks") >= 1 && kL >= 2,
        floor(lit(3.0e6) *
          (lit(2L) * col("l2_l") -
            col("n_blocks") * kL * (kL + 1L) * (kL + 1L)).cast("double") /
          sqrt((col("n_blocks") * kL * kL * (kL + 1L) * (kL * kL - 1L))
            .cast("double"))).cast("long")).as("z_q"))
  }

  /** Grubbs' maximum-studentized-deviation outlier test on an integer
    * metric — "is the most extreme value too extreme for a sample of
    * this size": G = max|x − x̄| / s. On the n-scaled centered grid
    * the numerator max|n·x − S| is an exact integer and the (n−1)
    * sample variance clears its denominators:
    *
    *   G = max|n·x − S| · √(n−1) / √(Σ(n·x − S)²)
    *
    * — one mirrored two-sqrt chain on exact integers. Plan: one
    * corpus scan feeding one hash agg (the Σ and max fold together;
    * S comes from a broadcast one-row pre-agg).
    *
    * @return one row (n, maxdev_l = max|n·x−S|, num0_l, g_q = ⌊10⁶·G⌋)
    */
  def grubbs(df: DataFrame, xCol: String): DataFrame = {
    val dec38 = (c: Column) => c.cast("decimal(38,0)")
    val v = df.select(col(xCol).cast("long").as("__x")).na.drop()
    val tot = v.agg(count(lit(1)).as("__n"), sum(col("__x")).as("__S"))
    val c = v.crossJoin(broadcast(tot))
      .withColumn("__xc", col("__n") * col("__x") - col("__S"))
    c.groupBy(col("__n"))
      .agg(max(abs(col("__xc"))).as("maxdev_l"),
        sum(dec38(col("__xc")) * dec38(col("__xc"))).as("num0_l"))
      .select(col("__n").as("n"), col("maxdev_l"), col("num0_l"),
        when(col("__n") >= 3 && col("num0_l") > 0,
          floor(lit(1.0e6) * col("maxdev_l").cast("double") *
            sqrt((col("__n") - 1L).cast("double")) /
            sqrt(col("num0_l").cast("double"))).cast("long")).as("g_q"))
  }

  /** Wilcoxon signed-rank test for PAIRED samples — the matched
    * before/after companion to [[mannWhitney]] (which assumes
    * independent groups): per unit, d = after − before; zero
    * differences drop (Wilcoxon's convention), |d| values get pooled
    * mid-ranks, and W⁺ = Σ ranks of the positive differences. Sign
    * counts ride along (the sign test is the coarser free companion).
    *
    * Scale contract: the ranks come from the DISTINCT-|d| GRID (one
    * hash agg from the corpus scan, then bounded-grid windows — the
    * [[rankGrid]] shape), never a corpus-wide window. Doubled
    * mid-ranks keep ties exact:
    *
    *   W2 = 2·W⁺ = Σ_{d>0} 2R_{|d|},
    *   48·Var = 2n'(n'+1)(2n'+1) − Σ_ties (t³ − t),
    *   z = (2·W2 − n'(n'+1)) / (4·√(48·Var / 48))
    *
    * — every sum an exact integer, one mirrored two-op chain.
    *
    * @param df frame with one row per paired unit
    * @return one row (n_used, n_pos, n_neg, w2_l, var48_l, z_q)
    */
  def wilcoxonSignedRank(df: DataFrame, beforeCol: String,
                         afterCol: String): DataFrame = {
    val dec38 = (c: Column) => c.cast("decimal(38,0)")
    val d = df.select((col(afterCol).cast("long") -
        col(beforeCol).cast("long")).as("__d"))
      .na.drop()
      .filter(col("__d") =!= 0L)
    val grid = d.groupBy(abs(col("__d")).as("__a"))
      .agg(count(lit(1)).as("__cnt"),
        sum(when(col("__d") > 0, 1L).otherwise(0L)).as("__pos"))
    val ranked = grid
      .withColumn("__cum", sum(col("__cnt")).over(Window.orderBy(col("__a"))))
      .withColumn("__R2", lit(2L) * col("__cum") - col("__cnt") + 1L)
    val one = ranked.agg(
      sum(col("__cnt")).as("n_used"),
      sum(col("__pos")).as("n_pos"),
      (sum(col("__cnt")) - sum(col("__pos"))).as("n_neg"),
      sum(col("__pos") * col("__R2")).as("w2_l"),
      sum(dec38(col("__cnt")) * col("__cnt") * col("__cnt") - col("__cnt"))
        .as("__tie"))
    one.select(col("n_used"), col("n_pos"), col("n_neg"), col("w2_l"),
      (dec38(lit(2L)) * col("n_used") * (col("n_used") + 1L) *
        (lit(2L) * col("n_used") + 1L) - col("__tie")).as("var48_l"))
      .withColumn("z_q",
        when(col("n_used") >= 1 && col("var48_l") > 0,
          floor(lit(1.0e6) *
            (lit(2L) * col("w2_l") -
              col("n_used") * (col("n_used") + 1L)).cast("double") /
            (lit(4.0) * sqrt(col("var48_l").cast("double") / lit(48.0))))
            .cast("long")))
  }

  /** One-sample Kolmogorov–Smirnov distance against the DISCRETE
    * UNIFORM over k ordered buckets — the shard-balance audit for
    * hash/rendezvous/Feistel bucket assignments ([[chiSquare]] sees
    * per-bucket imbalance; KS sees a systematic LEAN across the
    * ordered range that per-bucket χ² dilutes):
    *
    *   D = max_j |cum_j/N − (j+1)/k|
    *     = max_j |k·cum_j − (j+1)·N| / (k·N)
    *
    * — exact integers to one final division. Empty buckets count (the
    * grid is the full 0..k−1 range, not just observed buckets). Plan:
    * one corpus scan to k counts, one k-row window.
    *
    * @return one row (n, k, maxnum_l, d_q = ⌊10⁶·D⌋)
    */
  def ksUniform(df: DataFrame, bucketCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k ($k) must be >= 2")
    val counts = df.select(col(bucketCol).cast("long").as("__b"))
      .na.drop()
      .filter(col("__b") >= 0 && col("__b") < k)
      .groupBy(col("__b")).agg(count(lit(1)).as("__c"))
    val grid = counts.sparkSession.range(0, k)
      .select(col("id").as("__b"))
      .join(counts, Seq("__b"), "left")
      .na.fill(0L, Seq("__c"))
      .withColumn("__cum", sum(col("__c")).over(Window.orderBy(col("__b"))))
    val tot = grid.agg(max(col("__cum")).as("__n"))
    grid.crossJoin(broadcast(tot))
      .select(col("__n"),
        abs(lit(k.toLong) * col("__cum") - (col("__b") + 1L) * col("__n"))
          .as("__num"))
      .groupBy(col("__n").as("n"))
      .agg(max(col("__num")).as("maxnum_l"))
      .select(col("n"), lit(k.toLong).as("k"), col("maxnum_l"),
        when(col("n") > 0,
          floor(lit(1.0e6) * col("maxnum_l").cast("double") /
            (lit(k.toDouble) * col("n").cast("double"))).cast("long"))
          .as("d_q"))
  }

  /** Bowker's test of symmetry for a PAIRED k×k contingency table —
    * McNemar's k-category generalization: does the confusion between
    * categories flow symmetrically (label i → j as often as j → i)?
    * An asymmetric flow means the second rater/model systematically
    * drifts toward some categories — the confusion-matrix audit
    * McNemar can only give for 2 classes:
    *
    *   χ² = Σ_{i<j} (n_ij − n_ji)² / (n_ij + n_ji),   df = #pairs with
    *        n_ij + n_ji > 0
    *
    * Per-pair contributions quantize ⌊10⁹·(n_ij−n_ji)²/(n_ij+n_ji)⌋
    * as longs (ONE double division per cell pair), so the statistic
    * is an order-free integer sum. Plan: one corpus scan to the cell
    * grid, one self-join on the mirrored key (k² grid rows), one fold.
    *
    * @return one row (n_rows, df, chi2_q = Σ⌊10⁹·term⌋)
    */
  def bowker(df: DataFrame, colA: String, colB: String): DataFrame = {
    val cells = df.select(col(colA).as("__a"), col(colB).as("__b"))
      .na.drop()
      .groupBy(col("__a"), col("__b")).agg(count(lit(1)).as("__n"))
      .mat
    // upper triangle (i<j) full-outer-joined with the MIRRORED lower
    // triangle: a pair present on only one side still tests (against 0)
    val pairs = cells.filter(col("__a") < col("__b"))
      .join(cells.filter(col("__a") > col("__b"))
        .select(col("__b").as("__a"), col("__a").as("__b"),
          col("__n").as("__m")), Seq("__a", "__b"), "full_outer")
      .na.fill(0L, Seq("__n", "__m"))
      .filter(col("__n") + col("__m") > 0)
    val tot = cells.agg(sum(col("__n")).as("n_rows"))
    pairs
      .select(floor(lit(1.0e9) *
        ((col("__n") - col("__m")) * (col("__n") - col("__m")))
          .cast("double") /
        (col("__n") + col("__m")).cast("double")).cast("long").as("__t"))
      .agg(count(lit(1)).as("df"), sum(col("__t")).as("chi2_q"))
      .crossJoin(broadcast(tot))
      .select(col("n_rows"), col("df"), col("chi2_q"))
  }

  /** Quade test for treatment differences in a randomized-block
    * design — [[friedman]] with blocks WEIGHTED by how much signal
    * they carry: each block's weight is the rank of its sample range,
    * so flat blocks (all treatments alike) stop diluting the
    * statistic. The standard upgrade when block sizes of effect vary
    * wildly — exactly the source×lang cell grids here.
    *
    * Doubled-rank grids keep every tie exact: within-block treatment
    * mid-ranks 2r, block range-rank mid-ranks Q2, and
    *
    *   S4_bt = Q2_b · (2r_bt − (k+1)),   S4_j = Σ_b S4_bj,
    *   F = (n−1)·Σ_j S4_j² / (n·Σ_bt S4_bt² − Σ_j S4_j²)
    *
    * — every sum an exact decimal(38,0), ONE double division (F is
    * scale-invariant, so the ×4 grids cancel). NULL when the
    * denominator degenerates (all blocks tied).
    *
    * Plan: the [[pageL]] cell grid + two bounded-grid windows (ranks
    * within block, range-ranks across blocks) + two folds.
    *
    * @return one row (n_blocks, k, a16_l, b16n_l, f_q = ⌊10⁶·F⌋)
    */
  def quade(df: DataFrame, blockCol: String, treatCol: String,
            xCol: String): DataFrame = {
    val dec38 = (c: Column) => c.cast("decimal(38,0)")
    val cells = df
      .filter(col(blockCol).isNotNull && col(treatCol).isNotNull &&
        col(xCol).isNotNull)
      .groupBy(col(blockCol).as("__b"), col(treatCol).as("__t"))
      .agg(sum(col(xCol).cast("long")).as("__x"))
      .mat
    val k = cells.select(col("__t")).distinct().count().toInt
    val full = cells
      .withColumn("__kb", count(lit(1)).over(Window.partitionBy(col("__b"))))
      .filter(col("__kb") === k)
    val ranked = full
      .withColumn("__lt", count(lit(1)).over(Window.partitionBy(col("__b"))
        .orderBy(col("__x")).rangeBetween(Window.unboundedPreceding, -1)))
      .withColumn("__eq", count(lit(1)).over(Window.partitionBy(col("__b"))
        .orderBy(col("__x")).rangeBetween(0, 0)))
      .withColumn("__R2", lit(2L) * col("__lt") + col("__eq") + 1L)
    // block weights: doubled mid-rank of the block's sample range
    val ranges = full.groupBy(col("__b"))
      .agg((max(col("__x")) - min(col("__x"))).as("__rg"))
      .withColumn("__rlt", count(lit(1)).over(Window.orderBy(col("__rg"))
        .rangeBetween(Window.unboundedPreceding, -1)))
      .withColumn("__req", count(lit(1)).over(Window.orderBy(col("__rg"))
        .rangeBetween(0, 0)))
      .select(col("__b"),
        (lit(2L) * col("__rlt") + col("__req") + 1L).as("__Q2"))
    val s = ranked.join(ranges, Seq("__b"))
      .withColumn("__S4", col("__Q2") * (col("__R2") - lit(k + 1L)))
      .mat
    val a = s.agg(sum(dec38(col("__S4")) * dec38(col("__S4"))).as("a16_l"),
      (count(lit(1)) / lit(k)).cast("long").as("n_blocks"))
    val bj = s.groupBy(col("__t"))
      .agg(sum(col("__S4")).as("__Sj"))
      .agg(sum(dec38(col("__Sj")) * dec38(col("__Sj"))).as("b16n_l"))
    a.crossJoin(bj)
      .select(col("n_blocks"), lit(k.toLong).as("k"), col("a16_l"),
        col("b16n_l"),
        when(col("n_blocks") >= 2 &&
          dec38(col("n_blocks")) * col("a16_l") - col("b16n_l") > 0,
          floor(lit(1.0e6) *
            ((col("n_blocks") - 1L) * col("b16n_l")).cast("double") /
            (dec38(col("n_blocks")) * col("a16_l") - col("b16n_l"))
              .cast("double")).cast("long")).as("f_q"))
  }

  /** Pettitt's changepoint test on an ordered series — the rank-based
    * (distribution-free) "did the level shift, and when?" audit for a
    * daily count series: a Mann–Whitney comparison of every prefix
    * against its suffix, maximized over the split point.
    *
    * With doubled mid-ranks R2ᵢ = 2·s_v + c_v + 1 (s_v = #smaller,
    * c_v = #ties — INTEGER even under ties) the prefix statistic is
    * exactly
    *
    *   U_t = Σ_{i≤t} R2ᵢ − t·(n+1)
    *
    * (the classical 2·ΣRᵢ − t(n+1) with the doubling absorbed), and
    * K = max_{1≤t<n} |U_t|, t* = the earliest order key attaining K.
    * The approximate significance 2·exp(−6K²/(n³+n²)) quantizes to
    * p_q = ⌊10⁶·p⌋ — ONE exp on exact integers, same op both engines.
    *
    * Plan: one value-grid window pass for the doubled mid-ranks (tie
    * groups, not rows), one join back, one ordered prefix-sum window,
    * one max fold. No pair enumeration anywhere — O(n log n) at any
    * scale, vs the textbook O(n²) sign-matrix definition.
    *
    * @param orderCol total order of the series (e.g. day bucket)
    * @param valueCol the measured level (long-castable)
    * @return one row (n, k_stat, t_star, p_q)
    */
  def pettitt(df: DataFrame, orderCol: String, valueCol: String): DataFrame = {
    val base = df.select(col(orderCol).cast("long").as("__o"),
      col(valueCol).cast("long").as("__x")).na.drop()
    val ranked = base
      .withColumn("__lt", count(lit(1)).over(Window.orderBy(col("__x"))
        .rangeBetween(Window.unboundedPreceding, -1)))
      .withColumn("__eq", count(lit(1)).over(Window.orderBy(col("__x"))
        .rangeBetween(0, 0)))
      .withColumn("__R2", lit(2L) * col("__lt") + col("__eq") + 1L)
    val n1 = ranked.agg(count(lit(1)).as("__n"))
    val pre = ranked
      .withColumn("__t", count(lit(1)).over(Window.orderBy(col("__o"))
        .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__S", sum(col("__R2")).over(Window.orderBy(col("__o"))
        .rowsBetween(Window.unboundedPreceding, 0)))
    val u = pre.crossJoin(broadcast(n1))
      .filter(col("__t") < col("__n"))
      .select(col("__n"), col("__o"),
        abs(col("__S") - col("__t") * (col("__n") + 1L)).as("__U"))
    // n is small (a dense time grid) — the single-partition max window
    // is a deliberate non-issue, same device as the other series tests
    u.withColumn("__K", max(col("__U")).over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .filter(col("__U") === col("__K"))
      .groupBy(col("__n").as("n"))
      .agg(max(col("__K")).as("k_stat"), min(col("__o")).as("t_star"))
      .select(col("n"), col("k_stat"), col("t_star"),
        when(col("n") >= 2,
          floor(lit(1.0e6) * lit(2.0) *
            exp(lit(-6.0) * col("k_stat").cast("double") *
              col("k_stat").cast("double") /
              (col("n").cast("double") * col("n").cast("double") *
                col("n").cast("double") +
                col("n").cast("double") * col("n").cast("double"))))
            .cast("long")).as("p_q"))
  }

  /** Kuiper's V statistic of a bucket assignment against the discrete
    * uniform over k buckets — the [[ksUniform]] audit's
    * rotation-sensitive sibling: V = D⁺ + D⁻ catches a shard
    * imbalance that pushes mass BOTH ways (one hot and one cold
    * region), which the one-sided max |gap| of KS can halve away.
    *
    * On the k·n integer grid (cum = running count through bucket b):
    *
    *   D⁺_l = max(0, max_b (k·cum_b − (b+1)·n))
    *   D⁻_l = max(0, max_b ((b+1)·n − k·cum_b))
    *   V_l  = D⁺_l + D⁻_l,   v_q = ⌊10⁶·V_l/(k·n)⌋
    *
    * Both numerators compare the ECDF to the uniform CDF at bucket
    * RIGHT edges — the same convention as ksUniform, documented here
    * as the contract (the continuous-case left-limit refinement has
    * no analogue on an integer lattice). Exact integers to the last
    * division.
    *
    * Plan shape: identical to ksUniform — bucket hash-agg, k-row
    * dense grid, one ordered window, one fold.
    *
    * @return one row (n, k, dplus_l, dminus_l, v_q)
    */
  def kuiper(df: DataFrame, bucketCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k ($k) must be >= 2")
    val counts = df.select(col(bucketCol).cast("long").as("__b"))
      .na.drop()
      .filter(col("__b") >= 0 && col("__b") < k)
      .groupBy(col("__b")).agg(count(lit(1)).as("__c"))
    val grid = counts.sparkSession.range(0, k)
      .select(col("id").as("__b"))
      .join(counts, Seq("__b"), "left")
      .na.fill(0L, Seq("__c"))
      .withColumn("__cum", sum(col("__c")).over(Window.orderBy(col("__b"))))
    val tot = grid.agg(max(col("__cum")).as("__n"))
    grid.crossJoin(broadcast(tot))
      .select(col("__n"),
        (lit(k.toLong) * col("__cum") - (col("__b") + 1L) * col("__n"))
          .as("__gap"))
      .groupBy(col("__n").as("n"))
      .agg(greatest(max(col("__gap")), lit(0L)).as("dplus_l"),
        greatest(max(-col("__gap")), lit(0L)).as("dminus_l"))
      .select(col("n"), lit(k.toLong).as("k"), col("dplus_l"),
        col("dminus_l"),
        when(col("n") > 0,
          floor(lit(1.0e6) *
            (col("dplus_l") + col("dminus_l")).cast("double") /
            (lit(k.toDouble) * col("n").cast("double"))).cast("long"))
          .as("v_q"))
  }

  /** Hellinger distance between two groups' categorical distributions
    * — the BOUNDED drift metric ([[psi]] explodes on empty cells,
    * [[jsDivergence]] needs two logs per cell; Hellinger is √ of a
    * bounded quadratic form, the standard "how far apart are these
    * two corpora" number in [0, 1]):
    *
    *   BC = Σ_i √(p_i·q_i),   H = √(1 − BC)
    *
    * Per-cell quantization: ⌊10⁹·√((c_a·c_b)/(n_a·n_b))⌋ — exact
    * integer products into ONE division and ONE sqrt per cell (cells
    * missing on either side contribute exactly 0, no smoothing —
    * that's BC's virtue over KL). Since each floored term
    * underestimates, Σ ≤ 10⁹ and 1 − bc_q/10⁹ ≥ 0 always — the final
    * ⌊10⁶·√(1 − bc_q/10⁹)⌋ is total.
    *
    * Plan: one cell hash-agg per group from one scan (conditional
    * counts), broadcast one-row totals, per-cell fold.
    *
    * @return one row (n_a, n_b, n_cells, bc_q, hellinger_q)
    */
  def hellingerDrift(df: DataFrame, groupCol: String, catCol: String,
                     gA: String, gB: String): DataFrame = {
    val cells = df
      .filter((col(groupCol) === gA || col(groupCol) === gB) &&
        col(catCol).isNotNull)
      .groupBy(col(catCol).as("__c"))
      .agg(sum(when(col(groupCol) === gA, 1L).otherwise(0L)).as("__ca"),
        sum(when(col(groupCol) === gB, 1L).otherwise(0L)).as("__cb"))
    val tot = cells.agg(sum(col("__ca")).as("__na"),
      sum(col("__cb")).as("__nb"))
    val terms = cells.crossJoin(broadcast(tot))
      .select(col("__na"), col("__nb"),
        floor(lit(1.0e9) * sqrt(
          (col("__ca") * col("__cb")).cast("double") /
            (col("__na") * col("__nb")).cast("double"))).cast("long")
          .as("__t"))
    terms.groupBy(col("__na").as("n_a"), col("__nb").as("n_b"))
      .agg(count(lit(1)).as("n_cells"), sum(col("__t")).as("bc_q"))
      .select(col("n_a"), col("n_b"), col("n_cells"), col("bc_q"),
        when(col("n_a") > 0 && col("n_b") > 0,
          floor(lit(1.0e6) * sqrt(lit(1.0) -
            col("bc_q").cast("double") / lit(1.0e9))).cast("long"))
          .as("hellinger_q"))
  }

  /** Blomqvist's β (the medial correlation coefficient) — rank
    * correlation at its most robust: split the plane at the two
    * MEDIANS and count quadrant concordance,
    *
    *   β = (n₁₊₃ − n₂₊₄) / (n₁₊₃ + n₂₊₄)
    *
    * (n₁₊₃ = both above or both below, n₂₊₄ = mixed; points ON either
    * median line are excluded and REPORTED as n_on — the convention
    * that keeps the statistic a pure sign count). One division,
    * quantized ⌊10⁶·β⌋. Medians are the integer-rank lower medians
    * (first value with 2·cum ≥ n — the [[Quantiles]] convention).
    *
    * Where [[spearman]] needs full rank grids and [[kendallTau]]
    * pair counts, β needs two order statistics and one scan — the
    * O(n) dependence screen that survives any monotone transform and
    * 50 % contamination.
    *
    * @return one row (n, n_conc, n_disc, n_on, beta_q)
    */
  def blomqvistBeta(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val base = df.select(col(xCol).cast("long").as("__x"),
      col(yCol).cast("long").as("__y")).na.drop()
      .mat
    def median(c: String): DataFrame = {
      val g = base.groupBy(col(c).as("__v")).agg(count(lit(1)).as("__c"))
        .withColumn("__cum", sum(col("__c")).over(Window.orderBy(col("__v"))))
      val n = g.agg(max(col("__cum")).as("__n"))
      g.crossJoin(broadcast(n)).filter(col("__cum") * 2 >= col("__n"))
        .agg(min(col("__v")).as(s"__med$c"))
    }
    val quads = base
      .crossJoin(broadcast(median("__x")))
      .crossJoin(broadcast(median("__y")))
      .select(
        when(col("__x") === col("__med__x") ||
          col("__y") === col("__med__y"), lit("on"))
          .when((col("__x") > col("__med__x")) ===
            (col("__y") > col("__med__y")), lit("conc"))
          .otherwise(lit("disc")).as("__q"))
    quads.agg(count(lit(1)).as("n"),
        sum(when(col("__q") === "conc", 1L).otherwise(0L)).as("n_conc"),
        sum(when(col("__q") === "disc", 1L).otherwise(0L)).as("n_disc"),
        sum(when(col("__q") === "on", 1L).otherwise(0L)).as("n_on"))
      .select(col("n"), col("n_conc"), col("n_disc"), col("n_on"),
        when(col("n_conc") + col("n_disc") > 0,
          floor(lit(1.0e6) *
            (col("n_conc") - col("n_disc")).cast("double") /
            (col("n_conc") + col("n_disc")).cast("double")).cast("long"))
          .as("beta_q"))
  }

  /** Lin's concordance correlation coefficient — "does y REPRODUCE x"
    * (not merely correlate): Pearson's r times a bias-correction
    * factor penalizing scale and location shifts,
    *
    *   CCC = 2·cov(x,y) / (var x + var y + (x̄ − ȳ)²)
    *
    * The n²-cleared form is a pure integer rational: with
    * A = n·Σxy − Σx·Σy, B = n·Σx² − (Σx)², C = n·Σy² − (Σy)²,
    *
    *   CCC = 2A / (B + C + (Σx − Σy)²)
    *
    * — decimal(38,0) sums, ONE double division, ⌊10⁶·⌋. The metric
    * behind "is the cheap token-count estimator interchangeable with
    * the stored count" — r alone would bless a consistently-2×-off
    * estimator; CCC won't.
    *
    * @return one row (n, a2_l, den_l, ccc_q)
    */
  def linCcc(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val dec38 = (c: Column) => c.cast("decimal(38,0)")
    val base = df.select(col(xCol).cast("long").as("__x"),
      col(yCol).cast("long").as("__y")).na.drop()
    base.agg(count(lit(1)).as("n"),
        sum(dec38(col("__x"))).as("__sx"), sum(dec38(col("__y"))).as("__sy"),
        sum(dec38(col("__x")) * dec38(col("__x"))).as("__sxx"),
        sum(dec38(col("__y")) * dec38(col("__y"))).as("__syy"),
        sum(dec38(col("__x")) * dec38(col("__y"))).as("__sxy"))
      .select(col("n"),
        (lit(2L).cast("decimal(38,0)") *
          (dec38(col("n")) * col("__sxy") - col("__sx") * col("__sy")))
          .as("a2_l"),
        ((dec38(col("n")) * col("__sxx") - col("__sx") * col("__sx")) +
          (dec38(col("n")) * col("__syy") - col("__sy") * col("__sy")) +
          (col("__sx") - col("__sy")) * (col("__sx") - col("__sy")))
          .as("den_l"))
      .select(col("n"), col("a2_l"), col("den_l"),
        when(col("den_l") > 0,
          floor(lit(1.0e6) * col("a2_l").cast("double") /
            col("den_l").cast("double")).cast("long")).as("ccc_q"))
  }

  /** Van Elteren's stratified rank test — "is treatment A shifted vs
    * B once the stratum (shard, language, cohort) is held fixed": the
    * locally-best weighted combination of per-stratum Wilcoxon
    * rank-sums, the design-correct replacement for pooling strata
    * into one Mann–Whitney (which Simpson's-paradoxes the moment
    * stratum sizes differ between arms).
    *
    * Doubled mid-ranks keep every stratum integer (R2 = 2·lt + t + 1
    * on the per-stratum value grid). With W2_s = Σ_{i∈A} R2ᵢ,
    * E[W2_s] = n_s·(N_s+1) exactly, so each stratum contributes
    *
    *   d_s = (W2_s − n_s·(N_s+1)) / (N_s+1)            [⌊10⁹·⌋]
    *   v_s = n_s·m_s·(N(N−1)(N+1) − Σ(t³−t))
    *         / (3·N(N−1)·(N+1)²)                        [⌊10⁹·⌋]
    *
    * (the tie-corrected W2 variance over the squared weight), and
    * z = Σd / √(10⁹·Σv) — per-stratum ONE division each on exact
    * decimals, the established quantize-then-sum device. Strata where
    * either arm is empty contribute exactly 0 to both sums;
    * single-observation strata have no variance and are excluded
    * from v (N ≥ 2 guard).
    *
    * Plan: one (stratum, value) grid agg, two per-stratum windows,
    * one fold — no per-row ranking, no cross-stratum shuffle beyond
    * the grid.
    *
    * @return one row (n_strata, d_sum_q, v_sum_q, z_q)
    */
  def vanElteren(df: DataFrame, stratumCol: String, groupCol: String,
                 valueCol: String, gA: String, gB: String): DataFrame = {
    val dec38 = (c: Column) => c.cast("decimal(38,0)")
    val grid = df
      .filter((col(groupCol) === gA || col(groupCol) === gB) &&
        col(stratumCol).isNotNull)
      .select(col(stratumCol).as("__s"), col(groupCol).as("__g"),
        col(valueCol).cast("long").as("__v"))
      .na.drop()
      .groupBy(col("__s"), col("__v"))
      .agg(count(lit(1)).as("__c"),
        sum(when(col("__g") === gA, 1L).otherwise(0L)).as("__ca"))
    val wS = Window.partitionBy(col("__s")).orderBy(col("__v"))
    val ranked = grid
      .withColumn("__lt", coalesce(sum(col("__c")).over(
        wS.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__R2", lit(2L) * col("__lt") + col("__c") + 1L)
    // the per-stratum frame materializes (localCheckpoint) before the
    // quantized-term projection: the term expressions then run in their
    // own fresh codegen stage over plain long/decimal columns, with
    // nothing fused back into the window/aggregate pipeline
    val strata = ranked.groupBy(col("__s"))
      .agg(sum(col("__c")).as("__vanN"), sum(col("__ca")).as("__vanA"),
        sum(col("__ca") * col("__R2")).as("__vanW"),
        sum(dec38(col("__c")) * col("__c") * col("__c") - col("__c"))
          .as("__vanT"))
      .withColumn("__vanM", col("__vanN") - col("__vanA"))
      .mat
    val terms = strata.select(
      floor(lit(1.0e9) *
        (col("__vanW") - col("__vanA") * (col("__vanN") + 1L))
          .cast("double") /
        (col("__vanN") + 1L).cast("double")).cast("long").as("__dq"),
      when(col("__vanN") >= 2,
        floor(lit(1.0e9) *
          (dec38(col("__vanA")) * col("__vanM") *
            (dec38(col("__vanN")) * (col("__vanN") - 1L) *
              (col("__vanN") + 1L) - col("__vanT"))).cast("double") /
          (lit(3L).cast("decimal(38,0)") * col("__vanN") *
            (col("__vanN") - 1L) * (col("__vanN") + 1L) *
            (col("__vanN") + 1L)).cast("double")).cast("long"))
        .otherwise(lit(0L)).as("__vq"))
    terms.agg(count(lit(1)).as("n_strata"),
        sum(col("__dq")).as("d_sum_q"), sum(col("__vq")).as("v_sum_q"))
      .select(col("n_strata"), col("d_sum_q"), col("v_sum_q"),
        when(col("v_sum_q") > 0,
          floor(lit(1.0e6) * col("d_sum_q").cast("double") /
            sqrt(lit(1.0e9) * col("v_sum_q").cast("double")))
            .cast("long")).as("z_q"))
  }

  /** Empirical upper-tail dependence of a numeric pair — do the
    * EXTREMES co-occur (the question correlation answers worst):
    * with both marginal thresholds at the p = pNum/pDen lower
    * quantile (the integer-rank convention),
    *
    *   λ_U = P(X > q_x, Y > q_y) / (1 − p)
    *       = pDen·n_joint / (n·(pDen − pNum))            [⌊10⁶·⌋]
    *
    * plus the independence-excess ratio n_joint·n/(n_x·n_y) (1 under
    * independence, ⌊10⁶·⌋) — exact integer counts into one division
    * each. The co-extreme audit behind "do long documents and long
    * token counts spike on the same items", where a body-level
    * correlation says nothing about joint tails.
    *
    * @return one row (n, q_x, q_y, n_x, n_y, n_joint, lambda_q,
    *         ratio_q)
    */
  def tailDependence(df: DataFrame, xCol: String, yCol: String,
                     pNum: Int = 9, pDen: Int = 10): DataFrame = {
    require(pDen > 0 && pNum > 0 && pNum < pDen,
      s"p fraction $pNum/$pDen must sit in (0, 1)")
    val base = df.select(col(xCol).cast("long").as("__x"),
      col(yCol).cast("long").as("__y")).na.drop()
      .mat
    def quantile(c: String): DataFrame = {
      val g = base.groupBy(col(c).as("__v")).agg(count(lit(1)).as("__c"))
        .withColumn("__cum", sum(col("__c")).over(Window.orderBy(col("__v"))))
      val n = g.agg(max(col("__cum")).as("__n"))
      g.crossJoin(broadcast(n))
        .filter(col("__cum") * pDen >= lit(pNum.toLong) * col("__n"))
        .agg(min(col("__v")).as(s"__q$c"))
    }
    base
      .crossJoin(broadcast(quantile("__x")))
      .crossJoin(broadcast(quantile("__y")))
      .agg(count(lit(1)).as("n"),
        max(col("__q__x")).as("q_x"), max(col("__q__y")).as("q_y"),
        sum(when(col("__x") > col("__q__x"), 1L).otherwise(0L)).as("n_x"),
        sum(when(col("__y") > col("__q__y"), 1L).otherwise(0L)).as("n_y"),
        sum(when(col("__x") > col("__q__x") &&
          col("__y") > col("__q__y"), 1L).otherwise(0L)).as("n_joint"))
      .select(col("n"), col("q_x"), col("q_y"), col("n_x"), col("n_y"),
        col("n_joint"),
        when(col("n") > 0,
          floor(lit(1.0e6) *
            (lit(pDen.toLong) * col("n_joint")).cast("double") /
            (col("n") * lit((pDen - pNum).toLong)).cast("double"))
            .cast("long")).as("lambda_q"),
        when(col("n_x") > 0 && col("n_y") > 0,
          floor(lit(1.0e6) *
            (col("n_joint") * col("n")).cast("double") /
            (col("n_x") * col("n_y")).cast("double")).cast("long"))
          .as("ratio_q"))
  }
}
