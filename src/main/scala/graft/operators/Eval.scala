package graft.operators

import graft.operators.Mat._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed, engine-exact evaluation metrics — the audit side of
  * the model-based curation loop (q85's classifier, quality-score
  * filters): a ranking metric computed from exact integer aggregates,
  * reproducible bit-for-bit on any engine.
  */
object Eval {

  /** Exact tie-adjusted ROC AUC of an integer score against a binary
    * label — the Mann–Whitney U form computed WITHOUT sorting
    * individual rows: aggregate to one row per distinct score (the
    * score-bounded table), then
    *
    *   AUC = Σ_s p_s·(2·negBelow(s) + n_s) / (2·P·N)
    *
    * where p_s/n_s are positive/negative counts at score s and
    * negBelow its cumulative negatives — ties contribute the standard
    * 1/2. Everything up to the final division is exact long
    * arithmetic, so ⌊10⁶·AUC⌋ is engine-identical. Null scores are
    * excluded (they rank nowhere).
    *
    * Plan shape: one hash aggregate to |distinct scores| rows, one
    * window over that bounded table (scores are quantized — bounded by
    * the quantization grid, not the corpus), one scalar aggregate.
    */
  /** Mean reciprocal rank over a ranked frame `(query_id, rank, rel)`
    * — quantized-reciprocal semantics: each query contributes
    * `1000000 div firstRelRank` (an exact integer), queries with no
    * relevant result contribute 0, and the mean is ONE division of
    * exact longs — bit-reproducible regardless of partition order.
    * `nQueries` is the evaluation denominator (queries absent from the
    * frame — retrieval returned nothing — still count).
    */
  def mrrAtK(ranked: DataFrame, k: Int, nQueries: Long): DataFrame = {
    require(k > 0, s"k ($k) must be positive")
    require(nQueries > 0, s"nQueries ($nQueries) must be positive")
    ranked
      .filter(col("rank") <= k && col("rel"))
      .groupBy(col("query_id"))
      .agg(min(col("rank")).as("__fr"))
      .agg(coalesce(sum(expr("1000000L div CAST(__fr AS BIGINT)")),
        lit(0L)).as("__sum"))
      .select(lit(nQueries).as("n_queries"),
        floor(col("__sum").cast("double") /
          lit(nQueries).cast("double")).cast("long").as("mrr_q"))
  }

  /** nDCG@k per query over a ranked frame `(query_id, rank, rel)` with
    * binary relevance: gain at rank i is ⌊10⁶/log₂(1+i)⌋ — quantized
    * PER POSITION then summed as longs, so DCG and the ideal DCG
    * (first `min(nRel, k)` positions) are partition-order-free, and
    * ndcg_q = ⌊10⁶·dcg/idcg⌋ is one exact-long division. Queries with
    * no relevant result in the top k emit ndcg_q = 0.
    *
    * Plan shape: two hash aggregates over ≤ |queries|·k rows plus a
    * broadcast of the k-row ideal-gain prefix table.
    */
  def ndcgAtK(ranked: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k ($k) must be positive")
    val topk = ranked.filter(col("rank") <= k)
    val perQ = topk
      .groupBy(col("query_id"))
      .agg(sum(when(col("rel"),
        expr("CAST(floor(1000000.0 / log2(1 + CAST(rank AS DOUBLE))) AS BIGINT)"))
        .otherwise(0L)).as("dcg_q"),
        sum(when(col("rel"), 1L).otherwise(0L)).as("n_rel"))
    // the ideal DCG uses the IDENTICAL per-position gain expression
    // (same engine log2 ulps), folded over sequence(1, min(nRel, k))
    perQ
      .withColumn("__idcg", when(col("n_rel") > 0, expr(
        s"aggregate(sequence(1, CAST(least(n_rel, ${k}L) AS INT)), 0L, " +
          "(acc, i) -> acc + CAST(floor(1000000.0 " +
          "/ log2(1 + CAST(i AS DOUBLE))) AS BIGINT))")))
      .select(col("query_id"), col("n_rel"), col("dcg_q"),
        when(col("n_rel") > 0,
          floor(lit(1000000.0) * col("dcg_q").cast("double") /
            col("__idcg").cast("double")).cast("long"))
          .otherwise(lit(0L)).as("ndcg_q"))
  }

  /** Calibration table + expected calibration error for a quantized
    * [0,1] confidence score (⌊10⁶·p⌋ longs) against a binary label:
    * ten fixed-width confidence deciles, each with count, positives,
    * and confidence mass; ECE reduces to PURE INTEGER arithmetic —
    *
    *   ece_q = ⌊ Σ_b |10⁶·pos_b − Σconf_b| / N ⌋
    *
    * (since Σ (n_b/N)·|acc_b − conf_b| has the common denominator
    * 10⁶·N), so the metric is engine-exact with no float anywhere.
    * The per-bucket rows carry the same integers for the reliability
    * diagram.
    */
  def calibration(df: DataFrame, scoreQCol: String,
                  labelCol: Column): DataFrame = {
    val base = df.filter(col(scoreQCol).isNotNull)
      .select(col(scoreQCol).cast("long").as("__s"),
        when(labelCol, 1L).otherwise(0L).as("__y"))
      .withColumn("bucket",
        least(expr("__s div 100000L"), lit(9L)))
    val buckets = base.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("pos"),
        sum(col("__s")).as("conf_sum_q"))
    val tot = buckets.agg(sum(col("n")).as("__nt"),
      sum(abs(lit(1000000L) * col("pos") - col("conf_sum_q")))
        .as("__num"))
    buckets.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n"), col("pos"), col("conf_sum_q"),
        expr("__num div __nt").as("ece_q"))
  }

  /** Per-class classification report: confusion counts plus quantized
    * precision/recall/F1 from exact longs. `truthCol`/`predCol` are
    * label strings; one hash aggregate over the (truth, pred) grid
    * (classes², tiny), margins derived from it.
    */
  def classReport(df: DataFrame, truthCol: String,
                  predCol: String): DataFrame = {
    val cm = df.groupBy(col(truthCol).as("truth"), col(predCol).as("pred"))
      .agg(count(lit(1)).as("n"))
      .mat
    val byTruth = cm.groupBy(col("truth")).agg(sum(col("n")).as("n_truth"))
    val byPred = cm.groupBy(col("pred")).agg(sum(col("n")).as("n_pred"))
    val tp = cm.filter(col("truth") === col("pred"))
      .select(col("truth").as("label"), col("n").as("tp"))
    val p = col("tp").cast("double") / col("n_pred").cast("double")
    val r = col("tp").cast("double") / col("n_truth").cast("double")
    byTruth.select(col("truth").as("label"), col("n_truth"))
      .join(byPred.select(col("pred").as("label"), col("n_pred")), Seq("label"), "outer")
      .join(tp, Seq("label"), "left")
      .select(col("label"),
        coalesce(col("n_truth"), lit(0L)).as("n_truth"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("tp"), lit(0L)).as("tp"))
      .withColumn("prec_q", when(col("n_pred") > 0,
        floor(lit(1000000.0) * col("tp").cast("double") /
          col("n_pred").cast("double")).cast("long")))
      .withColumn("rec_q", when(col("n_truth") > 0,
        floor(lit(1000000.0) * col("tp").cast("double") /
          col("n_truth").cast("double")).cast("long")))
      .withColumn("f1_q", when(col("n_pred") > 0 && col("n_truth") > 0 &&
        (p + r) > 0,
        floor(lit(1000000.0) * lit(2.0) * p * r / (p + r)).cast("long")))
  }

  def aucExact(df: DataFrame, scoreCol: String, labelCol: Column): DataFrame = {
    val perScore = df
      .filter(col(scoreCol).isNotNull)
      .select(col(scoreCol).cast("long").as("s"),
        when(labelCol, 1L).otherwise(0L).as("y"))
      .groupBy(col("s"))
      .agg(sum(col("y")).as("p_s"),
        sum(lit(1L) - col("y")).as("n_s"))
    val w = Window.orderBy(col("s").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    perScore
      .withColumn("__nb", coalesce(sum(col("n_s")).over(w), lit(0L)))
      .agg(sum(col("p_s")).as("p"), sum(col("n_s")).as("n"),
        sum(col("p_s") * (lit(2L) * col("__nb") + col("n_s")))
          .as("__num2"))
      .select(col("p"), col("n"),
        when(col("p") > 0 && col("n") > 0,
          floor(lit(1000000.0) * col("__num2").cast("double") /
            (lit(2.0) * col("p").cast("double") * col("n").cast("double")))
            .cast("long")).as("auc_q"))
  }

  /** AUC with the Hanley–McNeil (1982) standard error and a 95 %
    * normal-approximation confidence interval — the error bar
    * [[aucExact]] doesn't carry ("AUC 0.71" means nothing without
    * knowing if it's ±0.01 or ±0.2). From the same exact integers
    * (doubled Mann–Whitney numerator U2, n_pos, n_neg), with
    * A = U2/(2·n_pos·n_neg), Q1 = A/(2−A), Q2 = 2A²/(1+A),
    *
    *   se² = (A(1−A) + (n_pos−1)(Q1−A²) + (n_neg−1)(Q2−A²))
    *         / (n_pos·n_neg)
    *
    * and the CI is A ± 1.96·se, clamped to [0, 1]. The whole chain
    * after the exact aggregate is ONE fixed-order fp sequence on
    * exact-integer-valued doubles — engine-identical.
    *
    * Plan: identical to [[aucExact]] — one hash agg to the score
    * grid, one window over the DISTINCT scores, one scalar agg.
    */
  def aucCi(df: DataFrame, scoreCol: String, labelCol: Column): DataFrame = {
    val perScore = df
      .filter(col(scoreCol).isNotNull)
      .select(col(scoreCol).cast("long").as("s"),
        when(labelCol, 1L).otherwise(0L).as("y"))
      .groupBy(col("s"))
      .agg(sum(col("y")).as("p_s"),
        sum(lit(1L) - col("y")).as("n_s"))
    val w = Window.orderBy(col("s").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val agg = perScore
      .withColumn("__nb", coalesce(sum(col("n_s")).over(w), lit(0L)))
      .agg(sum(col("p_s")).as("n_pos"), sum(col("n_s")).as("n_neg"),
        sum(col("p_s") * (lit(2L) * col("__nb") + col("n_s"))).as("u2"))
    val p = col("n_pos").cast("double"); val n = col("n_neg").cast("double")
    val a = col("u2").cast("double") / (lit(2.0) * p * n)
    val q1 = a / (lit(2.0) - a)
    val q2 = lit(2.0) * a * a / (lit(1.0) + a)
    val se = sqrt((a * (lit(1.0) - a) +
      (p - lit(1.0)) * (q1 - a * a) +
      (n - lit(1.0)) * (q2 - a * a)) / (p * n))
    val ok = col("n_pos") > 0 && col("n_neg") > 0
    agg.select(col("n_pos"), col("n_neg"), col("u2"),
      when(ok, floor(lit(1000000.0) * a).cast("long")).as("auc_q"),
      when(ok, floor(lit(1000000.0) * se).cast("long")).as("se_q"),
      when(ok, floor(lit(1000000.0) *
        greatest(a - lit(1.96) * se, lit(0.0))).cast("long")).as("lo_q"),
      when(ok, floor(lit(1000000.0) *
        least(a + lit(1.96) * se, lit(1.0))).cast("long")).as("hi_q"))
  }

  /** Split-conformal prediction interval half-width per group
    * (Vovk et al.; Lei et al. 2018 §2): given held-out calibration
    * rows with integer truth `yCol` and integer prediction `predCol`,
    * the (1−α) interval is ŷ ± q̂ where q̂ is the
    * ⌈(1−α)(n+1)⌉-th smallest absolute residual — a finite-sample
    * coverage GUARANTEE with no distributional assumption, the right
    * error bar for quality-score regressors in a curation pipeline.
    *
    * α = alphaNum/alphaDen rational, so the order-statistic index
    * k = ⌈(alphaDen−alphaNum)(n+1)/alphaDen⌉ is exact integer
    * arithmetic; q̂ is selected from the per-group DISTINCT-residual
    * grid with one bounded window (the [[graft.operators.Stats]]
    * value-grid device — no per-row sort). q̂ is null when k > n
    * (n too small for the requested coverage — the honest answer).
    *
    * @return one row per group (group, n_cal, k_rank, qhat)
    */
  def conformalInterval(df: DataFrame, groupCol: String, yCol: String,
                        predCol: String, alphaNum: Int,
                        alphaDen: Int): DataFrame = {
    require(alphaDen > 0 && alphaNum > 0 && alphaNum < alphaDen,
      s"alpha = $alphaNum/$alphaDen must be in (0, 1)")
    val gv = df.select(col(groupCol).as("__g"),
        abs(col(yCol).cast("long") - col(predCol).cast("long")).as("__r"))
      .na.drop()
      .groupBy(col("__g"), col("__r")).agg(count(lit(1)).as("__c"))
    val wCum = Window.partitionBy(col("__g")).orderBy(col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("__g"))
    gv
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__n", sum(col("__c")).over(wAll))
      .withColumn("__k",
        expr(s"(${alphaDen - alphaNum}L * (__n + 1L) + ${alphaDen}L - 1L)" +
          s" div ${alphaDen}L"))
      .groupBy(col("__g").as(groupCol))
      .agg(first(col("__n")).as("n_cal"), first(col("__k")).as("k_rank"),
        min(when(col("__cum") >= col("__k"), col("__r"))).as("qhat"))
      .withColumn("qhat",
        when(col("k_rank") <= col("n_cal"), col("qhat")))
  }

  /** Cohen's κ between two categorical raters — chance-corrected
    * agreement for label-quality audits (heuristic labeler vs. gold
    * labels, or two annotation pipelines): κ = (p_o − p_e)/(1 − p_e).
    *
    * Everything up to ONE double division is exact long arithmetic:
    * with N rows, A agreements, and S = Σ_c rowMarg_c·colMarg_c,
    *   κ = (N·A − S)/(N² − S)
    * so ⌊10⁶·κ⌋ is engine-identical. κ is null when p_e = 1 (both
    * raters constant — agreement is all chance).
    *
    * Plan shape: one hash aggregate to the |A-labels|×|B-labels|
    * confusion matrix; the marginal products are computed over that
    * bounded table, never the corpus.
    */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cm = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("n"))
    val margA = cm.groupBy(col("a")).agg(sum(col("n")).as("na"))
    val margB = cm.groupBy(col("b")).agg(sum(col("n")).as("nb"))
    val s = margA.join(margB, col("a") === col("b"))
      .agg(coalesce(sum(col("na") * col("nb")), lit(0L)).as("s"))
    cm.agg(sum(col("n")).as("n_rows"),
        sum(when(col("a") === col("b"), col("n")).otherwise(0L)).as("agree"))
      .crossJoin(broadcast(s))
      .select(col("n_rows"), col("agree"), col("s").as("marg_prod"),
        when(col("n_rows") * col("n_rows") =!= col("s"),
          floor(lit(1000000.0) *
            (col("n_rows") * col("agree") - col("s")).cast("double") /
            (col("n_rows") * col("n_rows") - col("s")).cast("double"))
            .cast("long")).as("kappa_q"))
  }

  /** Pooled two-proportion z-test over a 0/1 variant assignment — the
    * A/B significance read-out over an event-derived conversion flag.
    *
    * All counts are exact longs; the z statistic is a fixed sequence
    * of double ops from those longs (two rate divisions, the pooled
    * rate, one sqrt — IEEE-exact and identically ordered in the
    * oracle), quantized to ⌊10⁶·z⌋. `significant` derives from the
    * QUANTIZED value (|z_q| ≥ 1 960 000), so the flag can never
    * disagree with the printed statistic across engines.
    *
    * Plan shape: one corpus aggregate to four longs; everything else
    * is scalar.
    */
  def twoProportionZ(df: DataFrame, variantCol: String,
                     convCol: String): DataFrame = {
    val agg = df.agg(
      sum(when(col(variantCol) === 0, 1L).otherwise(0L)).as("n0"),
      sum(when(col(variantCol) === 0 && col(convCol), 1L).otherwise(0L)).as("c0"),
      sum(when(col(variantCol) === 1, 1L).otherwise(0L)).as("n1"),
      sum(when(col(variantCol) === 1 && col(convCol), 1L).otherwise(0L)).as("c1"))
    val p0 = col("c0").cast("double") / col("n0").cast("double")
    val p1 = col("c1").cast("double") / col("n1").cast("double")
    val ph = (col("c0") + col("c1")).cast("double") /
      (col("n0") + col("n1")).cast("double")
    val se = sqrt(ph * (lit(1.0) - ph) *
      (lit(1.0) / col("n0").cast("double") + lit(1.0) / col("n1").cast("double")))
    agg.select(col("n0"), col("c0"), col("n1"), col("c1"),
        when(col("n0") > 0 && col("n1") > 0 && se > 0,
          floor(lit(1000000.0) * (p1 - p0) / se).cast("long")).as("z_q"))
      .withColumn("significant",
        when(col("z_q").isNotNull, abs(col("z_q")) >= 1960000L))
  }

  /** Rank-biased overlap (Webber et al. 2010) between two top-k
    * rankings per query, reported PER DEPTH: at each depth d ≤ k, the
    * prefix overlap |A₁..d ∩ B₁..d| and that depth's RBO term
    *
    *   term(d) = (1−p)·p^(d−1) · overlap(d)/d     with p = 1/2
    *
    * so Σ_d term(d) is the (truncated) RBO. Per-depth rows instead of
    * the scalar sum keep every fp op order-free: overlap/d is one
    * exact-integer division, and the weight (1−p)p^(d−1) = 2^(−d) is
    * computed as 1.0/(1<<d) — an EXACT power of two, not a `pow()`
    * call whose libm rounding could differ between engines. p = 1/2
    * is fixed for exactly that reason.
    *
    * An item contributes to the overlap from depth max(rank_A, rank_B)
    * on — so the overlap curve is the cumulative count of intersection
    * items by that entry depth. Plan shape: one equi-join of the two
    * (query, item) rank frames, a bounded per-query depth explode
    * (k rows), one cumulative window whose partitions are k rows —
    * nothing scales with the corpus, only with queries·k.
    *
    * Inputs: `a`, `b` with (query_id, rank, item); ranks 1-based,
    * ties already broken. Rows with rank > k are ignored.
    */
  def rboByDepth(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    require(k > 0 && k <= 62, s"k ($k) must be in [1, 62]")
    val ar = a.filter(col("rank") <= k)
      .select(col("query_id"), col("item"), col("rank").as("__ra"))
    val br = b.filter(col("rank") <= k)
      .select(col("query_id"), col("item"), col("rank").as("__rb"))
    val entry = ar.join(br, Seq("query_id", "item"))
      .select(col("query_id"),
        greatest(col("__ra"), col("__rb")).cast("long").as("__entry"))
      .groupBy(col("query_id"), col("__entry"))
      .agg(count(lit(1)).as("__c"))
    val depths = a.select(col("query_id")).union(b.select(col("query_id")))
      .distinct()
      .withColumn("depth", explode(sequence(lit(1L), lit(k.toLong))))
    val w = Window.partitionBy(col("query_id")).orderBy(col("depth"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    depths.join(entry,
        depths("query_id") === entry("query_id") &&
          col("depth") === col("__entry"), "left")
      .select(depths("query_id"), col("depth"),
        coalesce(col("__c"), lit(0L)).as("__c"))
      .withColumn("overlap", sum(col("__c")).over(w))
      .withColumn("rbo_term_q",
        floor(lit(1000000000.0) * col("overlap").cast("double") /
          col("depth").cast("double") /
          expr("shiftleft(1L, CAST(depth AS INT))").cast("double"))
          .cast("long"))
      .select(col("query_id"), col("depth"), col("overlap"), col("rbo_term_q"))
  }

  /** Exact average precision of an integer score against a binary
    * label, ranked by (score DESC, id ASC) — the trec_eval tie-break
    * (a deterministic total order; the tie-free cousin of [[aucExact]],
    * which instead folds ties into the closed ½ form).
    *
    *   AP = (Σ_{k : rel(k)} ⌊10¹²·TP(k)/k⌋) div P
    *
    * quantized per HIT so the sum is partition-order free.
    *
    * Plan shape — no global sort: rank(k) decomposes as
    * (rows at strictly higher scores) + (tied rows at smaller ids) + 1.
    * The first addend lives on the bounded distinct-score grid (hash
    * agg + one window over grid rows); the second is a window
    * PARTITIONED BY score (block-bounded), never a single-partition
    * global window.
    *
    * @return one row (n_pos, n_neg, ap_q)
    */
  def averagePrecision(df: DataFrame, idCol: String, scoreCol: String,
                       labelCol: Column): DataFrame = {
    // base feeds the score grid AND the per-row join below — two
    // non-identical subtrees AQE cannot stage-share — and scoreCol is
    // often a computed text feature (q212 scores every document), so
    // materialize the narrow (id, score, label) projection once
    // (guide §2.4; three fixed-width columns, linear at any scale)
    val base = df.filter(col(scoreCol).isNotNull)
      .select(col(idCol).as("__id"), col(scoreCol).cast("long").as("__s"),
        when(labelCol, 1L).otherwise(0L).as("__y"))
      .mat
    val grid = base.groupBy(col("__s"))
      .agg(count(lit(1)).as("__n"), sum(col("__y")).as("__p"))
    val wg = Window.orderBy(col("__s").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cums = grid
      .withColumn("__nAbove", coalesce(sum(col("__n")).over(wg), lit(0L)))
      .withColumn("__pAbove", coalesce(sum(col("__p")).over(wg), lit(0L)))
      .select(col("__s"), col("__nAbove"), col("__pAbove"))
    val wb = Window.partitionBy(col("__s")).orderBy(col("__id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(cums, Seq("__s"))
      .withColumn("__kInBlock", count(lit(1)).over(wb))
      .withColumn("__tpInBlock", sum(col("__y")).over(wb))
      .select(col("__y"),
        (col("__nAbove") + col("__kInBlock")).as("__k"),
        (col("__pAbove") + col("__tpInBlock")).as("__tp"))
      .agg(sum(col("__y")).as("n_pos"),
        (count(lit(1)) - sum(col("__y"))).as("n_neg"),
        // decimal accumulator: 10¹² per hit × corpus-scale hit counts
        // passes long range
        sum(when(col("__y") === 1,
          floor(lit(1.0e12) * col("__tp").cast("double") /
            col("__k").cast("double")).cast("decimal(38,0)"))
          .otherwise(lit(0L).cast("decimal(38,0)"))).as("__sum_q"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0, expr("__sum_q div n_pos")).as("ap_q"))
  }

  /** Murphy decomposition of the Brier score over the [[calibration]]
    * bucketing: BS = reliability − resolution + uncertainty, each term
    * engine-exact. The raw Brier sum Σ(s_q − 10⁶·y)² is an exact
    * integer (scores live on the 10⁶ grid), so `brier_q` ≡ ⌊10¹²·BS⌋
    * = Σ div N with NO float anywhere; the three decomposition terms
    * quantize one fixed-order double expression per BUCKET (≤ 10
    * buckets) and sum as longs.
    *
    * @return one row (n, pos, brier_q, reliability_q, resolution_q,
    *         uncertainty_q) — all on the 10¹² grid
    */
  def brierDecomposition(df: DataFrame, scoreQCol: String,
                         labelCol: Column): DataFrame = {
    val base = df.filter(col(scoreQCol).isNotNull)
      .select(col(scoreQCol).cast("long").as("__s"),
        when(labelCol, 1L).otherwise(0L).as("__y"))
      .withColumn("__bucket", least(expr("__s div 100000L"), lit(9L)))
    val buckets = base.groupBy(col("__bucket"))
      .agg(count(lit(1)).as("__n"), sum(col("__y")).as("__pos"),
        sum(col("__s")).as("__conf_q"),
        // decimal accumulator: ≤10¹² per row × corpus rows passes long
        sum(((col("__s") - lit(1000000L) * col("__y")) *
          (col("__s") - lit(1000000L) * col("__y"))).cast("decimal(38,0)"))
          .as("__sq"))
      .mat // ≤10-row grid feeds two subtrees
    val tot = buckets.agg(sum(col("__n")).as("__nt"), sum(col("__pos")).as("__post"),
      sum(col("__sq")).as("__sqt"))
    val pbarMinusObar = col("__conf_q").cast("double") / (col("__n").cast("double") * lit(1000000.0)) -
      col("__pos").cast("double") / col("__n").cast("double")
    val obarMinusO = col("__pos").cast("double") / col("__n").cast("double") -
      col("__post").cast("double") / col("__nt").cast("double")
    val perBucket = buckets.crossJoin(broadcast(tot))
      .select(col("__n"), col("__pos"), col("__nt"), col("__post"), col("__sqt"),
        floor(lit(1.0e12) * col("__n").cast("double") * pbarMinusObar * pbarMinusObar /
          col("__nt").cast("double")).cast("long").as("__rel_q"),
        floor(lit(1.0e12) * col("__n").cast("double") * obarMinusO * obarMinusO /
          col("__nt").cast("double")).cast("long").as("__res_q"))
    val obar = col("__post").cast("double") / col("__nt").cast("double")
    perBucket
      .groupBy(col("__nt"), col("__post"), col("__sqt"))
      .agg(sum(col("__n")).as("n"), sum(col("__pos")).as("pos"),
        sum(col("__rel_q")).as("reliability_q"),
        sum(col("__res_q")).as("resolution_q"))
      .select(col("n"), col("pos"),
        expr("__sqt div __nt").as("brier_q"),
        col("reliability_q"), col("resolution_q"),
        floor(lit(1.0e12) * obar * (lit(1.0) - obar)).cast("long")
          .as("uncertainty_q"))
  }

  /** Adjusted Rand index between two partitions of the same items
    * (truth labels vs predicted labels, exact-dup clusters vs
    * near-dup clusters): chance-corrected pair-counting agreement,
    * computed ENTIRELY from the contingency grid with exact integers —
    *
    *   ARI = (Σᵢⱼ C(nᵢⱼ,2) − E) / (½(Σᵢ C(aᵢ,2)+Σⱼ C(bⱼ,2)) − E),
    *   E = Σᵢ C(aᵢ,2)·Σⱼ C(bⱼ,2) / C(n,2)
    *
    * Cross-multiplied to integer numerator/denominator (decimal — pair
    * counts square the corpus), ONE double division → ⌊10⁶·⌋. The
    * partition-agreement audit κ can't give: κ compares LABELS
    * pointwise and needs them aligned; ARI compares the induced
    * co-membership relation, so the two labelings may use entirely
    * different names.
    *
    * @return one row (n_items, index_q = ⌊10⁶·RI⌋, ari_q = ⌊10⁶·ARI⌋;
    *         ari null when the denominator is 0 — both partitions
    *         all-singletons or one-cluster)
    */
  def adjustedRand(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val d = (c: Column) => c.cast("decimal(38,0)")
    val c2 = (c: Column) => (d(c) * (d(c) - 1)) / 2
    val grid = df.select(col(aCol).as("__a"), col(bCol).as("__b"))
      .na.drop()
      .groupBy(col("__a"), col("__b")).agg(count(lit(1)).as("__n"))
      .mat
    val cells = grid.agg(sum(c2(col("__n"))).as("__sij"),
      sum(col("__n")).as("__nn"))
    val aMarg = grid.groupBy(col("__a")).agg(sum(col("__n")).as("__na"))
      .agg(sum(c2(col("__na"))).as("__sa"))
    val bMarg = grid.groupBy(col("__b")).agg(sum(col("__n")).as("__nb"))
      .agg(sum(c2(col("__nb"))).as("__sb"))
    cells.crossJoin(aMarg).crossJoin(bMarg)
      .select(col("__nn").as("n_items"),
        col("__sij"), col("__sa"), col("__sb"),
        c2(col("__nn")).as("__t"))
      // RI from the same quantities: agreements = t + 2·sij − sa − sb
      .select(col("n_items"),
        when(col("__t") > 0,
          floor(lit(1000000.0) *
            (col("__t") + lit(2) * col("__sij") - col("__sa") - col("__sb"))
              .cast("double") / col("__t").cast("double")).cast("long"))
          .as("index_q"),
        when((col("__sa") + col("__sb")) * col("__t") =!=
          lit(2) * col("__sa") * col("__sb"),
          floor(lit(1000000.0) *
            (col("__sij") * col("__t") - col("__sa") * col("__sb"))
              .cast("double") /
            (((col("__sa") + col("__sb")) * col("__t") -
              lit(2) * col("__sa") * col("__sb")) / 2).cast("double"))
            .cast("long")).as("ari_q"))
  }

  /** Expected reciprocal rank at k over a ranked `(query_id, rank,
    * rel)` frame with BINARY relevance mapped to stop-probability ½ —
    * the cascade-model ranking metric (a relevant hit at rank r only
    * counts if the user got past the earlier hits):
    *
    *   ERR = Σ_r (1/r)·R_r·Π_{i<r}(1−R_i),  R_r ∈ {0, ½}
    *
    * With binary-½ relevance every term is the EXACT dyadic rational
    * 1/(2^{m_r+1}·r) (m_r = relevant hits before r), so scaling by
    * S = 2^k·lcm(1..k) makes the per-query sum an exact integer and
    * err_q = (10¹²·err_s) div S — ZERO floating point in the whole
    * metric, bit-identical anywhere.
    *
    * Plan: one window per query over ≤ k rows (rank-bounded), one agg.
    */
  def errAtK(ranked: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= 20, s"k ($k) must be in [1, 20]")
    val lcm = (1 to k).map(BigInt(_)).reduce((a, b) => a * b / a.gcd(b))
    val scale = (BigInt(1) << k) * lcm
    require(scale.isValidLong, s"scale $scale exceeds long")
    val w = Window.partitionBy(col("query_id")).orderBy(col("rank").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    ranked.filter(col("rank") <= k)
      .withColumn("__m",
        coalesce(sum(when(col("rel"), 1L).otherwise(0L)).over(w), lit(0L)))
      .withColumn("__den",
        expr("shiftleft(1L, CAST(__m + 1 AS INT))") *
          col("rank").cast("long"))
      .withColumn("__term",
        when(col("rel"), expr(s"${scale.toLong}L div __den"))
          .otherwise(lit(0L)))
      .groupBy(col("query_id"))
      .agg(sum(col("__term")).as("__err_s"))
      .select(col("query_id"),
        // dec38: 10¹²·__err_s wraps int64 once scale > ~9.2e6 (deeper k
        // or a larger grade lcm than the shipped k=5 config)
        expr(s"(CAST(1000000000000 AS DECIMAL(38,0)) * __err_s) div ${scale.toLong}L")
          .as("err_q"))
  }

  /** Matthews correlation coefficient of a binary prediction against a
    * binary truth — the single-number confusion summary that stays
    * honest under class imbalance (accuracy and F1 both saturate when
    * one class dominates, which a filtered corpus always has):
    *
    *   MCC = (TP·TN − FP·FN) / √((TP+FP)(TP+FN)(TN+FP)(TN+FN))
    *
    * Exact long counts from one hash agg; products in decimal (corpus
    * scale squares 10¹⁸); ONE sqrt+divide on the exact integers →
    * ⌊10⁶·⌋ engine-identical. Null when any margin is zero (MCC
    * undefined — the degenerate all-one-class case).
    *
    * @return one row (tp, fp, tn, fn, mcc_q)
    */
  def mcc(df: DataFrame, predCol: Column, truthCol: Column): DataFrame = {
    val d = (c: Column) => c.cast("decimal(38,0)")
    val counts = df.agg(
      sum(when(predCol && truthCol, 1L).otherwise(0L)).as("tp"),
      sum(when(predCol && !truthCol, 1L).otherwise(0L)).as("fp"),
      sum(when(!predCol && !truthCol, 1L).otherwise(0L)).as("tn"),
      sum(when(!predCol && truthCol, 1L).otherwise(0L)).as("fn"))
    // pairwise exact decimal products (≤ N² each — a four-way product
    // would pass decimal(38) at corpus margins), ONE double multiply
    // between them, mirrored operand order in the oracle
    val denL = (d(col("tp")) + col("fp")) * (d(col("tp")) + col("fn"))
    val denR = (d(col("tn")) + col("fp")) * (d(col("tn")) + col("fn"))
    counts.select(col("tp"), col("fp"), col("tn"), col("fn"),
      when(denL > 0 && denR > 0,
        floor(lit(1000000.0) *
          (d(col("tp")) * col("tn") - d(col("fp")) * col("fn"))
            .cast("double") /
          sqrt(denL.cast("double") * denR.cast("double"))).cast("long"))
        .as("mcc_q"))
  }

  /** Fleiss' kappa for R raters × N items over a categorical rating
    * frame `(item, rating)` with EXACTLY `raters` rows per item —
    * multi-rater chance-corrected agreement ([[cohenKappa]] handles
    * the 2-rater case). All sums are exact integers:
    *
    *   P̄  = Σ_i (Σ_c n_ic² − R) / (N·R·(R−1))
    *   P_e = Σ_c (Σ_i n_ic)²    / (N·R)²
    *   κ   = (P̄ − P_e) / (1 − P_e)
    *
    * with the final κ ONE double division of exact decimal numerators
    * (cross-multiplied to a common denominator) — engine-identical.
    *
    * Plan shape: one hash agg to the (item, category) grid, one per
    * item, one per category, three scalar rows broadcast together.
    */
  def fleissKappa(ratings: DataFrame, itemCol: String, ratingCol: String,
                  raters: Int): DataFrame = {
    require(raters >= 2, s"raters ($raters) must be >= 2")
    val d = (c: Column) => c.cast("decimal(38,0)")
    val grid = ratings.groupBy(col(itemCol).as("__i"), col(ratingCol).as("__c"))
      .agg(count(lit(1)).as("__n"))
      .mat
    val perItem = grid.groupBy(col("__i"))
      .agg(sum(col("__n") * col("__n")).as("__ssq"))
      .agg(count(lit(1)).as("__ni"),
        sum(d(col("__ssq")) - lit(raters)).as("__pbar_num"))
    val perCat = grid.groupBy(col("__c"))
      .agg(sum(col("__n")).as("__nc"))
      .agg(sum(d(col("__nc")) * d(col("__nc"))).as("__pe_num"))
    perItem.crossJoin(perCat)
      .select(col("__ni").as("n_items"), lit(raters).as("n_raters"),
        col("__pbar_num"), col("__pe_num"),
        (d(col("__ni")) * lit(raters) * lit(raters - 1)).as("__pbar_den"),
        (d(col("__ni")) * d(col("__ni")) * lit(raters) * lit(raters)).as("__pe_den"))
      .select(col("n_items"), col("n_raters"),
        floor(lit(1.0e12) * col("__pbar_num").cast("double") /
          col("__pbar_den").cast("double")).cast("long").as("pbar_q"),
        floor(lit(1.0e12) * col("__pe_num").cast("double") /
          col("__pe_den").cast("double")).cast("long").as("pe_q"),
        when(col("__pe_num") =!= col("__pe_den"),
          floor(lit(1.0e12) *
            (col("__pbar_num") * col("__pe_den") -
              col("__pe_num") * col("__pbar_den")).cast("double") /
            (col("__pbar_den") * (col("__pe_den") - col("__pe_num")))
              .cast("double")).cast("long")).as("kappa_q"))
  }

  /** McNemar's paired test for two binary classifiers scored on the
    * SAME items ("is the new quality filter actually different from
    * the old one, on the cases where they disagree"): only the
    * discordant counts matter —
    *
    *   b = #(A right, B wrong),  c = #(A wrong, B right)
    *   stat_q = (10⁶ · (b − c)²) div (b + c)
    *
    * — a PURE integer statistic (one hash agg over the corpus, one
    * exact integer division), null when the classifiers never
    * disagree. No continuity correction (the exact integer form is
    * the reproducibility contract; the correction is a calibration
    * choice layered on top by the caller).
    *
    * @return one row (n, both_right, both_wrong, b, c, stat_q)
    */
  def mcnemar(df: DataFrame, predA: Column, predB: Column,
              truth: Column): DataFrame = {
    val aOk = (predA === truth).cast("long")
    val bOk = (predB === truth).cast("long")
    df.agg(count(lit(1)).as("n"),
        sum(aOk * bOk).as("both_right"),
        sum((lit(1L) - aOk) * (lit(1L) - bOk)).as("both_wrong"),
        sum(aOk * (lit(1L) - bOk)).as("b"),
        sum((lit(1L) - aOk) * bOk).as("c"))
      .select(col("n"), col("both_right"), col("both_wrong"),
        col("b"), col("c"),
        when(col("b") + col("c") > 0,
          // dec38: 10⁶·(b−c)² wraps int64 once the discordant-count gap
          // passes ~3e6 rows — an ordinary corpus size, not an edge case
          expr("(CAST(1000000 AS DECIMAL(38,0)) * (b - c) * (b - c)) div (b + c)"))
          .as("stat_q"))
  }

  /** Decile (or n-bin) lift table of an integer score against a binary
    * label — the targeting diagnostic ("how concentrated are the
    * positives in the top scores"): rows ranked by (score DESC, tie
    * columns ASC) via the exact bucket-offset rank (NO global sort —
    * [[Quantiles.exactRanks]] device), bin = ((rank−1)·bins) div N,
    * and per bin
    *
    *   rate_q     = (10⁶ · pos) div n
    *   cum_lift_q = (10⁶ · cumPos · N) div (cumN · totPos)
    *
    * — every number an exact integer ratio of exact longs: the whole
    * table is engine-identical, no floating point anywhere.
    *
    * Plan: one rank pass (hash agg + broadcast offsets + per-bucket
    * window), one hash agg to `bins` rows, one window over the
    * bins-bounded frame for the cumulative sums.
    *
    * @return (bin, n, positives, rate_q, cum_lift_q) — bin 0 = highest scores
    */
  def liftTable(df: DataFrame, scoreCol: String, label: Column,
                bins: Int, tieCols: Seq[String]): DataFrame = {
    require(bins >= 2, s"bins ($bins) must be >= 2")
    val base = df.withColumn("__lbl", label.cast("long"))
      .withColumn("__neg", -col(scoreCol).cast("long"))
      .withColumn("__const_g", lit("all"))
    val ranked = Quantiles.exactRanks(base, "__const_g", "__neg",
      bucketWidth = 1000L, tieCols = tieCols)
    val binned = ranked
      .withColumn("bin", expr(s"((rank - 1) * ${bins}L) div grp_n"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__lbl")).as("positives"),
        max(col("grp_n")).as("__N"))
    val w = Window.orderBy(col("bin").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    binned
      .withColumn("__cumN", sum(col("n")).over(w))
      .withColumn("__cumP", sum(col("positives")).over(w))
      .withColumn("__totP", sum(col("positives")).over(
        Window.orderBy(col("bin").asc).rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("bin"), col("n"), col("positives"),
        expr("(CAST(1000000 AS DECIMAL(38,0)) * positives) div n")
          .as("rate_q"),
        when(col("__totP") > 0,
          // dec38 BOTH sides: 10⁶·cumP·N and cumN·totP are count×count
          // products that wrap int64 past ~3e6 / ~3e9 rows respectively
          expr("(CAST(1000000 AS DECIMAL(38,0)) * __cumP * __N) div " +
            "(CAST(__cumN AS DECIMAL(38,0)) * __totP)"))
          .otherwise(lit(0L)).as("cum_lift_q"))
  }

  /** Isotonic (monotone nondecreasing) calibration fit over
    * pre-bucketed scores — the non-parametric recalibration map
    * ([[calibration]] DIAGNOSES miscalibration; this REPAIRS it):
    * per score bin b, the fitted positive-rate is the PAVA solution
    * expressed in its closed minimax form,
    *
    *   fit(k) = max_{i ≤ k} min_{j ≥ k} rate(i..j),
    *
    * with segment rates quantized once (⌊10⁶·pos/n⌋) so every min/max
    * compares exact longs — bit-reproducible on any engine, and still
    * provably monotone (the minimax is nondecreasing in k for ANY
    * segment function: larger k widens the max's i-range and narrows
    * the min's j-range).
    *
    * Plan: one hash aggregate to the B bins, then a B×B broadcast
    * self-grid with two windows whose partitions hold ≤ B rows. B is
    * fixed by the caller's bucketing (20 here), so the grid is
    * CONSTANT-size however large the input — the whole fit after the
    * first aggregate is driver-scale work done distributed-safe.
    */
  def isotonicFit(df: DataFrame, binCol: String, label: Column): DataFrame = {
    val bins = df.filter(col(binCol).isNotNull)
      .select(col(binCol).cast("long").as("b"),
        when(label, 1L).otherwise(0L).as("__y"))
      .groupBy(col("b"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("pos"))
      .mat
    // single-partition windows are safe: the frame is the B-row bin
    // table, bounded by the caller's bucketing, never the input
    val wPre = Window.orderBy(col("b").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = bins.select(col("b"), col("n"), col("pos"),
      sum(col("n")).over(wPre).as("__cn"),
      sum(col("pos")).over(wPre).as("__cp"))
    val lo = pre.select(col("b").as("i"),
      (col("__cn") - col("n")).as("__cn0"),
      (col("__cp") - col("pos")).as("__cp0"))
    val hi = pre.select(col("b").as("j"),
      col("__cn").as("__cnj"), col("__cp").as("__cpj"))
    val seg = lo.crossJoin(broadcast(hi)).filter(col("i") <= col("j"))
      .select(col("i"), col("j"),
        floor(lit(1000000.0) *
          (col("__cpj") - col("__cp0")).cast("double") /
          (col("__cnj") - col("__cn0")).cast("double")).cast("long")
          .as("__avg_q"))
    val wSuffixMin = Window.partitionBy(col("i")).orderBy(col("j").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wRunMax = Window.partitionBy(col("j")).orderBy(col("i").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fit = seg
      .withColumn("__m", min(col("__avg_q")).over(wSuffixMin))
      .withColumn("__f", max(col("__m")).over(wRunMax))
      .filter(col("i") === col("j"))
      .select(col("i").as("b"), col("__f").as("fit_q"))
    bins.join(fit, Seq("b"))
      .select(col("b"), col("n"), col("pos"), col("fit_q"))
  }

  /** Krippendorff's alpha (nominal) — the agreement coefficient that,
    * unlike [[fleissKappa]], tolerates MISSING ratings: units may have
    * any number of ratings ≥ 2 (units with fewer are excluded, the
    * standard pairable-values rule). The go-to number when annotation
    * batches overlap only partially across raters.
    *
    * With per-unit category counts n_uk, m_u = Σ_k n_uk, pairable
    * total n = Σ_u m_u and category marginals n_k:
    *
    *   Do ∝ Σ_u Σ_k n_uk(m_u − n_uk)/(m_u − 1)
    *   α  = 1 − Do_num·(n − 1) / (S·(n² − Σ_k n_k²))
    *
    * where Do_num = Σ_u (S·Σ_k n_uk(m_u − n_uk)) div (m_u − 1) at the
    * integer scale S = `lcmScale`. EXACT (not just deterministic) when
    * (m_u − 1) divides S for every unit — the default S = 12 covers
    * 2–5 ratings per unit; pass lcm(1..R−1) for larger panels. The
    * division is integer floor-div either way, so the statistic is
    * bit-reproducible on any engine.
    *
    * Plan: one (unit, rating) hash agg, two follow-up aggs (per-unit,
    * per-category) over the bounded grid, one scalar join — the q214
    * shape with a variable-m twist.
    *
    * @return one row (n_units, n_pairable, do_num, de_num, alpha_q)
    */
  def krippendorffAlpha(ratings: DataFrame, itemCol: String,
                        ratingCol: String, lcmScale: Int = 12): DataFrame = {
    require(lcmScale > 0, s"lcmScale ($lcmScale) must be positive")
    val d = (c: Column) => c.cast("decimal(38,0)")
    val grid = ratings
      .groupBy(col(itemCol).as("__i"), col(ratingCol).as("__c"))
      .agg(count(lit(1)).as("__n"))
      .mat
    val units = grid.groupBy(col("__i"))
      .agg(sum(col("__n")).as("__m"),
        sum(col("__n") * col("__n")).as("__ssq"))
      .filter(col("__m") >= 2)
      .mat
    // Σ_k n_uk(m_u − n_uk) = m_u² − Σ_k n_uk²
    val perUnit = units.agg(
      count(lit(1)).as("n_units"),
      sum(col("__m")).as("__npair"),
      sum(expr(s"($lcmScale * (__m * __m - __ssq)) div (__m - 1)"))
        .as("do_num"))
    // category marginals over INCLUDED units only
    val perCat = grid
      .join(units.select(col("__i")), Seq("__i"), "left_semi")
      .groupBy(col("__c")).agg(sum(col("__n")).as("__nc"))
      .agg(sum(d(col("__nc")) * d(col("__nc"))).as("__sncsq"))
    perUnit.crossJoin(perCat)
      .select(col("n_units"), col("__npair").as("n_pairable"),
        col("do_num"),
        (d(col("__npair")) * d(col("__npair")) - col("__sncsq"))
          .as("de_num"))
      .select(col("n_units"), col("n_pairable"), col("do_num"),
        col("de_num").cast("long").as("de_num"),
        when(col("de_num") =!= 0,
          floor(lit(1.0e12) *
            (lit(lcmScale) * col("de_num") -
              d(col("do_num")) * (col("n_pairable") - 1)).cast("double") /
            (lit(lcmScale) * col("de_num")).cast("double")).cast("long"))
          .as("alpha_q"))
  }

  /** Bradley–Terry strength fitting from pairwise comparisons ("which
    * of these two docs would you train on") via `iters` rounds of the
    * MM algorithm (Hunter 2004):
    *
    *   w_i ← W_i / Σ_j (n_ij + n_ji) / (w_i + w_j)
    *
    * with W_i = total wins of i. Integer-quantized at scale 10⁶ so the
    * fixed-iteration fit is bit-reproducible and oracle-replayable
    * (the q195 pagerank contract): each opponent term is the exact
    * integer (pairs_ij·10¹²) div (w_iq + w_jq), and the update is
    * (W_i·10¹²) div D_iq. Items that never win keep w_q = 0 after one
    * round (their MM fixed point); items with no comparisons at all
    * are absent. Bounds: pairs_ij·10¹² and W_i·10¹² must fit int64 —
    * per-PAIR counts below ~9·10⁶, which survey-scale comparison data
    * satisfies by construction (aggregate first if not).
    *
    * Plan: one hash agg to the pairs table (bounded by distinct
    * matchups, never raw comparisons, after the first agg), then per
    * round one join of the broadcast-able strength table and one hash
    * agg — iteration state is items-sized, lineage kept linear with a
    * lazy localCheckpoint per round.
    *
    * @param comparisons frame with `winnerCol`, `loserCol`
    * @return (id, n_wins, n_comparisons, w_q)
    */
  def bradleyTerry(comparisons: DataFrame, winnerCol: String,
                   loserCol: String, iters: Int): DataFrame = {
    require(iters >= 1, s"iters ($iters) must be >= 1")
    val wl = comparisons.select(col(winnerCol).as("__w"),
      col(loserCol).as("__l"))
    val nij = wl.groupBy(col("__w"), col("__l"))
      .agg(count(lit(1)).as("__n"))
      .mat
    // symmetric matchup totals pairs_ij (i as __a, opponent __b)
    val pairs = nij.select(col("__w").as("__a"), col("__l").as("__b"),
        col("__n"))
      .unionByName(nij.select(col("__l").as("__a"), col("__w").as("__b"),
        col("__n")))
      .groupBy(col("__a"), col("__b")).agg(sum(col("__n")).as("__p"))
      .mat
    val wins = nij.groupBy(col("__w").as("__id"))
      .agg(sum(col("__n")).as("__wins"))
    val items = pairs.select(col("__a").as("__id")).distinct()
      .join(wins, Seq("__id"), "left")
      .select(col("__id"), coalesce(col("__wins"), lit(0L)).as("__wins"))
      .mat
    val w0 = items.select(col("__id"), lit(1000000L).as("__wq"))
    val fitted = (1 to iters).foldLeft(w0) { (cur, _) =>
      val d = pairs
        .join(cur.select(col("__id").as("__a"), col("__wq").as("__wa")),
          Seq("__a"))
        .join(cur.select(col("__id").as("__b"), col("__wq").as("__wb")),
          Seq("__b"))
        // dec38: a matchup heavier than ~9.2e6 comparisons wraps
        // __p·10¹² in long arithmetic
        .withColumn("__t",
          expr("(CAST(__p AS DECIMAL(38,0)) * 1000000000000L) div (__wa + __wb)"))
        .groupBy(col("__a").as("__id")).agg(sum(col("__t")).as("__d"))
      items.join(d, Seq("__id"))
        .select(col("__id"),
          when(col("__d") > 0,
            // same wrap class: total wins scale with corpus comparisons
            expr("(CAST(__wins AS DECIMAL(38,0)) * 1000000000000L) div __d"))
            .otherwise(lit(0L)).as("__wq"))
        .mat
    }
    val tot = pairs.groupBy(col("__a").as("__id"))
      .agg(sum(col("__p")).as("n_comparisons"))
    items.join(fitted, Seq("__id")).join(tot, Seq("__id"))
      .select(col("__id").as("id"), col("__wins").as("n_wins"),
        col("n_comparisons"), col("__wq").as("w_q"))
  }

  /** Rank-biased precision at p = ½ — the top-weighted retrieval
    * metric whose weights are EXACTLY dyadic: (1−p)p^(i−1) = 2^(−i),
    * so the whole score is integer in 2^(−20) units (w_i = 2^(20−i),
    * k ≤ 20) and one integral division recovers the 10⁶ grid:
    *
    *   rbp_q = (10⁶ · Σ_{rel, rank ≤ k} 2^(20−rank)) div 2^20
    *
    * — no float ever touches the score (nDCG/ERR need log/products;
    * RBP at a power-of-two persistence doesn't). Plan: one filter +
    * one per-query hash agg over the ranked table.
    */
  def rbpAtK(ranked: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= 20, s"k ($k) must be in [1, 20]")
    ranked.filter(col("rank") <= k)
      .groupBy(col("query_id"))
      .agg(sum(when(col("rel"), 1L).otherwise(0L)).as("n_rel"),
        sum(when(col("rel"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(20 - rank AS INT))"))
          .otherwise(0L)).as("__u"))
      .select(col("query_id"), col("n_rel"),
        expr("(1000000L * __u) div 1048576L").as("rbp_q"))
  }

  /** Cronbach's alpha internal-consistency coefficient over a sparse
    * (subject, item, score) table — "do the k items move together
    * across subjects". Absent cells are score 0, and the key trick is
    * that ZEROS NEVER MATERIALIZE: Σs and Σs² per item are unchanged
    * by zero cells, and the subject-total variance needs only the
    * subjects that appear — so no subject×item grid is built, just
    * two keyed hash aggs (one by item, one by subject) over the
    * sparse rows. With population variances scaled n² (var2 = n·Σx²
    * − (Σx)², exact decimal(38,0)):
    *
    *   alpha = k/(k−1) · (1 − Σ_i var2_i / var2_total)
    *         = k·(var2_T − Σvar2_i) / ((k−1)·var2_T)
    *
    * one integer division, quantized ⌊10⁶·alpha⌋ (both engines
    * truncate toward zero; alpha can be negative for incoherent
    * batteries and that sign survives exactly). NULL when k < 2 or
    * the total variance is degenerate.
    */
  def cronbachAlpha(scores: DataFrame, subjectCol: String, itemCol: String,
                    scoreCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val base = scores.select(col(subjectCol).as("__u"),
        col(itemCol).as("__i"), col(scoreCol).cast("long").as("__s"))
      .na.drop()
      .mat
    val n = base.agg(countDistinct(col("__u")).as("__n"))
    val items = base.groupBy(col("__i"))
      .agg(sum(dec(col("__s"))).as("__sx"),
        sum(dec(col("__s")) * dec(col("__s"))).as("__sxx"))
    val itemAgg = items.crossJoin(broadcast(n))
      .agg(count(lit(1)).as("k_items"),
        sum(dec(col("__n")) * col("__sxx") - col("__sx") * col("__sx"))
          .as("__iv"))
    val subj = base.groupBy(col("__u")).agg(sum(col("__s")).as("__t"))
      .agg(sum(dec(col("__t"))).as("__st"),
        sum(dec(col("__t")) * dec(col("__t"))).as("__stt"))
    n.crossJoin(broadcast(itemAgg)).crossJoin(broadcast(subj))
      .select(col("k_items"), col("__n").as("n_subjects"),
        col("__iv").cast("long").as("item_var2"),
        (dec(col("__n")) * col("__stt") - col("__st") * col("__st"))
          .cast("long").as("total_var2"))
      .select(col("k_items"), col("n_subjects"), col("item_var2"),
        col("total_var2"),
        // decimal operands: 10⁶·k·var2 overflows long at corpus scale
        when(col("k_items") >= 2 && col("total_var2") > 0,
          expr("""(CAST(1000000 AS DECIMAL(38,0)) * k_items *
                   (total_var2 - item_var2))
                  div ((k_items - 1) *
                   CAST(total_var2 AS DECIMAL(38,0)))"""))
          .as("alpha_q"))
  }

  /** ROC curve points at every distinct score threshold — the full
    * operating-characteristic table behind any single-number AUC
    * ([[aucExact]]): at threshold s, predict positive iff score ≥ s.
    *
    * All counts are exact integer cumulative sums over the DISTINCT-
    * SCORE grid (never a row-level sort — the value-grid contract);
    * rates quantize ⌊10⁶·tp/P⌋ / ⌊10⁶·fp/N⌋ as exact integer
    * divisions, NULL when the class is absent. Descending-score order
    * makes the table read top-left to bottom-right like the plot.
    *
    * @param scored (label ∈ {0,1}, integer-grid score)
    * @return (threshold, n_at, tp, fp, tpr_q, fpr_q) ordered by
    *         threshold desc
    */
  def rocPoints(scored: DataFrame, labelCol: String,
                scoreCol: String): DataFrame = {
    val d = scored.select(col(scoreCol).cast("long").as("__s"),
      col(labelCol).cast("long").as("__y")).na.drop()
    val grid = d.groupBy(col("__s"))
      .agg(sum(col("__y")).as("__pos"), count(lit(1)).as("__n"))
    val w = Window.orderBy(col("__s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = grid.agg(sum(col("__pos")).as("__tp_all"),
      sum(col("__n")).as("__n_all"))
    grid
      .withColumn("tp", sum(col("__pos")).over(w))
      .withColumn("__cum", sum(col("__n")).over(w))
      .crossJoin(broadcast(tot))
      .select(col("__s").as("threshold"), col("__n").as("n_at"),
        col("tp"), (col("__cum") - col("tp")).as("fp"),
        when(col("__tp_all") > 0,
          expr("(1000000L * tp) div __tp_all")).as("tpr_q"),
        when(col("__n_all") - col("__tp_all") > 0,
          expr("(1000000L * (__cum - tp)) div (__n_all - __tp_all)"))
          .as("fpr_q"))
      .orderBy(col("threshold").desc)
  }

  /** Gwet's AC1 inter-rater agreement — [[cohenKappa]]'s
    * paradox-resistant cousin: kappa collapses when one category
    * dominates (high agreement, near-zero kappa); AC1's chance term
    * uses the probability a rater assigns a category RANDOMLY
    * (π_q(1−π_q) mass), which stays stable under skewed prevalence —
    * the standard choice for LLM-judge agreement audits where most
    * items share the majority label.
    *
    *   p_a  = A/N,
    *   p_e  = Σ_q π_q(1−π_q)/(Q−1),  π_q = m_q/(2N),
    *   AC1  = (p_a − p_e)/(1 − p_e)
    *
    * with m_q = (rater-1 count + rater-2 count) of category q, Q = the
    * union category count. Clearing the 4N²(Q−1) denominator keeps it
    * rational to the last step:
    *
    *   AC1 = (4·A·N·(Q−1) − B) / (4·N²·(Q−1) − B),  B = Σ m_q(2N−m_q)
    *
    * — exact decimal(38,0) integers into ONE double division.
    *
    * Plan: one corpus scan to the (a, b) cell grid, two bounded
    * marginal aggs unioned into the category frame, one fold.
    *
    * @return one row (n_rows, agree, n_cats, b_l, ac1_q = ⌊10⁶·AC1⌋)
    */
  def gwetAc1(df: DataFrame, colA: String, colB: String): DataFrame = {
    val dec38 = (c: Column) => c.cast("decimal(38,0)")
    val cm = df.select(col(colA).as("__a"), col(colB).as("__b"))
      .na.drop()
      .groupBy(col("__a"), col("__b")).agg(count(lit(1)).as("__n"))
      .mat
    val ma = cm.groupBy(col("__a").as("__q")).agg(sum(col("__n")).as("__ca"))
    val mb = cm.groupBy(col("__b").as("__q")).agg(sum(col("__n")).as("__cb"))
    val cats = ma.join(mb, Seq("__q"), "full")
      .select(col("__q"),
        (coalesce(col("__ca"), lit(0L)) + coalesce(col("__cb"), lit(0L)))
          .as("__m"))
    val tot = cm.agg(sum(col("__n")).as("__N"),
      sum(when(col("__a") === col("__b"), col("__n")).otherwise(0L))
        .as("__A"))
    val catAgg = cats.crossJoin(broadcast(tot))
      .agg(count(lit(1)).as("n_cats"), max(col("__N")).as("n_rows"),
        max(col("__A")).as("agree"),
        sum(dec38(col("__m")) * (lit(2L) * col("__N") - col("__m")))
          .as("__B"))
    catAgg.select(col("n_rows"), col("agree"), col("n_cats"),
      col("__B").as("b_l"),
      when(col("n_cats") >= 2 &&
        dec38(lit(4L)) * dec38(col("n_rows")) * dec38(col("n_rows")) *
          dec38(col("n_cats") - 1L) - col("__B") > 0,
        floor(lit(1.0e6) *
          (dec38(lit(4L)) * dec38(col("agree")) * dec38(col("n_rows")) *
            dec38(col("n_cats") - 1L) - col("__B")).cast("double") /
          (dec38(lit(4L)) * dec38(col("n_rows")) * dec38(col("n_rows")) *
            dec38(col("n_cats") - 1L) - col("__B")).cast("double"))
          .cast("long")).as("ac1_q"))
  }

  /** Group-fairness audit of a binary classifier — the per-group rate
    * battery behind demographic-parity and equalized-odds checks: for
    * each group g (vs the POOLED corpus),
    *
    *   sel_q = ⌊10⁶·P(ŷ=1 | g)⌋            (selection rate)
    *   tpr_q = ⌊10⁶·P(ŷ=1 | y=1, g)⌋       (equal opportunity)
    *   fpr_q = ⌊10⁶·P(ŷ=1 | y=0, g)⌋       (the other EO arm)
    *   dp_q  = ⌊10⁶·sel_g / sel_pooled⌋    (disparate-impact ratio —
    *           the four-fifths-rule number)
    *
    * — exact integer counts, ONE division per reported rate (dp_q
    * divides the two exact count products: (n_sel_g·n_pool) /
    * (n_g·n_sel_pool), so no quantized-by-quantized division).
    * Groups missing a class report NULL for that arm rather than a
    * fake 0 — an absent positive class is "cannot audit", not
    * "perfectly calibrated". One scan, one hash agg, one broadcast
    * one-row pooled join.
    *
    * @return per group (groupCol, n, n_pos, n_sel, sel_q, tpr_q,
    *         fpr_q, dp_q) ordered by group
    */
  def fairnessAudit(df: DataFrame, groupCol: String, pred: Column,
                    label: Column): DataFrame = {
    val base = df
      .filter(col(groupCol).isNotNull && pred.isNotNull && label.isNotNull)
      .select(col(groupCol).as("__g"),
        pred.cast("boolean").as("__p"), label.cast("boolean").as("__y"))
    val per = base.groupBy(col("__g"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("__p"), 1L).otherwise(0L)).as("n_sel"),
        sum(when(col("__p") && col("__y"), 1L).otherwise(0L)).as("__tp"),
        sum(when(col("__p") && !col("__y"), 1L).otherwise(0L)).as("__fp"))
    val pooled = per.agg(sum(col("n")).as("__np"),
      sum(col("n_sel")).as("__nsp"))
    per.crossJoin(broadcast(pooled))
      .select(col("__g").as(groupCol), col("n"), col("n_pos"),
        col("n_sel"),
        floor(lit(1.0e6) * col("n_sel").cast("double") /
          col("n").cast("double")).cast("long").as("sel_q"),
        when(col("n_pos") > 0,
          floor(lit(1.0e6) * col("__tp").cast("double") /
            col("n_pos").cast("double")).cast("long")).as("tpr_q"),
        when(col("n") - col("n_pos") > 0,
          floor(lit(1.0e6) * col("__fp").cast("double") /
            (col("n") - col("n_pos")).cast("double")).cast("long"))
          .as("fpr_q"),
        // count products go through decimal(38,0): at ~1e9-row groups
        // n_sel*n_pool would wrap int64 silently where the oracle's
        // BIGINT multiply errors — the dec38 device used elsewhere here
        when(col("__nsp") > 0,
          floor(lit(1.0e6) *
            (col("n_sel").cast("decimal(38,0)") * col("__np")).cast("double") /
            (col("n").cast("decimal(38,0)") * col("__nsp")).cast("double"))
            .cast("long"))
          .as("dp_q"))
      .orderBy(col(groupCol))
  }
}
