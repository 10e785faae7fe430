package graft.operators

import graft.operators.Mat._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Engine-exact, oracle-replayable classifiers — the deterministic
  * counterpoint to the spark.ml logistic gate (q85, rows-only by
  * necessity): a Gini decision stump and a multinomial Naive Bayes
  * whose fit AND scores are integer/quantized aggregates any engine
  * reproduces bit-for-bit, so the full train→predict loop sits behind
  * a value-checked DuckDB oracle.
  */
object Classify {

  /** Best single-threshold split ("decision stump") of a binary label
    * on an integer feature, by Gini impurity. Candidates are the
    * DISTINCT feature values (split is `x ≤ v`; the max value is
    * excluded so the right side is nonempty); minimizing weighted
    * Gini is equivalent to maximizing
    *
    *   score = ((P_L² + Q_L²)/n_L + (P_R² + Q_R²)/n_R) / n   ∈ [½, 1]
    *
    * which is what's quantized: score_q = ⌊10¹²·score⌋, from exact
    * decimal(38,0) cumulative counts with a three-division mirrored
    * fp chain. The winner is row_number 1 under (score_q DESC,
    * threshold ASC) — an integer-deterministic tie-break.
    *
    * Plan: one scan to the value grid (distinct-value-bounded, NOT
    * row-bounded), one ordered window over the grid, one top-1. The
    * single-partition window is safe because the grid is the feature's
    * value cardinality; for continuous features bucket first.
    */
  def decisionStump(df: DataFrame, featureCol: String,
                    label: Column): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val d = (c: Column) => c.cast("double")
    val grid = df.select(col(featureCol).cast("long").as("__v"),
        when(label, 1L).otherwise(0L).as("__y"))
      .na.drop()
      .groupBy(col("__v"))
      .agg(count(lit(1)).as("__nv"), sum(col("__y")).as("__pv"))
    val cum = grid
      .withColumn("__nl", sum(col("__nv")).over(
        Window.orderBy(col("__v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__pl", sum(col("__pv")).over(
        Window.orderBy(col("__v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = grid.agg(sum(col("__nv")).as("__n"), sum(col("__pv")).as("__p"))
    val c = cum.crossJoin(broadcast(tot)).filter(col("__nl") < col("__n"))
      .withColumn("__nr", col("__n") - col("__nl"))
      .withColumn("__pr", col("__p") - col("__pl"))
      .withColumn("__ql", col("__nl") - col("__pl"))
      .withColumn("__qr", col("__nr") - col("__pr"))
    val numL = dec(col("__pl")) * dec(col("__pl")) +
      dec(col("__ql")) * dec(col("__ql"))
    val numR = dec(col("__pr")) * dec(col("__pr")) +
      dec(col("__qr")) * dec(col("__qr"))
    val scoreQ = floor(lit(1.0e12) *
      (d(numL) / d(col("__nl")) + d(numR) / d(col("__nr"))) /
      d(col("__n"))).cast("long")
    c.withColumn("score_q", scoreQ)
      .withColumn("__rk", row_number().over(
        Window.orderBy(col("score_q").desc, col("__v"))))
      .filter(col("__rk") === 1)
      .select(col("__v").as("threshold"), col("__nl").as("n_left"),
        col("__pl").as("pos_left"), col("__nr").as("n_right"),
        col("__pr").as("pos_right"), col("score_q"))
  }

  /** Multinomial Naive Bayes with add-one smoothing: fit on `train`
    * (one row per doc, class column), score every `test` doc against
    * the training classes, predict by argmax. The log-likelihood is
    * decomposed so the class×vocab grid NEVER materializes:
    *
    *   score(d,c) = ln(D_c) − ln(D)
    *              + Σ_{t∈d, (t,c) seen} cnt_dt·ln(tf_tc + 1)
    *              − len_d · ⌊10⁹·ln(T_c + V)⌋/10⁹
    *
    * (the smoothing denominator is constant per class, so unseen
    * terms cost only the per-class length term — a term-keyed join
    * against the SPARSE class-tf table covers the rest). Every
    * contribution is quantized ⌊10⁹·.⌋ and summed as longs; the
    * length term is an exact long·long product. Argmax breaks ties
    * on class name ascending — fully engine-deterministic.
    *
    * Plan: two explodes (train fit, test score), term-keyed join to
    * the sparse (term, class) tf table, one per-(doc, class) hash
    * agg, one per-doc top-1 window. Classes are bounded → the priors
    * and totals broadcast.
    */
  def naiveBayes(train: DataFrame, test: DataFrame, idCol: String,
                 textCol: String, classCol: String): DataFrame = {
    def terms(docs: DataFrame, keep: Column*): DataFrame = docs
      .select(keep :+ explode(TextFns.tokens(col(textCol))).as("__t"): _*)
      .filter(length(col("__t")) > 0)
    val classTf = terms(train, col(classCol).as("__c"))
      .groupBy(col("__c"), col("__t")).agg(count(lit(1)).as("__tf"))
      .mat
    val classTot = classTf.groupBy(col("__c")).agg(sum(col("__tf")).as("__T"))
    val vocab = classTf.select(col("__t")).distinct()
      .agg(count(lit(1)).as("__V"))
    val priors = train.filter(col(classCol).isNotNull)
      .groupBy(col(classCol).as("__c")).agg(count(lit(1)).as("__Dc"))
    val dTot = priors.agg(sum(col("__Dc")).as("__D"))
    val classes = priors.join(broadcast(classTot), Seq("__c"))
      .crossJoin(broadcast(vocab)).crossJoin(broadcast(dTot))
      .select(col("__c"),
        floor(lit(1.0e9) * (log(col("__Dc").cast("double")) -
          log(col("__D").cast("double")))).cast("long").as("__prior_q"),
        floor(lit(1.0e9) * log((col("__T") + col("__V")).cast("double")))
          .cast("long").as("__lntv_q"))
    val docTerms = terms(test, col(idCol))
      .groupBy(col(idCol), col("__t")).agg(count(lit(1)).as("__cnt"))
      .mat
    val part = docTerms.join(classTf, Seq("__t"))
      .select(col(idCol), col("__c"),
        floor(lit(1.0e9) * col("__cnt").cast("double") *
          log((col("__tf") + lit(1L)).cast("double"))).cast("long")
          .as("__pq"))
      .groupBy(col(idCol), col("__c")).agg(sum(col("__pq")).as("__part_q"))
    val lens = test.select(col(idCol)).distinct()
      .join(docTerms.groupBy(col(idCol)).agg(sum(col("__cnt")).as("__len")),
        Seq(idCol), "left")
      .na.fill(0L, Seq("__len"))
    lens.crossJoin(broadcast(classes))
      .join(part, Seq(idCol, "__c"), "left")
      .na.fill(0L, Seq("__part_q"))
      .withColumn("score_q",
        col("__prior_q") + col("__part_q") - col("__len") * col("__lntv_q"))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col(idCol))
          .orderBy(col("score_q").desc, col("__c"))))
      .filter(col("__rk") === 1)
      .select(col(idCol), col("__c").as("pred"), col("score_q"))
  }
}
