package graft.operators

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Model-based document quality scoring — the GPT-3/fastText-shaped
  * filter every production corpus pipeline runs after the rule-based
  * passes ([[Curation.repetitionSignals]], TextFns quality ratios): a
  * linear classifier over hashed token n-grams, trained on weak labels
  * (a trusted corpus vs. raw crawl, a language tag, a heuristic), then
  * applied to every document. The published pipelines use exactly this
  * shape: GPT-3 filtered CommonCrawl with a logistic classifier over
  * hashed features; fastText is the same linear model with char/word
  * n-gram buckets.
  *
  * Spark-first: features are unigram+bigram term buckets via
  * `HashingTF` (murmur3 bucketing, no vocabulary state to ship — the
  * property that lets the same featurizer run on 100 TB with zero
  * coordination), training is `spark.ml` logistic regression (L-BFGS:
  * each iteration is one map-side-combined gradient pass over the
  * corpus — linear scans, no shuffle of the data), and scoring is a
  * broadcast of the coefficient vector into a per-row dot product.
  * Training cost lives offline with [[Similarity.writeIvfIndex]];
  * scoring rides the scan stage.
  *
  * Two trainers: [[train]] (spark.ml L-BFGS — fastest convergence, but
  * float gradients aggregate in partition order so scores are not
  * bit-reproducible) and [[trainQuantized]] (fixed-iteration batch
  * gradient with ⌊residual·2²⁰⌋ long-sum aggregation — bit-identical
  * for any partitioning or rerun; the q85 gate uses this one so its
  * output admits a cross-run determinism check). Neither has a DuckDB
  * hash oracle: the sigmoid's exp() would have to match libm
  * cross-engine at the quantization floor boundary, which is exactly
  * the ulp class the other oracles avoid by quantizing BEFORE any
  * cross-engine comparison — here the iterative loop makes that
  * impossible, so the gate is rows-only plus the determinism check,
  * and the specs pin held-out separation quality.
  */
object QualityClassifier {

  /** Unigrams ++ bigrams of the whitespace tokens (fastText's default
    * word-n-gram features), as one array column.
    *
    * `maskTerms` removes those tokens from the stream BEFORE n-gram
    * construction, so no emitted unigram or bigram can contain a masked
    * token (tokens adjacent-after-removal form the bigrams). This is
    * the label-leakage guard for weak supervision: when the training
    * label is derived from the text itself (e.g. "mentions X"), masking
    * X forces the model to learn the label's *context* — co-occurring
    * vocabulary, register, length — instead of winning by looking up
    * the literal label token's hash bucket.
    */
  private[operators] def terms(textCol: Column,
                               maskTerms: Set[String] = Set.empty): Column = {
    val raw = TextFns.tokens(textCol)
    // filter() keeps duplicates (array_except would dedup counts);
    // isInCollection broadcasts the mask as a literal set in the plan
    val toks = if (maskTerms.isEmpty) raw
      else filter(raw, t => !t.isInCollection(maskTerms))
    // zip_with(slice, slice) — NOT transform+element_at: element_at on
    // an expression-valued array re-inlines the whole tokenization into
    // every element access (O(n²) re-splitting per row); zip_with
    // evaluates each array child once
    val bigrams = when(size(toks) >= 2,
      zip_with(slice(toks, lit(1), size(toks) - 1), slice(toks, lit(2), size(toks) - 1),
        (a, b) => concat_ws(" ", a, b)))
      .otherwise(array().cast("array<string>"))
    when(textCol.isNotNull, concat(toks, bigrams))
      .otherwise(array().cast("array<string>"))
  }

  /** docs + a `features` sparse vector of hashed n-gram counts.
    * `maskTerms`: tokens excluded from every feature (see [[terms]]).
    */
  def featurize(docs: DataFrame, textCol: String,
                numFeatures: Int = 1 << 18,
                maskTerms: Set[String] = Set.empty): DataFrame = {
    require(numFeatures > 0, s"numFeatures ($numFeatures) must be positive")
    new HashingTF()
      .setInputCol("__terms").setOutputCol("features")
      .setNumFeatures(numFeatures)
      .transform(docs.withColumn("__terms", terms(col(textCol), maskTerms)))
      .drop("__terms")
  }

  /** Fit the quality model: `labelCol` is 1.0 for "good" examples
    * (trusted corpus) and 0.0 for "bad" (raw crawl / rejected). L2
    * regularization keeps hashed-collision noise from being memorized.
    */
  def train(docs: DataFrame, textCol: String, labelCol: String,
            numFeatures: Int = 1 << 18, regParam: Double = 1e-3,
            maxIter: Int = 50,
            maskTerms: Set[String] = Set.empty): LogisticRegressionModel =
    new LogisticRegression()
      .setFeaturesCol("features").setLabelCol(labelCol)
      .setRegParam(regParam).setMaxIter(maxIter)
      .fit(featurize(docs, textCol, numFeatures, maskTerms)
        .select(col(labelCol).cast("double").as(labelCol), col("features")))

  /** docs + `quality_prob` (P(label=1)): the model's coefficient
    * vector broadcasts with the plan; scoring is scan-stage. Keep the
    * `numFeatures` used at [[train]] time.
    */
  def score(docs: DataFrame, model: LogisticRegressionModel, textCol: String,
            numFeatures: Int = 1 << 18,
            maskTerms: Set[String] = Set.empty): DataFrame =
    model.setFeaturesCol("features").setProbabilityCol("__prob")
      .setPredictionCol("__pred").setRawPredictionCol("__raw")
      .transform(featurize(docs, textCol, numFeatures, maskTerms))
      .withColumn("quality_prob", vector_to_array(col("__prob"))(1))
      .drop("features", "__prob", "__pred", "__raw")

  // ---- deterministic path ----------------------------------------------
  //
  // The L-BFGS trainer above aggregates float gradients in partition
  // order, so its scores are not bit-reproducible run-to-run. The pair
  // below is the reproducible alternative (same trick as
  // Similarity.centroidOutliers / Curation.importanceWeights): a
  // fixed-iteration batch-gradient logistic regression whose per-row
  // residual is quantized ONCE to a long, ⌊residual·2²⁰⌋, and whose
  // per-feature gradient is a LONG sum of those quantized residuals —
  // long sums are associative, so the fitted coefficients (and every
  // downstream score) are identical for ANY partitioning, task order,
  // or rerun. The ≤2⁻²⁰ per-row quantization bias is three orders of
  // magnitude under the step·regParam noise floor and irrelevant to
  // ranking quality; determinism is what it buys.

  /** Coefficients of the deterministic linear model ([[trainQuantized]]).
    * `coefficients(j)` weights hashed n-gram bucket j (mean-pooled);
    * `lengthWeight` weights the explicit log1p(|doc|) feature; scoring
    * is sigmoid(intercept + lengthWeight·log1p(n) + Σ coef(bucket)/n).
    */
  final case class LinearModel(coefficients: Array[Double], intercept: Double,
                               lengthWeight: Double, numFeatures: Int)

  /** `terms` → hashed bucket indices (duplicates preserved — the index
    * MULTIPLICITY is the term count, so downstream sums see tf counts
    * without materializing a vector). Self-consistent featurizer for
    * the deterministic path: sql `hash` = Murmur3(seed 42), codegen'd,
    * stateless — the same zero-coordination property as HashingTF.
    */
  private[operators] def featureIndices(textCol: Column, numFeatures: Int,
                                        maskTerms: Set[String],
                                        portable: Boolean = false): Column = {
    // portable: md5-folded bucket (mirrorable in any engine with md5 —
    // the [[Dedup.md5Base]] trick) instead of Spark-internal Murmur3;
    // the cross-engine-oracled gate path uses it
    val h: Column => Column =
      if (portable) t => pmod(Dedup.md5Hash60(t), lit(numFeatures.toLong)).cast("int")
      else t => pmod(hash(t), lit(numFeatures))
    transform(terms(textCol, maskTerms), h)
  }

  // per-occurrence gradient scale: at 10¹¹ docs the long sum stays
  // under 10¹¹·2²⁴ ≈ 1.7·10¹⁸ < Long.MaxValue; intercept rows are one
  // per doc so 2²⁰ leaves the same headroom
  private val FeatScale = (1L << 24).toDouble
  private val InterceptScale = (1L << 20).toDouble
  // margin-pooling grid: coefficients quantize to ⌊2³⁰·c⌋ before the
  // per-doc sum, making the pooled sum an exact integer (|c| ≲ 5 ⇒
  // per-occurrence ≤ 5·2³⁰, × 10³ tokens ≪ 2⁶³)
  private val CoefScale = (1L << 30).toDouble

  /** Deterministic margin: mean-pooled coefficients (fastText's
    * averaging — Σ coef(bucket)/|doc| keeps the vocabulary term's scale
    * independent of document length; a raw-count dot product saturates
    * the sigmoid on long documents and batch GD cannot recover the
    * ranking) PLUS an explicit length feature wLen·log1p(|doc|) —
    * pooling alone would erase length, which for weak quality labels is
    * often the strongest honest signal, so it gets its own learned
    * weight instead of leaking through every count. Iteration order
    * over the index array is fixed → bit-reproducible.
    */
  private def mixedMargin(bcCoef: org.apache.spark.broadcast.Broadcast[Array[Double]],
                          b0: Double, wLen: Double) =
    udf { idx: scala.collection.Seq[Int] =>
      if (idx == null || idx.isEmpty) b0
      else {
        val c = bcCoef.value
        // coefficient pooling on the ⌊2³⁰·c⌋ integer grid: the sum is
        // order-free (any token order, any engine), and the two fp ops
        // that remain (grid→double, /n) have a FIXED order — the same
        // exactness discipline as every oracled gate. ln(1+n) runs on
        // an exact integer-valued double (the standing ln contract).
        var sq = 0L
        idx.foreach(i => sq += math.floor(c(i) * CoefScale).toLong)
        (b0 + wLen * math.log(1.0 + idx.size.toDouble)) +
          (sq.toDouble / CoefScale) / idx.size
      }
    }

  /** Fixed-iteration batch-gradient LR over mean-pooled hashed n-grams —
    * bit-reproducible (see block comment above) where spark.ml's
    * L-BFGS is not, at the cost of needing more (cheaper) iterations.
    *
    * Plan shape per iteration: ONE treeAggregate job over the persisted
    * (label, indices) RDD — the same shape spark.ml uses for its own
    * gradient passes: each task folds its rows into a DENSE long array
    * of quantized gradients (numFeatures+2 slots ≈ 2 MB at 2¹⁸ —
    * bounded by the feature space, not the data), and arrays merge by
    * element-wise long addition, which is associative → any task order
    * or tree shape yields identical bits. No shuffle of the corpus,
    * no per-iteration query planning; slot 0 carries the intercept
    * gradient (quantized at InterceptScale), slot 1 the length-feature
    * gradient, slot j+2 bucket j (per-occurrence r/n at FeatScale).
    */
  def trainQuantized(docs: DataFrame, textCol: String, labelCol: String,
                     numFeatures: Int = 1 << 18, regParam: Double = 1e-3,
                     maxIter: Int = 60, stepSize: Double = 2.0,
                     maskTerms: Set[String] = Set.empty,
                     portable: Boolean = false): LinearModel = {
    require(numFeatures > 0, s"numFeatures ($numFeatures) must be positive")
    require(maxIter > 0 && stepSize > 0, "maxIter and stepSize must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val data = docs.select(
        col(labelCol).cast("double").as("__label"),
        featureIndices(col(textCol), numFeatures, maskTerms, portable)
          .as("__idx"))
      .as[(Double, Array[Int])].rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = data.count().toDouble
      require(n > 0, "trainQuantized: empty training set")
      val sc = spark.sparkContext
      val coef = new Array[Double](numFeatures)
      var intercept = 0.0
      var wLen = 0.0
      var iter = 0
      while (iter < maxIter) {
        val bc = sc.broadcast((coef, intercept, wLen))
        val grad = data.treeAggregate(new Array[Long](numFeatures + 2))(
          seqOp = { (acc, row) =>
            val (c, b0, wl) = bc.value
            val (label, idx) = row
            val nTok = if (idx == null) 0 else idx.length
            var sq = 0L
            var k = 0
            while (k < nTok) {
              sq += math.floor(c(idx(k)) * CoefScale).toLong; k += 1
            }
            val margin = if (nTok == 0) b0
              else (b0 + wl * math.log(1.0 + nTok.toDouble)) +
                (sq.toDouble / CoefScale) / nTok
            val r = 1.0 / (1.0 + math.exp(-margin)) - label
            acc(0) += math.floor(r * InterceptScale).toLong
            if (nTok > 0) {
              acc(1) += math.floor(r * math.log(1.0 + nTok.toDouble)
                * InterceptScale).toLong
              val rq = math.floor(r / nTok * FeatScale).toLong
              k = 0
              while (k < nTok) { acc(idx(k) + 2) += rq; k += 1 }
            }
            acc
          },
          combOp = { (a, b) =>
            var k = 0
            while (k < a.length) { a(k) += b(k); k += 1 }
            a
          }, depth = 2)
        bc.destroy()
        intercept -= stepSize * (grad(0) / InterceptScale / n)
        wLen -= stepSize * (grad(1) / InterceptScale / n)
        var j = 0
        while (j < numFeatures) {
          coef(j) -= stepSize * (grad(j + 2) / FeatScale / n + regParam * coef(j))
          j += 1
        }
        iter += 1
      }
      LinearModel(coef, intercept, wLen, numFeatures)
    } finally data.unpersist()
  }

  /** docs + `quality_prob` under a [[LinearModel]]: coefficients ride a
    * broadcast into a per-row mean-pooled dot product over the hashed
    * indices — scan-stage, no shuffle, bit-reproducible for any
    * partitioning.
    */
  def scoreQuantized(docs: DataFrame, model: LinearModel, textCol: String,
                     maskTerms: Set[String] = Set.empty,
                     portable: Boolean = false): DataFrame = {
    val bcCoef = docs.sparkSession.sparkContext.broadcast(model.coefficients)
    docs.withColumn("quality_prob",
      lit(1.0) / (lit(1.0) +
        exp(-mixedMargin(bcCoef, model.intercept, model.lengthWeight)(
          featureIndices(col(textCol), model.numFeatures, maskTerms,
            portable)))))
  }
}
