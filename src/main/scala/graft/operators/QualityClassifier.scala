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
  * Scores are NOT bit-reproducible across runs (L-BFGS aggregates
  * float gradients in partition order), so there is no hash oracle —
  * the gate is rows-only and the specs assert separation quality on
  * held-out data instead.
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
    val bigrams = when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
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
}
