package graft

import org.apache.spark.sql.functions._

import graft.operators.QualityClassifier

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  // two disjoint vocabularies → a linearly separable corpus with
  // held-out generalization (train docs never reappear in test)
  private def goodDoc(i: Int) =
    s"clear prose sentence number $i with informative structured content"
  private def badDoc(i: Int) =
    s"buy cheap now spam click $i here winner casino jackpot"

  test("train/score separates held-out good from bad documents") {
    val train = ((1 to 40).map(i => (goodDoc(i), 1.0)) ++
      (1 to 40).map(i => (badDoc(i), 0.0))).toDF("text", "label")
    val model = QualityClassifier.train(train, "text", "label",
      numFeatures = 1 << 12, maxIter = 25)
    val test = ((100 to 119).map(i => (i.toLong, goodDoc(i), 1.0)) ++
      (100 to 119).map(i => (i.toLong, badDoc(i), 0.0)))
      .toDF("doc_id", "text", "truth")
    val scored = QualityClassifier.score(test, model, "text",
      numFeatures = 1 << 12)
      .select(col("truth"), col("quality_prob")).as[(Double, Double)].collect()
    // every held-out good doc outscores every held-out bad doc
    val good = scored.filter(_._1 == 1.0).map(_._2)
    val bad = scored.filter(_._1 == 0.0).map(_._2)
    assert(good.min > bad.max,
      s"no separation: good min ${good.min} vs bad max ${bad.max}")
    assert(good.forall(_ > 0.5) && bad.forall(_ < 0.5))
  }

  // Wilcoxon/rank AUC: P(score_pos > score_neg) + half-credit ties
  private def auc(scored: Seq[(Double, Double)]): Double = {
    val pos = scored.filter(_._1 == 1.0).map(_._2)
    val neg = scored.filter(_._1 == 0.0).map(_._2)
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    wins / (pos.size * neg.size)
  }

  test("maskTerms removes the label token from every feature") {
    val docs = Seq(
      (1L, "alpha spark beta spark gamma"),
      (2L, "alpha beta gamma")
    ).toDF("doc_id", "text")
    // masking "spark" must equal featurizing text with the token
    // deleted up front: identical unigram counts AND identical bigrams
    // (adjacent-after-removal tokens pair up — no bigram bridges spark)
    val masked = QualityClassifier.featurize(docs, "text",
      numFeatures = 1 << 12, maskTerms = Set("spark"))
      .select("doc_id", "features").collect()
      .map(r => r.getLong(0) -> r.get(1)).toMap
    val scrubbed = QualityClassifier.featurize(
      docs.withColumn("text",
        regexp_replace(col("text"), "\\bspark\\b\\s*", "")),
      "text", numFeatures = 1 << 12)
      .select("doc_id", "features").collect()
      .map(r => r.getLong(0) -> r.get(1)).toMap
    assert(masked(1L) === scrubbed(1L))
    assert(masked(1L) === masked(2L),
      "doc 1 (with spark) and doc 2 (without) must featurize identically under the mask")
  }

  test("masked label still generalizes: held-out AUC >= 0.9 from context alone") {
    // weak label = "doc mentions verified"; the token co-occurs with a
    // good-register vocabulary but is masked from the features, so the
    // model can only learn the co-occurring context — exactly the q85
    // gate's construction. Train and test docs are disjoint.
    def good(i: Int) =
      s"verified thorough prose reviewed citation $i accurate edited source"
    def bad(i: Int) =
      s"click spam casino winner $i jackpot cheap pills lottery"
    val mask = Set("verified")
    val label = (t: org.apache.spark.sql.Column) =>
      array_contains(split(t, " "), "verified").cast("double")
    val train = ((1 to 40).map(good) ++ (1 to 40).map(bad)).toDF("text")
      .withColumn("label", label(col("text")))
    val model = QualityClassifier.train(train, "text", "label",
      numFeatures = 1 << 12, maxIter = 25, maskTerms = mask)
    val test = ((100 to 119).map(good) ++ (100 to 119).map(bad)).toDF("text")
      .withColumn("truth", label(col("text")))
    val scored = QualityClassifier.score(test, model, "text",
      numFeatures = 1 << 12, maskTerms = mask)
      .select(col("truth"), col("quality_prob")).as[(Double, Double)].collect()
    val a = auc(scored.toSeq)
    assert(a >= 0.9, s"held-out AUC $a < 0.9 with masked label")
    // and the win is NOT lookup: the label token hashes to a bucket the
    // masked featurizer provably never populates (previous test)
  }

  test("featurize: bigrams distinguish token order; null/empty text are safe") {
    val docs = Seq(
      (1L, Some("alpha beta")),
      (2L, Some("beta alpha")),   // same unigrams, different bigram
      (3L, None),
      (4L, Some(""))
    ).toDF("doc_id", "text")
    val f = QualityClassifier.featurize(docs, "text", numFeatures = 1 << 12)
    val byId = f.select("doc_id", "features").collect()
      .map(r => r.getLong(0) -> r.get(1).asInstanceOf[org.apache.spark.ml.linalg.Vector])
      .toMap
    assert(byId(1L) !== byId(2L), "bigram order lost")
    assert(byId(3L).numNonzeros === 0) // null text → empty features, no crash
    // featurization is deterministic (murmur3 bucketing, no fit state)
    val f2 = QualityClassifier.featurize(docs, "text", numFeatures = 1 << 12)
      .select("doc_id", "features").collect()
      .map(r => r.getLong(0) -> r.get(1).asInstanceOf[org.apache.spark.ml.linalg.Vector])
      .toMap
    assert(byId === f2)
  }

  test("trainQuantized separates held-out docs and matches the masked-AUC bar") {
    def good(i: Int) =
      s"verified thorough prose reviewed citation $i accurate edited source"
    def bad(i: Int) =
      s"click spam casino winner $i jackpot cheap pills lottery"
    val mask = Set("verified")
    val label = (t: org.apache.spark.sql.Column) =>
      array_contains(split(t, " "), "verified").cast("double")
    val train = ((1 to 40).map(good) ++ (1 to 40).map(bad)).toDF("text")
      .withColumn("label", label(col("text")))
    val model = QualityClassifier.trainQuantized(train, "text", "label",
      numFeatures = 1 << 12, maxIter = 30, stepSize = 2.0, maskTerms = mask)
    val test = ((100 to 119).map(good) ++ (100 to 119).map(bad)).toDF("text")
      .withColumn("truth", label(col("text")))
    val scored = QualityClassifier.scoreQuantized(test, model, "text", mask)
      .select(col("truth"), col("quality_prob")).as[(Double, Double)].collect()
    val a = auc(scored.toSeq)
    assert(a >= 0.9, s"held-out AUC $a < 0.9 with quantized trainer")
    val goodP = scored.filter(_._1 == 1.0).map(_._2)
    val badP = scored.filter(_._1 == 0.0).map(_._2)
    assert(goodP.min > badP.max,
      s"no separation: good min ${goodP.min} vs bad max ${badP.max}")
  }

  test("trainQuantized is bit-identical across partitionings and reruns") {
    val docs = (1L to 120L).map { i =>
      val txt = if (i % 3 == 0) goodDoc(i.toInt) else badDoc(i.toInt)
      (i, txt, if (i % 3 == 0) 1.0 else 0.0)
    }.toDF("doc_id", "text", "label")
    def fit(df: org.apache.spark.sql.DataFrame) =
      QualityClassifier.trainQuantized(df, "text", "label",
        numFeatures = 1 << 12, maxIter = 12, stepSize = 1.0)
    val m1 = fit(docs.coalesce(1))
    val m2 = fit(docs.repartition(13))
    val m3 = fit(docs.repartition(13)) // rerun, same layout
    // exact double equality — the whole point of the quantized path
    assert(m1.intercept === m2.intercept && m2.intercept === m3.intercept)
    assert(m1.coefficients.toSeq === m2.coefficients.toSeq)
    assert(m2.coefficients.toSeq === m3.coefficients.toSeq)
    // and scoring is bit-identical too, independent of layout
    val s1 = QualityClassifier.scoreQuantized(docs.coalesce(1), m1, "text")
      .select("doc_id", "quality_prob").as[(Long, Double)].collect().toMap
    val s2 = QualityClassifier.scoreQuantized(docs.repartition(7), m2, "text")
      .select("doc_id", "quality_prob").as[(Long, Double)].collect().toMap
    assert(s1 === s2)
  }

  test("scoreQuantized keeps every row; null/empty text score at the intercept") {
    val train = ((1 to 10).map(i => (goodDoc(i), 1.0)) ++
      (1 to 10).map(i => (badDoc(i), 0.0))).toDF("text", "label")
    val model = QualityClassifier.trainQuantized(train, "text", "label",
      numFeatures = 1 << 12, maxIter = 10, stepSize = 1.0)
    val docs = Seq((1L, "some words"), (2L, null: String), (3L, ""))
      .toDF("doc_id", "text")
    val r = QualityClassifier.scoreQuantized(docs, model, "text")
      .select("doc_id", "quality_prob").as[(Long, Double)].collect().toMap
    assert(r.keySet === Set(1L, 2L, 3L))
    assert(r.values.forall(p => p >= 0.0 && p <= 1.0))
    val atIntercept = 1.0 / (1.0 + math.exp(-model.intercept))
    assert(r(2L) === atIntercept)
  }

  test("score output keeps every input row and stays in [0,1]") {
    val train = ((1 to 10).map(i => (goodDoc(i), 1.0)) ++
      (1 to 10).map(i => (badDoc(i), 0.0))).toDF("text", "label")
    val model = QualityClassifier.train(train, "text", "label",
      numFeatures = 1 << 12, maxIter = 10)
    val docs = Seq((1L, "some words"), (2L, null: String), (3L, ""))
      .toDF("doc_id", "text")
    val r = QualityClassifier.score(docs, model, "text", numFeatures = 1 << 12)
      .select("doc_id", "quality_prob").as[(Long, Double)].collect().toMap
    assert(r.keySet === Set(1L, 2L, 3L))
    assert(r.values.forall(p => p >= 0.0 && p <= 1.0))
  }
}
