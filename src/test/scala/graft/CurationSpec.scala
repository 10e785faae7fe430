package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Similarity}

class CurationSpec extends SparkSpec {
  import spark.implicits._

  // ---- repetitionSignals -----------------------------------------------

  test("repetitionSignals: hand-computed fractions per n") {
    val docs = Seq(
      (1L, "a a a a"),            // bigrams: "a a"×3 → top2=dup2=1.0; trigram ×2 → top3=1.0
      (2L, "a b c d e f"),        // all distinct: top2=1/5, top3=1/4, dup*=0
      (3L, ""),                   // blank: 0 tokens, no grams
      (4L, "x y x y x y x y"),    // 7 bigrams: "x y"×4, "y x"×3 → top2=4/7, dup2=1.0;
                                  // all 4 5-grams alternate-duplicate → dup5=1.0
      (5L, "p q r s t p q r s t p q r s t") // all 11 5-grams duplicated → dup5=1.0
    ).toDF("doc_id", "text")
    val r = Curation.repetitionSignals(docs, "doc_id", "text")
      .select("doc_id", "n_tokens", "top2_frac", "top3_frac", "dup2_frac", "dup5_frac")
      .as[(Long, Long, Double, Double, Double, Double)]
      .collect().map(t => t._1 -> t).toMap

    assert(r(1L) === ((1L, 4L, 1.0, 1.0, 1.0, 0.0)))
    assert(r(2L) === ((2L, 6L, 1.0 / 5, 1.0 / 4, 0.0, 0.0)))
    assert(r(3L) === ((3L, 0L, 0.0, 0.0, 0.0, 0.0)))
    assert(r(4L) === ((4L, 8L, 4.0 / 7, 3.0 / 6, 1.0, 1.0)))
    assert(r(5L)._6 === 1.0) // dup5
  }

  test("repetitionSignals: thresholds drive passes_repetition") {
    val docs = Seq((1L, "a a a a"), (2L, "a b c d e f")).toDF("doc_id", "text")
    val strict = Curation.repetitionSignals(docs, "doc_id", "text")
      .select("doc_id", "passes_repetition").as[(Long, Boolean)].collect().toMap
    assert(!strict(1L)) // total repetition
    assert(!strict(2L)) // 6 tokens: top2 = 0.2 > default 0.05
    val loose = Curation.repetitionSignals(docs, "doc_id", "text",
      maxTop2 = 0.5, maxTop3 = 0.5, maxDup2 = 0.5, maxDup5 = 0.5)
      .select("doc_id", "passes_repetition").as[(Long, Boolean)].collect().toMap
    assert(!loose(1L) && loose(2L))
  }

  // ---- stratifiedSplit ---------------------------------------------------

  test("stratifiedSplit: content-variant duplicates land in the same split") {
    val docs = Seq(
      (1L, "Hello World"),
      (2L, "hello   world  "),   // whitespace/case variant of doc 1
      (3L, "HELLO\tWORLD"),      // tab variant
      (4L, "something different entirely")
    ).toDF("doc_id", "text")
    val r = Curation.stratifiedSplit(docs, "text")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(r(1L) === r(2L) && r(2L) === r(3L))
    assert(Set("train", "val", "test").contains(r(4L)))
    // deterministic across runs
    val r2 = Curation.stratifiedSplit(docs, "text")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(r === r2)
  }

  test("stratifiedSplit: null text goes to train (one split, dilutes not contaminates)") {
    val docs = Seq((1L, null: String), (2L, null: String), (3L, "real text here"))
      .toDF("doc_id", "text")
    val r = Curation.stratifiedSplit(docs, "text")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(r(1L) === "train" && r(2L) === "train")
  }

  test("stratifiedSplit: cut points respected and validated") {
    val docs = (1L to 400L).map(i => (i, s"document number $i with words")).toDF("doc_id", "text")
    val counts = Curation.stratifiedSplit(docs, "text", trainPct = 80, valPct = 10)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    // hash buckets are ~uniform; bounds are loose on purpose
    assert(counts("train") > 240 && counts.getOrElse("val", 0L) < 100)
    assert(counts.values.sum === 400L)
    intercept[IllegalArgumentException] {
      Curation.stratifiedSplit(docs, "text", trainPct = 95, valPct = 10)
    }
  }

  // ---- chunkTokens ---------------------------------------------------------

  test("chunkTokens: overlapping windows with a short tail") {
    val docs = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val r = Curation.chunkTokens(docs, "doc_id", "text", chunkSize = 4, stride = 3)
      .orderBy("start_tok")
      .select("start_tok", "n_chunk_tokens", "chunk_text")
      .as[(Int, Int, String)].collect().toSeq
    assert(r === Seq(
      (1, 4, "t1 t2 t3 t4"),
      (4, 4, "t4 t5 t6 t7"),
      (7, 4, "t7 t8 t9 t10")))
    // start 10 is NOT emitted: its window ("t10") is fully contained in
    // the start-7 chunk — tails must not be up-weighted
  }

  test("chunkTokens: disjoint-stride tail chunk IS kept (it covers new tokens)") {
    val docs = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val r = Curation.chunkTokens(docs, "doc_id", "text", chunkSize = 4, stride = 8)
      .orderBy("start_tok")
      .select("start_tok", "n_chunk_tokens", "chunk_text")
      .as[(Int, Int, String)].collect().toSeq
    assert(r === Seq(
      (1, 4, "t1 t2 t3 t4"),
      (9, 2, "t9 t10"))) // tokens 9-10 are uncovered without it
  }

  test("chunkTokens: empty text yields one empty chunk; null text none") {
    val docs = Seq((1L, ""), (2L, null: String)).toDF("doc_id", "text")
    val r = Curation.chunkTokens(docs, "doc_id", "text", chunkSize = 8, stride = 8)
      .select("doc_id", "n_chunk_tokens", "chunk_text")
      .as[(Long, Int, String)].collect().toSeq
    assert(r === Seq((1L, 1, "")))
    intercept[IllegalArgumentException] {
      Curation.chunkTokens(docs, "doc_id", "text", chunkSize = 0, stride = 8)
    }
  }

  // ---- tfIdfTopTerms -----------------------------------------------------

  test("tfIdfTopTerms: rare terms outrank common ones; ties break by term") {
    val docs = Seq(
      (1L, "apple apple zebra common"),
      (2L, "common banana banana"),
      (3L, "common apple")
    ).toDF("doc_id", "text")
    // N=3. doc 1: zebra tf=1 df=1 → 3.0; apple tf=2 df=2 → 3.0 (tie with
    // zebra → 'apple' first alphabetically); common tf=1 df=3 → 1.0
    val r = Curation.tfIdfTopTerms(docs, "doc_id", "text", k = 2)
      .select("doc_id", "rank", "term", "score")
      .as[(Long, Int, String, Double)].collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4))).toMap
    assert(r((1L, 1)) === (("apple", 3.0)))
    assert(r((1L, 2)) === (("zebra", 3.0)))
    assert(r((2L, 1)) === (("banana", 6.0))) // tf=2 · N/df = 2·3/1
    assert(r((3L, 1)) === (("apple", 1.5)))
    // blank text contributes no terms at all
    val blank = Curation.tfIdfTopTerms(
      Seq((9L, "")).toDF("doc_id", "text"), "doc_id", "text", 3)
    assert(blank.count() === 0L)
  }

  // ---- centroidOutliers ------------------------------------------------

  test("centroidOutliers: least-central vectors flagged, ties by id") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(0.0f, 1.0f), 0),  // same cos to the [2/3, 2/3] centroid as vec 1
      (3L, Array(1.0f, 1.0f), 0),  // most aligned
      (4L, Array(1.0f, 0.0f), 1),
      (5L, Array(0.9f, 0.1f), 1),
      (6L, Array(-0.5f, -0.5f), 1) // anti-aligned → lowest cos in label 1
    ).toDF("vec_id", "embedding", "label")
    val r = Similarity.centroidOutliers(emb, "vec_id", "embedding", "label",
      outlierFrac = 0.1) // ceil(0.1·3) = 1 outlier per label
      .select("vec_id", "rank", "is_outlier").as[(Long, Int, Boolean)]
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap
    // label 0: vecs 1 and 2 tie on cos → rank by id; only rank 1 flagged
    assert(r(1L) === ((1, true)))
    assert(r(2L) === ((2, false)))
    assert(r(3L) === ((3, false)))
    // label 1: the anti-aligned vector is the single outlier
    assert(r(6L) === ((1, true)))
    assert(r(4L)._2 === false && r(5L)._2 === false)
  }

  test("centroidOutliers: null label is its own group, not dropped") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), Some(0)),
      (2L, Array(0.0f, 1.0f), Some(0)),
      (3L, Array(1.0f, 1.0f), None),
      (4L, Array(-1.0f, 0.0f), None)
    ).toDF("vec_id", "embedding", "label")
    val r = Similarity.centroidOutliers(emb, "vec_id", "embedding", "label",
      outlierFrac = 0.4)
    assert(r.count() === 4L) // unlabeled vectors scored, not silently lost
    assert(r.filter(col("label").isNull).count() === 2L)
  }

  test("centroidOutliers: zero vector gets null cos and ranks first") {
    val emb = Seq(
      (1L, Array(0.0f, 0.0f), 0),
      (2L, Array(1.0f, 0.0f), 0),
      (3L, Array(1.0f, 0.1f), 0)
    ).toDF("vec_id", "embedding", "label")
    val r = Similarity.centroidOutliers(emb, "vec_id", "embedding", "label",
      outlierFrac = 0.4)
    val rows = r.select("vec_id", "rank", "is_outlier")
      .as[(Long, Int, Boolean)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(rows(1L)._1 === 1 && rows(1L)._2 === true) // null cos sorts first
    assert(r.filter(col("vec_id") === 1L).select("cos").collect().head.isNullAt(0))
  }
}
