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

  // ---- boilerplateSegments ---------------------------------------------

  test("boilerplateSegments: cross-doc segments removed, hand-computed") {
    val docs = Seq(
      (1L, Some("nav bar hello world")),
      (2L, Some("nav bar totally different")),
      (3L, Some("unique content only here")),
      (4L, None),                       // null text survives with 0 segments
      (5L, Some("nav bar")),            // doc that is ALL boilerplate
      (6L, Some("nav bar tail"))        // partial tail segment kept
    ).toDF("doc_id", "text")
    val r = Curation.boilerplateSegments(docs, "doc_id", "text",
      segTokens = 2, minDocs = 2)
      .as[(Long, Long, Long, Option[Double], Option[String])]
      .collect().map(t => t._1 -> t).toMap

    assert(r(1L) === ((1L, 2L, 1L, Some(0.5), Some("hello world"))))
    assert(r(2L) === ((2L, 2L, 1L, Some(0.5), Some("totally different"))))
    assert(r(3L) === ((3L, 2L, 0L, Some(0.0), Some("unique content only here"))))
    assert(r(4L) === ((4L, 0L, 0L, None, None)))
    assert(r(5L) === ((5L, 1L, 1L, Some(1.0), Some(""))))
    assert(r(6L) === ((6L, 2L, 1L, Some(0.5), Some("tail"))))
  }

  test("boilerplateSegments: intra-doc repetition alone is not boilerplate") {
    val docs = Seq(
      (1L, "xx yy xx yy"),              // repeats its own segment — df is 1
      (2L, "other words here now")
    ).toDF("doc_id", "text")
    val r = Curation.boilerplateSegments(docs, "doc_id", "text",
      segTokens = 2, minDocs = 2)
      .select("doc_id", "n_boiler").as[(Long, Long)].collect().toMap
    assert(r(1L) === 0L && r(2L) === 0L)
  }

  // ---- sourceOverlap -----------------------------------------------------

  test("sourceOverlap: hand-computed shared-gram counts per source pair") {
    val docs = Seq(
      (1L, "wiki", "the quick brown fox jumps"),
      (2L, "crawl", "the quick brown cat sits"),   // shares "the quick brown"
      (3L, "books", "the quick brown fox jumps"),  // exact copy of doc 1
      (4L, "crawl", "the quick brown fox naps"),   // crawl also shares the fox gram
      (5L, "wiki", null)                           // null text contributes nothing
    ).toDF("doc_id", "source", "text")
    val r = graft.operators.Curation.sourceOverlap(docs, "text", "source", gramSize = 3)
      .as[(String, String, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    // distinct 3-grams: wiki {tqb,qbf,bfj}; books same 3; crawl {tqb,qbc,bcs,qbf,bfn}
    assert(r === Map(
      ("books", "wiki") -> 3L,
      ("books", "crawl") -> 2L,
      ("crawl", "wiki") -> 2L))
    // duplicate instances of a gram within a source count once (doc 3
    // repeating doc 1's grams adds no new (gram, source) pairs)
  }

  test("sourceOverlap: disjoint sources produce no rows; pair order is sorted") {
    val docs = Seq(
      (1L, "a_src", "one two three four"),
      (2L, "z_src", "five six seven eight")
    ).toDF("doc_id", "source", "text")
    assert(graft.operators.Curation.sourceOverlap(docs, "text", "source", 2)
      .count() === 0L)
    val shared = Seq(
      (1L, "z_src", "alpha beta gamma"),
      (2L, "a_src", "alpha beta gamma")
    ).toDF("doc_id", "source", "text")
    val p = graft.operators.Curation.sourceOverlap(shared, "text", "source", 2)
      .as[(String, String, Long)].collect().toSeq
    assert(p === Seq(("a_src", "z_src", 2L))) // sorted, never (z, a)
  }

  // ---- fitUnigramLm / unigramScore -------------------------------------

  test("unigramScore: hand-computed mean log-probability") {
    val docs = Seq(
      (1L, Some("a a b")),
      (2L, Some("b c")),
      (3L, None)
    ).toDF("doc_id", "text")
    val lm = Curation.fitUnigramLm(docs, "text")
    // counts: a=2 b=2 c=1, total=5
    assert(lm.as[(String, Long, Long)].collect().toSet ===
      Set(("a", 2L, 5L), ("b", 2L, 5L), ("c", 1L, 5L)))
    val r = Curation.unigramScore(docs, lm, "doc_id", "text")
      .as[(Long, Long, Option[Double])].collect().map(t => t._1 -> t).toMap
    val round6 = (x: Double) => BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r(1L) === ((1L, 3L, Some(round6(math.log(0.4))))))
    assert(r(2L) === ((2L, 2L, Some(round6((math.log(0.4) + math.log(0.2)) / 2)))))
    assert(r(3L) === ((3L, 0L, None)))
  }

  test("unigramScore: OOV tokens score ln(oovDiscount/total)") {
    val corpus = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val lm = Curation.fitUnigramLm(corpus, "text")
    val batch = Seq((10L, "a z")).toDF("doc_id", "text") // z is out-of-vocab
    val r = Curation.unigramScore(batch, lm, "doc_id", "text")
      .as[(Long, Long, Option[Double])].collect().head
    val expected = (math.log(2.0 / 5) + math.log(0.5 / 5)) / 2
    assert(r._2 === 2L)
    assert(math.abs(r._3.get - expected) < 1e-6)
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

  test("blocklistFilter is token-exact and case-insensitive") {
    val docs = Seq(
      (1L, "Clean text only"),
      (2L, "the Bad word bad again crap"),
      (3L, "scrap and crap-free and badword survive"), // substrings ≠ tokens
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val r = Curation.blocklistFilter(docs, "doc_id", "text", Seq("BAD", "crap"))
      .orderBy("doc_id")
      .as[(Long, Long, Seq[String], Boolean)].collect()
    assert(r(0) === ((1L, 0L, Seq(), true)))
    assert(r(1) === ((2L, 3L, Seq("bad", "crap"), false))) // 2×bad + 1×crap
    assert(r(2) === ((3L, 0L, Seq(), true))) // the clbuttic-mistake guard
    assert(r(3) === ((4L, 0L, Seq(), true)))
    intercept[IllegalArgumentException] {
      Curation.blocklistFilter(docs, "doc_id", "text", Nil)
    }
  }

  // ---- perplexityBuckets -------------------------------------------------

  test("perplexityBuckets: tercile cutoffs order docs head/middle/tail") {
    // 3 docs with strictly ordered LM scores: "a" dominates the corpus
    // (highest per-token log-prob), "z q" is all-rare; with tercile
    // cutoffs interpolated between the three scores, each doc is its
    // own bucket
    val docs = Seq(
      (1L, "a a a a a a a a"),
      (2L, "a a b b"),
      (3L, "z q")).toDF("doc_id", "text")
    val lm = Curation.fitUnigramLm(docs, "text")
    val r = Curation.perplexityBuckets(docs, lm, "doc_id", "text")
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    assert(r === Map(1L -> "head", 2L -> "middle", 3L -> "tail"))
  }

  test("perplexityBuckets: null/empty text buckets to tail; fracs validated") {
    val docs = Seq((1L, "a a a"), (2L, "a b"), (3L, null: String), (4L, ""))
      .toDF("doc_id", "text")
    val lm = Curation.fitUnigramLm(docs, "text")
    val r = Curation.perplexityBuckets(docs, lm, "doc_id", "text")
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    assert(r(3L) === "tail" && r(4L) === "tail")
    intercept[IllegalArgumentException] {
      Curation.perplexityBuckets(docs, lm, "doc_id", "text",
        lowFrac = 0.7, highFrac = 0.3)
    }
  }

  // ---- gopherRules -------------------------------------------------------

  test("gopherRules: each rule verdict is independently attributable") {
    val fifty = (1 to 50).map(i => s"word$i").mkString(" ")
    val docs = Seq(
      (1L, fifty + " the a"),                       // passes everything
      (2L, "too short the a"),                      // fails word count only
      (3L, fifty + " the a " + "# ## ###".repeat(4)), // symbol ratio > 0.1
      (4L, (1 to 60).map(_ => "77").mkString(" ")), // no alpha, no stops, len 2
      (5L, null: String), (6L, "  "))               // blank/null: n_words 0
      .toDF("doc_id", "text")
    val r = Curation.gopherRules(docs, "doc_id", "text",
      Seq("the", "a", "of", "and", "to", "in", "is"))
      .select("doc_id", "n_words", "ok_word_count", "ok_mean_len",
        "ok_symbols", "ok_alpha", "ok_stopwords", "passes_gopher")
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getBoolean(7))
    assert(!r(2L).getBoolean(2) && r(2L).getBoolean(4) && !r(2L).getBoolean(7))
    assert(!r(3L).getBoolean(4) && !r(3L).getBoolean(7)) // symbols kill it
    assert(!r(4L).getBoolean(5) && !r(4L).getBoolean(6)) // alpha + stopwords
    assert(!r(4L).getBoolean(3)) // mean len 2 < 3
    Seq(5L, 6L).foreach { i =>
      assert(r(i).getLong(1) === 0L && !r(i).getBoolean(7))
    }
    intercept[IllegalArgumentException] {
      Curation.gopherRules(docs, "doc_id", "text", Nil)
    }
  }

  test("gopherRules: exact ratios (one integer division each)") {
    val docs = Seq((1L, "ab cdef #tag 42")).toDF("doc_id", "text")
    val r = Curation.gopherRules(docs, "doc_id", "text", Seq("the"),
      minWords = 1)
      .select("n_words", "mean_word_len", "symbol_ratio", "alpha_frac")
      .as[(Long, Double, Double, Double)].head()
    assert(r === ((4L, 12.0 / 4, 1.0 / 4, 3.0 / 4)))
  }

  // ---- sourceQualityStats ------------------------------------------------

  test("sourceQualityStats: both verdict arms cut; dup_ratio is exact") {
    val good = "the quick brown fox jumps over a lazy dog and runs to the hills"
    val docs = Seq(
      (1L, "clean", good), (2L, "clean", good + " again today"),
      (3L, "dupey", good), (4L, "dupey", "the  QUICK brown fox jumps over a lazy dog and runs to the hills"),
      (5L, "junk", "x x x x"), (6L, "junk", "y y"))
      .toDF("doc_id", "source", "text")
    val r = Curation.sourceQualityStats(docs, "text", "source",
      Seq("the", "a", "of", "and", "to", "in", "is"),
      minMeanQuality = 0.3, maxDupRatio = 0.25)
      .select("source", "n_docs", "dup_ratio", "keep_source")
      .as[(String, Long, Double, Boolean)].collect()
      .map(t => t._1 -> t).toMap
    assert(r("clean") === (("clean", 2L, 0.0, true)))
    // docs 3/4 normalize to the same text -> 1 distinct of 2
    assert(r("dupey")._3 === 0.5 && !r("dupey")._4)
    assert(r("junk")._3 === 0.0 && !r("junk")._4) // fails on quality, not dups
  }

  test("sourceQualityStats: quantized mean is partition-order free") {
    val docs = (1L to 97L)
      .map(i => (i, s"s${i % 3}", s"doc $i has words like alpha beta gamma delta number$i"))
      .toDF("doc_id", "source", "text")
    val sw = Seq("the", "a", "of", "and", "to", "in", "is")
    val one = Curation.sourceQualityStats(docs.coalesce(1), "text", "source", sw, 0.5, 0.5)
      .orderBy("source").collect().toSeq
    val many = Curation.sourceQualityStats(docs.repartition(13), "text", "source", sw, 0.5, 0.5)
      .orderBy("source").collect().toSeq
    assert(one === many)
  }

  // ---- importanceWeights (DSIR) ----------------------------------------

  test("importanceWeights: hand-computed add-one-smoothed log ratios") {
    // vocab {cat, dog}, V=2; target: ct(cat)=2, ct(dog)=0, Nt=2;
    // rest: cr(cat)=0, cr(dog)=1, Nr=1.
    //   w_q(cat) = ⌊1e6·(ln(3/4) − ln(1/3))⌋ = ⌊1e6·ln(9/4)⌋ = 810930
    //   w_q(dog) = ⌊1e6·(ln(1/4) − ln(2/3))⌋ = ⌊−980829.25…⌋ = −980830
    val docs = Seq(
      (1L, "cat cat", "tgt"),
      (2L, "dog", "other")).toDF("doc_id", "text", "source")
    val r = Curation.importanceWeights(docs, "doc_id", "text", "source", "tgt")
      .orderBy("doc_id").collect()
    assert(r(0).getAs[Long]("n_tokens") === 2L)
    assert(r(0).getAs[Long]("dsir_weight_q") === 2L * 810930L)
    assert(r(1).getAs[Long]("n_tokens") === 1L)
    assert(r(1).getAs[Long]("dsir_weight_q") === -980830L)
    assert(r(1).getAs[Double]("dsir_weight") === -0.98083)
  }

  test("importanceWeights: zero-token docs surface with weight 0") {
    val docs = Seq(
      (1L, "alpha beta", "tgt"),
      (2L, "", "other"),
      (3L, "   ", "other")).toDF("doc_id", "text", "source")
    val r = Curation.importanceWeights(docs, "doc_id", "text", "source", "tgt")
      .orderBy("doc_id").collect()
    assert(r.length === 3)
    assert(r(1).getAs[Long]("n_tokens") === 0L)
    assert(r(1).getAs[Long]("dsir_weight_q") === 0L)
    assert(r(2).getAs[Long]("n_tokens") === 0L)
    assert(r(2).getAs[Double]("dsir_weight") === 0.0)
  }

  test("importanceWeights: absent target source degrades, does not crash") {
    // no doc has the target source → ct=0 for every term; smoothing keeps
    // the ratio finite and every weight ≤ 0 (target model is uniform 1/(0+V))
    val docs = Seq(
      (1L, "x y z", "a"),
      (2L, "x q", "b")).toDF("doc_id", "text", "source")
    val r = Curation.importanceWeights(docs, "doc_id", "text", "source", "missing")
      .orderBy("doc_id").collect()
    assert(r.length === 2)
    assert(r.forall(_.getAs[Long]("dsir_weight_q") <= 0L))
  }

  test("bigramScore: hand-computed add-one smoothing, short docs, OOV") {
    // corpus: "a b a b" + "a c" + "x". transitions: (a,b)x2, (b,a)x1,
    // (a,c)x1. c1: a·=3, b·=1. V = 4 (a, b, c, x — the single-token doc
    // still contributes to the unigram vocabulary).
    //   lp(a,b) = ln(3/7), lp(b,a) = ln(2/5), lp(a,c) = ln(2/7)
    val docs = Seq((1L, "a b a b"), (2L, "a c"), (3L, "x"), (4L, "")).toDF("doc_id", "text")
    val lm = Curation.fitBigramLm(docs, "text")
    val r = Curation.bigramScore(docs, lm, "doc_id", "text")
      .orderBy("doc_id").collect()
    def q(p: Double) = math.floor(1e6 * math.log(p)).toLong
    assert(r(0).getAs[Long]("n_trans") === 3L)
    assert(r(0).getAs[Long]("bigram_lp_q") === 2 * q(3.0 / 7) + q(2.0 / 5))
    assert(r(1).getAs[Long]("n_trans") === 1L)
    assert(r(1).getAs[Long]("bigram_lp_q") === q(2.0 / 7))
    // single-token and empty docs: no transitions, mean null
    assert(r(2).getAs[Long]("n_trans") === 0L)
    assert(r(2).isNullAt(r(2).fieldIndex("bigram_lp_mean")))
    assert(r(3).getAs[Long]("bigram_lp_q") === 0L)
    // scoring a NEW batch: unseen bigram with seen context (a,a) →
    // ln(1/(3+4)); unseen context (z,z) → ln(1/4)
    val novel = Seq((10L, "a a"), (11L, "z z")).toDF("doc_id", "text")
    val n = Curation.bigramScore(novel, lm, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(n(0).getAs[Long]("bigram_lp_q") === q(1.0 / 7))
    assert(n(1).getAs[Long]("bigram_lp_q") === q(1.0 / 4))
  }

  test("bigramScore: partition-order free (1 vs 17 partitions)") {
    val docs = (1L to 80L)
      .map(i => (i, s"t${i % 5} t${i % 7} t${i % 5} t${i % 3}"))
      .toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) = {
      val lm = Curation.fitBigramLm(df, "text")
      Curation.bigramScore(df, lm, "doc_id", "text")
        .orderBy("doc_id").collect().toSeq
    }
    assert(run(docs.coalesce(1)) === run(docs.repartition(17)))
  }

  test("importanceWeights: partition-order free (1 vs 17 partitions)") {
    val docs = (1L to 60L)
      .map(i => (i, s"tok${i % 7} tok${i % 11} shared", s"src${i % 3}"))
      .toDF("doc_id", "text", "source")
    val one = Curation.importanceWeights(docs.coalesce(1),
      "doc_id", "text", "source", "src1").orderBy("doc_id").collect().toSeq
    val many = Curation.importanceWeights(docs.repartition(17),
      "doc_id", "text", "source", "src1").orderBy("doc_id").collect().toSeq
    assert(one === many)
  }

  // ---- curriculumBins ----------------------------------------------------

  private val Stop = Seq("the", "a", "of", "and", "to", "in", "is")

  test("curriculumBins: two-pass rank equals the ntile window semantics") {
    // 10 docs, 4 bins → ntile sizes 3,3,2,2 (uneven split exercises the
    // big-tile/small-tile boundary the evenly-divisible gate corpus skips)
    val docs = (1L to 10L)
      .map(i => (i, ("tok" + i + " ") * i.toInt + "the end"))
      .toDF("doc_id", "text")
    val got = Curation.curriculumBins(docs, "doc_id", "text", Stop, nBins = 4)
      .orderBy("bin").collect()
    assert(got.map(_.getAs[Long]("n_docs")).toSeq === Seq(3L, 3L, 2L, 2L))
    // the same aggregate computed through Spark's own single-window ntile
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__score").desc, col("doc_id").asc)
    val expected = docs.select(col("doc_id"),
      graft.functions.TextFns.tokenCount(col("text")).cast("long").as("__tok"),
      coalesce(graft.functions.TextFns.qualityScore(col("text"), Stop),
        lit(-1.0)).as("__score"))
      .withColumn("bin", ntile(4).over(w))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"), sum(col("__tok")).as("sum_tokens"),
        min(col("__score")).as("min_quality"),
        max(col("__score")).as("max_quality"))
      .orderBy("bin").collect()
    assert(got.toSeq === expected.toSeq)
  }

  test("curriculumBins: null text scores -1 and lands in the last bin") {
    val docs = Seq((1L, "the rich and varied text of a long document"),
      (2L, "middle quality words here"), (3L, null.asInstanceOf[String]),
      (4L, "the and of to in is the and of")).toDF("doc_id", "text")
    val r = Curation.curriculumBins(docs, "doc_id", "text", Stop, nBins = 4)
      .orderBy("bin").collect()
    assert(r.length === 4)
    assert(r.last.getAs[Double]("min_quality") === -1.0)
    assert(r.last.getAs[Double]("max_quality") === -1.0)
  }

  test("curriculumBins: nBins > corpus size degrades to one doc per bin") {
    val docs = Seq((1L, "alpha beta"), (2L, "gamma delta epsilon"))
      .toDF("doc_id", "text")
    val r = Curation.curriculumBins(docs, "doc_id", "text", Stop, nBins = 5)
      .orderBy("bin").collect()
    assert(r.length === 2)
    assert(r.forall(_.getAs[Long]("n_docs") == 1L))
    assert(r.map(_.getAs[Int]("bin")).toSeq === Seq(1, 2))
  }

  test("curriculumBins: partition-order free") {
    val docs = (1L to 57L)
      .map(i => (i, Seq.fill((i % 13 + 1).toInt)("w" + i % 7).mkString(" ")))
      .toDF("doc_id", "text")
    val one = Curation.curriculumBins(docs.coalesce(1), "doc_id", "text",
      Stop, nBins = 4).orderBy("bin").collect().toSeq
    val many = Curation.curriculumBins(docs.repartition(11), "doc_id", "text",
      Stop, nBins = 4).orderBy("bin").collect().toSeq
    assert(one === many)
  }

  test("knBigramScore: hand-computed KN probabilities; interpolated mass sums to 1") {
    // corpus: "a b a b" + "b a c" → c12 {(a,b):2,(b,a):2,(a,c):1},
    // c1 {a:3,b:2}, n1p {a:2,b:1}, n1m {a:1,b:1,c:1}, B=3, V=3
    val docs = Seq((1L, "a b a b"), (2L, "b a c")).toDF("doc_id", "text")
    val lm = Curation.fitKnBigramLm(docs, "text")
    def p(c12: Long, n1p: Long, n1m: Long, c1: Long): Double =
      (math.max(4 * c12 - 3, 0) * 3 + 3 * n1p * n1m).toDouble / (4.0 * 3 * c1)
    // interpolated KN is a proper distribution over the vocab:
    // P(a|a)+P(b|a)+P(c|a) = 6/36 + 21/36 + 9/36 = 1
    assert(p(0, 2, 1, 3) + p(2, 2, 1, 3) + p(1, 2, 1, 3) === 1.0)
    def q(x: Double): Long = math.floor(1e6 * math.log(x)).toLong
    val expected1 = 2 * q(p(2, 2, 1, 3)) + q(p(2, 1, 1, 2)) // a→b, a→b, b→a
    val expected2 = q(p(2, 1, 1, 2)) + q(p(1, 2, 1, 3))     // b→a, a→c
    val r = Curation.knBigramScore(docs, lm, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(r === Seq((1L, 3L, expected1, expected1 / 1e6 / 3),
      (2L, 2L, expected2, expected2 / 1e6 / 2)))
    // backoffs on a NEW batch: unseen context, and a seen context whose
    // target never continues anything — both floor to ln(1/V)
    val fresh = Seq((9L, "z q"), (10L, "a z")).toDF("doc_id", "text")
    val rf = Curation.knBigramScore(fresh, lm, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(rf.map(_._3) === Seq(q(1.0 / 3), q(1.0 / 3)))
  }

  test("corpusDiff: four statuses; whitespace/case churn is unchanged; null text is not 'added'") {
    val old = Seq((1L, "Alpha  Beta"), (2L, "gone"), (3L, "same"),
      (4L, "was this"), (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val neu = Seq((1L, "alpha beta"),   // case+whitespace fold → unchanged
      (3L, "same"), (4L, "now that"),   // changed
      (5L, null.asInstanceOf[String]),  // null in both → unchanged
      (9L, "fresh")).toDF("doc_id", "text")
    val r = Curation.corpusDiff(old, neu, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(r === Map(1L -> "unchanged", 2L -> "removed", 3L -> "unchanged",
      4L -> "changed", 5L -> "unchanged", 9L -> "added"))
    // null text appearing where a doc was absent is added, not invisible
    val neu2 = Seq((7L, null.asInstanceOf[String])).toDF("doc_id", "text")
    assert(Curation.corpusDiff(old.filter(col("doc_id") === 3L), neu2,
      "doc_id", "text").as[(Long, String)].collect().toMap ===
      Map(3L -> "removed", 7L -> "added"))
  }

  test("vocabStats: hand-computed type/hapax counts; blank docs add nothing") {
    val docs = Seq(
      ("s1", "a b a c"),     // tokens 4, types {a:2, b:1, c:1}, hapax 2
      ("s1", "a d"),         // a→3, d→1 → s1: N=6, V=4, hapax {b,c,d}=3
      ("s2", "x x x"),       // N=3, V=1, hapax 0
      ("s2", ""),            // blank → [""] → dropped
      ("s3", "u v w")        // N=3, V=3, hapax 3
    ).toDF("source", "text")
    val r = Curation.vocabStats(docs, "text", "source")
      .orderBy("source")
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(r === Seq(("s1", 6L, 4L, 3L, 0.75), ("s2", 3L, 1L, 0L, 0.0),
      ("s3", 3L, 3L, 3L, 1.0)))
  }

  test("kAnonSuppress: groups under k vanish wholesale; grp_n attached") {
    val df = Seq(
      ("click", 1L), ("click", 1L), ("click", 1L), // group of 3
      ("click", 2L),                               // group of 1
      ("view", 1L), ("view", 1L)                   // group of 2
    ).toDF("etype", "uid")
    val r = Curation.kAnonSuppress(df, Seq("etype", "uid"), k = 2)
      .select("etype", "uid", "grp_n")
      .as[(String, Long, Long)].collect().toSeq
    assert(r.count(t => t._1 == "click" && t._2 == 1L && t._3 == 3L) === 3)
    assert(r.count(t => t._1 == "view" && t._2 == 1L && t._3 == 2L) === 2)
    assert(!r.exists(_._2 == 2L), "singleton group must be suppressed")
    // k = 1 keeps everything
    assert(Curation.kAnonSuppress(df, Seq("etype", "uid"), k = 1)
      .count() === 6)
  }

  test("timeSplit: exact rational cutoff, embargo band labeled") {
    // 10 rows at ts 1..10 → 4/5-quantile rank = ceil(8) = 8 → cutoff 8
    val df = (1L to 10L).map(i => (i, i * 1000000L)).toDF("id", "us")
    val r = Curation.timeSplit(df, "us", num = 4, den = 5,
      embargoMicros = 1000000L, bucketWidth = 1000000L)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert((1L to 8L).forall(r(_) == "train"))
    assert(r(9L) === "embargo") // 8 < 9 <= 8+1
    assert(r(10L) === "valid")
    // zero embargo → no embargo rows
    val r0 = Curation.timeSplit(df, "us", num = 4, den = 5,
      embargoMicros = 0L, bucketWidth = 1000000L)
      .select("split").as[String].collect()
    assert(!r0.contains("embargo"))
  }

  test("pmiPairs: hand-computed window-2 pairs and quantized PMI") {
    val docs = Seq((1L, "a b c a"), (2L, ""), (3L, "solo"))
      .toDF("doc_id", "text")
    val r = Curation.pmiPairs(docs, "doc_id", "text", window = 2)
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4, t._5, t._6))).toMap
    // doc 1 pairs: (1,2)ab (1,3)ac (2,3)bc (2,4)ab (3,4)ac → ab:2 ac:2 bc:1
    // unigrams include 'solo': a=2 b=1 c=1 solo=1, N=5; P=5
    def q(cxy: Long, cx: Long, cy: Long) =
      math.floor(1e6 * math.log(cxy.toDouble * 25.0 / (5.0 * cx * cy))).toLong
    assert(r(("a", "b")) === ((2L, 2L, 1L, q(2, 2, 1))))
    assert(r(("a", "c")) === ((2L, 2L, 1L, q(2, 2, 1))))
    assert(r(("b", "c")) === ((1L, 1L, 1L, q(1, 1, 1))))
    assert(r.size === 3, "blank/single-token docs contribute no pairs")
    // minCount prunes the tail
    assert(Curation.pmiPairs(docs, "doc_id", "text", window = 2,
      minCount = 2L).count() === 2)
  }

  test("sourceZScores: exact-moment z, null for degenerate source") {
    val docs = Seq(
      (1L, "w", "s1"), (2L, "w w w", "s1"), // counts 1, 3 → mean 2, std 1
      (3L, "x y", "s2")                     // single doc → std 0 → null
    ).toDF("doc_id", "text", "source")
    val r = Curation.sourceZScores(docs, "doc_id", "text", "source")
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(2), Option(x.get(3))))).toMap
    assert(r(1L) === ((1L, Some(-10000L))))
    assert(r(2L) === ((3L, Some(10000L))))
    assert(r(3L) === ((2L, None)))
  }

  test("keyness: hand-computed chi2 on a 2-source corpus") {
    val docs = Seq((1L, "x x y", "s1"), (2L, "y z z z", "s2"))
      .toDF("doc_id", "text", "source")
    val r = Curation.keyness(docs, "text", "source", minCount = 1L, k = 10)
      .as[(String, Int, String, Long, Long)].collect()
      .map(t => (t._1, t._3) -> ((t._2, t._4, t._5))).toMap
    // (s1,x): a=2 b=0 c=1 d=4 → chi2 = 7·64/(2·5·3·4) = 3.7333 → 373
    assert(r(("s1", "x")) === ((1, 2L, 373L)))
    // (s1,y): a=1 b=1 c=2 d=3 → chi2 = 7/120 = 0.0583 → 5
    assert(r(("s1", "y")) === ((2, 1L, 5L)))
    // (s2,z): a=3 b=0 c=1 d=3 → chi2 = 7·81/144 = 3.9375 → 393
    assert(r(("s2", "z")) === ((1, 3L, 393L)))
    // (s2,y): ad < bc (negative association) → absent
    assert(!r.contains(("s2", "y")))
  }

  test("mlmMaskPlan: deterministic, ~15% coverage, action bands hold") {
    val docs = Seq((1L, ("tok " * 400).trim), (2L, "")).toDF("doc_id", "text")
    val r1 = Curation.mlmMaskPlan(docs, "doc_id", "text")
      .as[(Long, Long, String, String, Double)].collect().sortBy(t => (t._1, t._2))
    val r2 = Curation.mlmMaskPlan(docs, "doc_id", "text")
      .as[(Long, Long, String, String, Double)].collect().sortBy(t => (t._1, t._2))
    assert(r1.toSeq === r2.toSeq, "plan must be bit-deterministic")
    assert(r1.nonEmpty && r1.forall(_._1 === 1L), "empty doc emits nothing")
    // coverage near 15% of 400 positions (hash-uniform, loose band)
    assert(r1.length > 30 && r1.length < 90, s"got ${r1.length}")
    assert(r1.forall(t => t._2 >= 1 && t._2 <= 400))
    assert(r1.forall(t => Set("mask", "random", "keep").contains(t._4)))
    assert(r1.forall(_._5 < 0.15))
    // mask dominates (80% of selected)
    assert(r1.count(_._4 == "mask") > r1.length / 2)
    // a different salt reshuffles the plan
    val r3 = Curation.mlmMaskPlan(docs, "doc_id", "text", salt = "mlm2")
      .as[(Long, Long, String, String, Double)].collect()
    assert(r3.map(_._2).toSet !== r1.map(_._2).toSet)
  }

  test("vocabCoverage: top-N cut with deterministic ties, OOV share") {
    // corpus counts: a=4, b=2, c=1, d=1 → vocab(2) = {a, b}
    val docs = Seq((1L, "a a b c", "s1"), (2L, "a a b d", "s2"))
      .toDF("doc_id", "text", "source")
    val r = Curation.vocabCoverage(docs, "text", "source", vocabSize = 2)
      .as[(String, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    // each source: 4 tokens, 1 OOV → 250000
    assert(r("s1") === ((4L, 1L, 250000L)))
    assert(r("s2") === ((4L, 1L, 250000L)))
    // vocab big enough -> zero OOV everywhere
    val r2 = Curation.vocabCoverage(docs, "text", "source", vocabSize = 10)
      .as[(String, Long, Long, Long)].collect()
    assert(r2.forall(_._3 === 0L))
  }

  test("burstiness: hand-computed VMR; Poisson-ish term ranks below") {
    // 4 docs; 'x' all in one doc (c=4): s=4 ss=16
    //   mean=1, e2=4, vmr=(4-1)/1=3 → 30000
    // 'y' spread 1 per doc: s=4 ss=4, vmr=(1-1)/1=0 → 0
    val docs = Seq((1L, "x x x x y"), (2L, "y"), (3L, "y"), (4L, "y"))
      .toDF("doc_id", "text")
    val r = Curation.burstiness(docs, "doc_id", "text", nDocs = 4L,
      minDf = 1L, k = 10)
      .as[(Int, String, Long, Long, Long)].collect()
      .map(t => t._2 -> ((t._1, t._3, t._4, t._5))).toMap
    assert(r("x") === ((1, 1L, 4L, 30000L)))
    assert(r("y") === ((2, 4L, 4L, 0L)))
    // minDf prunes x (df 1)
    assert(Curation.burstiness(docs, "doc_id", "text", 4L, minDf = 2L,
      k = 10).as[(Int, String, Long, Long, Long)].collect()
      .map(_._2).toSeq === Seq("y"))
  }

  test("corpusHealthCard: dup share, vocab health, OOV per source") {
    val docs = Seq(
      (1L, "a a b", "s1"), (2L, "A  a B", "s1"), // normalized dups
      (3L, "c d", "s1"),
      (4L, "a z", "s2")
    ).toDF("doc_id", "text", "source")
    val r = Curation.corpusHealthCard(docs, "doc_id", "text", "source",
      vocabSize = 3)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(t => t._1 -> t).toMap
    // s1: 3 docs, docs 1+2 normalize equal → 2 dups → dup_q=666666
    val s1 = r("s1")
    assert((s1._2, s1._3, s1._4) === ((3L, 2L, 666666L)))
    // s1 tokens: a,a,b,a,a,b,c,d = 8; types {a,b,c,d}; hapax {c,d}
    assert((s1._5, s1._6, s1._7) === ((8L, 4L, 2L)))
    // corpus counts: a=5,b=2,c=1,d=1,z=1 → vocab(3)={a,b,c} (ties c<d<z)
    // s1 OOV: d → 1 of 8; s2 OOV: z → 1 of 2
    assert((s1._8, s1._9) === ((1L, 125000L)))
    val s2 = r("s2")
    assert((s2._2, s2._3, s2._4) === ((1L, 0L, 0L)))
    assert((s2._8, s2._9) === ((1L, 500000L)))
  }

  test("codeSwitchSignals: chunk langs, switches, dominant share") {
    // doc 1: 2 chunks english, 1 chunk spanish → 1 switch, dom en 2/3
    val en = "the cat and the dog of the house is in town now then"
    val enTail = "to go and to stay in the end is all of it here"
    val es = "el perro y la casa de los gatos que son las flores aqui"
    val docs = Seq(
      (1L, s"$en x y z a b c d e f ${enTail} p q r s t u v w ${es} m n o p"),
      (2L, "the of and is a to in")  // one chunk, en
    ).toDF("doc_id", "text")
    val r = Curation.codeSwitchSignals(docs, "doc_id", "text",
      chunkSize = 20)
      .as[(Long, Long, Long, Long, String, Long)].collect()
      .map(t => t._1 -> t).toMap
    val d1 = r(1L)
    assert(d1._2 === 3L, s"expected 3 chunks, got $d1")
    assert(d1._3 === 2L) // en + es
    assert(d1._4 === 1L) // one boundary switch
    assert(d1._5 === "en")
    assert(d1._6 === math.floor(1e6 * 2.0 / 3.0).toLong)
    assert(r(2L) === ((2L, 1L, 1L, 0L, "en", 1000000L)))
  }

  test("preferencePairs: halves pair up, odd middle skipped") {
    // source s: token counts 1..5 (ids 1..5) → half=2, pairs
    // (rank1,rank4)=(id1,id4), (rank2,rank5)=(id2,id5); id3 unpaired
    val docs = (1 to 5).map(i => (i.toLong, ("w " * i).trim, "s"))
      .toDF("doc_id", "text", "source")
    val r = Curation.preferencePairs(docs, "doc_id", "text", "source")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .sortBy(_._2)
    assert(r.length === 2)
    assert(r(0) === (("s", 1L, 4L, 1L, 4L, 3L)))
    assert(r(1) === (("s", 2L, 5L, 2L, 5L, 3L)))
    // even group: all docs pair
    val docs4 = (1 to 4).map(i => (i.toLong, ("w " * i).trim, "s"))
      .toDF("doc_id", "text", "source")
    assert(Curation.preferencePairs(docs4, "doc_id", "text", "source")
      .count() === 2)
  }

  test("spanCorruptPlan: deterministic blocks, tail span length") {
    val docs = Seq((1L, ("tok " * 301).trim)).toDF("doc_id", "text")
    // 301 tokens → 101 blocks (last block = 1 token)
    val r1 = Curation.spanCorruptPlan(docs, "doc_id", "text",
      spanLen = 3, rate = 0.3)
      .as[(Long, Long, Long, Long, Int, Double)].collect().sortBy(_._2)
    val r2 = Curation.spanCorruptPlan(docs, "doc_id", "text",
      spanLen = 3, rate = 0.3)
      .as[(Long, Long, Long, Long, Int, Double)].collect().sortBy(_._2)
    assert(r1.toSeq === r2.toSeq)
    assert(r1.nonEmpty && r1.length < 70, s"rate 0.3 of 101: ${r1.length}")
    assert(r1.forall(t => t._3 === t._2 * 3 + 1), "span_start = 3b+1")
    assert(r1.forall(t => t._4 === (if (t._2 == 100L) 1L else 3L)),
      "tail block spans 1 token, others 3")
    assert(r1.map(_._5).toSeq === (1 to r1.length).toSeq,
      "sentinels number selected blocks densely")
  }

  test("classWeights: balanced heuristic, quantized floor") {
    // labels: a x 6, b x 3, c x 1 → N=10, K=3
    val df = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq("c"))
      .toDF("label")
    val r = Curation.classWeights(df, "label")
      .as[(String, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(r("a") === ((6L, math.floor(1e6 * 10.0 / 18.0).toLong)))
    assert(r("b") === ((3L, math.floor(1e6 * 10.0 / 9.0).toLong)))
    assert(r("c") === ((1L, math.floor(1e6 * 10.0 / 3.0).toLong)))
  }

  // ---- tokenEntropy ----------------------------------------------------

  test("tokenEntropy: uniform, degenerate, and empty docs") {
    val docs = Seq(
      (1L, "a b c d"),      // uniform over 4 types → H = ln 4
      (2L, "x x x x x"),    // one type → H = 0
      (3L, ""),             // empty → zero tokens, null entropy
      (4L, "a a b"))        // H = ln3 − (2·ln2)/3
      .toDF("doc_id", "text")
    val r = Curation.tokenEntropy(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), Option(x.get(3))))).toMap
    // per-term quantization: q_t = floor(1e6·c·ln c); H_q = floor(1e6·ln n) − S div n
    assert(r(1L) === ((4L, 4L,
      Some(math.floor(1e6 * math.log(4.0)).toLong))))
    assert(r(2L) === ((5L, 1L,
      Some(math.floor(1e6 * math.log(5.0)).toLong -
        math.floor(1e6 * 5.0 * math.log(5.0)).toLong / 5))))
    assert(r(3L) === ((0L, 0L, None)))
    val s4 = math.floor(1e6 * 2.0 * math.log(2.0)).toLong
    assert(r(4L) === ((3L, 2L,
      Some(math.floor(1e6 * math.log(3.0)).toLong - s4 / 3))))
  }

  test("tokenEntropy: degenerate doc scores strictly below diverse doc") {
    val docs = Seq((1L, "w w w w w w w w"), (2L, "a b c d e f g h"))
      .toDF("doc_id", "text")
    val r = Curation.tokenEntropy(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x.getLong(3)).toMap
    assert(r(1L) === 0L)
    assert(r(1L) < r(2L))
  }

  test("tokenEntropy: partition-order free (quantized-long sum)") {
    val docs = (1L to 50L).map(i =>
      (i, (1L to i).map(j => s"t${j % 7}").mkString(" ")))
    val a = Curation.tokenEntropy(docs.toDF("doc_id", "text").coalesce(1),
      "doc_id", "text").orderBy("doc_id").collect().toSeq
    val b = Curation.tokenEntropy(docs.toDF("doc_id", "text").repartition(13),
      "doc_id", "text").orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("lDiversity: k-large group with one sensitive value is NOT diverse") {
    val rows = Seq(
      ("a", 1L), ("a", 1L), ("a", 1L),          // 3 rows, 1 value
      ("b", 1L), ("b", 2L), ("b", 3L),          // 3 rows, 3 values
      ("c", 1L), ("c", 2L))                     // 2 rows, 2 values
    val out = Curation.lDiversity(rows.toDF("q", "s"), Seq("q"), "s", l = 3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out("a") === ((3L, 1L, false))) // k-anonymous but disclosive
    assert(out("b") === ((3L, 3L, true)))
    assert(out("c") === ((2L, 2L, false)))
  }


  test("tCloseness: ordered EMD against the corpus distribution, exact grid") {
    // A:(2,2,3) B:(1,2) C:(1,1,3); global bands {1:3, 2:3, 3:2}, N=8, m=3
    val rows = Seq(("A", 2L), ("A", 2L), ("A", 3L), ("B", 1L), ("B", 2L),
      ("C", 1L), ("C", 1L), ("C", 3L)).toDF("grp", "band")
    val out = Curation.tCloseness(rows, Seq("grp"), "band", tQ = 150000L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out("A") === ((3L, 3L, 229166L, false)))
    assert(out("B") === ((2L, 3L, 187500L, false)))
    assert(out("C") === ((3L, 3L, 187500L, false)))
  }

  test("tCloseness: a single group IS the corpus -> EMD 0, close") {
    val rows = Seq(("A", 1L), ("A", 2L), ("A", 2L)).toDF("grp", "band")
    val r = Curation.tCloseness(rows, Seq("grp"), "band", tQ = 0L).collect()(0)
    assert(r.getLong(3) === 0L && r.getBoolean(4))
  }

  // ---- dpNoisyCounts -----------------------------------------------------

  private val dpRows = Seq(
    ("web", "en"), ("web", "en"), ("web", "en"), ("web", "de"),
    ("book", "en"), ("book", null)).toDF("src", "lng")

  test("dpNoisyCounts: exact counts survive; noise is keyed and bounded") {
    val out = Curation.dpNoisyCounts(dpRows, Seq("src", "lng"),
      bQ = 2000000L, salt = "s1")
      .collect().map(r => (r.getString(0), Option(r.getString(1)),
        r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.map(t => (t._1, t._2) -> t._3).toMap === Map(
      ("web", Some("en")) -> 3L, ("web", Some("de")) -> 1L,
      ("book", Some("en")) -> 1L, ("book", None) -> 1L))
    out.foreach { case (_, _, n, noiseQ, noisyQ) =>
      assert(noisyQ === 1000000L * n + noiseQ)
      // P(|Laplace(2)| > 60) = e^-30 — a blown bound means a wrong CDF
      assert(math.abs(noiseQ) < 60000000L, s"noise_q $noiseQ implausible")
    }
  }

  test("dpNoisyCounts: deterministic per (key, salt); fresh salt, fresh noise") {
    def run(salt: String): Map[(String, Option[String]), Long] =
      Curation.dpNoisyCounts(dpRows, Seq("src", "lng"), 2000000L, salt)
        .collect()
        .map(r => (r.getString(0), Option(r.getString(1))) -> r.getLong(3))
        .toMap
    val a = run("s1"); val b = run("s1"); val c = run("s2")
    assert(a === b, "same salt must replay identical noise")
    assert(a !== c, "a fresh salt must redraw the noise")
    assert(a.values.toSet.size > 1, "noise must vary across keys")
  }

  // ---- clusterSplit --------------------------------------------------------

  test("clusterSplit: every cluster member shares one split; singletons keyed by own id") {
    val docs = (1L to 40L).toDF("id")
    // chain 1-2, 2-3 (one cluster), pair 10-11, rest singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = Curation.clusterSplit(docs, "id", pairs, 80, 10, "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byId = out.map(t => t._1 -> ((t._2, t._3))).toMap
    assert(out.length === 40)
    assert(byId(1L) === byId(2L) && byId(2L) === byId(3L))
    assert(byId(1L)._1 === 1L, "cluster id is the min member id")
    assert(byId(10L) === byId(11L))
    assert(byId(20L)._1 === 20L, "unpaired doc is its own cluster")
    val splits = out.map(_._3).toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
    assert(splits.size > 1, "40 clusters must spread across splits")
  }

  test("clusterSplit: split depends on the cluster, not the member id") {
    val docs = Seq(5L, 6L).toDF("id")
    val pairs = Seq((5L, 6L)).toDF("id_a", "id_b")
    val grouped = Curation.clusterSplit(docs, "id", pairs, 50, 25, "x")
      .collect().map(_.getString(2)).toSet
    assert(grouped.size === 1, "a linked pair must never straddle splits")
  }

  // ---- dpNoisyCounts (hand replay) ----------------------------------------

  test("dpNoisyCounts: noise matches the inverse-CDF Laplace by hand") {
    import org.apache.spark.sql.Row
    val one = Curation.dpNoisyCounts(dpRows.filter(col("src") === "web")
      .filter(col("lng") === "en"), Seq("src", "lng"), 2000000L, "s1")
      .collect()(0)
    // replay: md5 of "web:en:s1", top 15 hex chars, inverse CDF at b=2
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("web:en:s1".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    val m = java.lang.Long.parseLong(md, 16)
    val u = (m.toDouble + 0.5) / math.pow(2, 60)
    val noise = -2.0 * math.signum(u - 0.5) * math.log(1.0 - 2.0 * math.abs(u - 0.5))
    assert(one.getLong(3) === math.floor(1000000.0 * noise).toLong)
  }

  // -------------------------------------------------- stupidBackoffScore

  test("stupidBackoffScore: all three backoff branches score the " +
      "hand-computed values") {
    // corpus "a b c a b d": c(a,b,c)=1, c(a,b)=2, c(b,c)=1, cu(b)=2,
    // N=6, V=4
    val corpus = Seq((0L, "a b c a b d")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b c"),  // attested trigram: 1/2
      (3L, "x b c"),  // bigram backoff:  0.4*(1/2)
      (5L, "x y z"),  // unigram floor:   0.16*(0+1)/(6+4)
      (7L, "a b"))    // too short: zero trigrams
      .toDF("doc_id", "text")
    val out = Curation.stupidBackoffScore(docs, corpus, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def lpq(s: Double) = math.floor(1000000.0 * math.log(s)).toLong
    assert(out(1L) === ((1L, lpq(1.0 / 2.0))))
    assert(out(3L) === ((1L, lpq(0.4 * (1.0 / 2.0)))))
    assert(out(5L) === ((1L, lpq(0.16 * (1.0 / 10.0)))))
    assert(out(7L) === ((0L, 0L)))
  }

  test("stupidBackoffScore: attested trigrams always outscore their " +
      "backed-off forms") {
    val corpus = Seq((0L, "the quick brown fox jumps the quick brown cat"))
      .toDF("doc_id", "text")
    val seen = Seq((1L, "the quick brown")).toDF("doc_id", "text")
    val unseen = Seq((1L, "zzz quick brown")).toDF("doc_id", "text")
    val s1 = Curation.stupidBackoffScore(seen, corpus, "doc_id", "text")
      .collect().head.getLong(2)
    val s2 = Curation.stupidBackoffScore(unseen, corpus, "doc_id", "text")
      .collect().head.getLong(2)
    assert(s1 > s2)
  }

  test("vocabSpectrum: hand-computed K, S, R on 'a a b'") {
    val df = Seq((1L, "a a b")).toDF("doc_id", "text")
    val r = Curation.vocabSpectrum(df, "text").collect().head
    // N=3, V=2, V1=1 (b), V2=1 (a), S2 = 4+1 = 5
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((3L, 2L, 1L, 1L)))
    assert(r.getLong(4) === 10000000000L * 2 / 9) // K: 1e10·(5−3)/9
    assert(r.getLong(5) === 500000L)              // S: V2/V
    val expectR = math.floor(1.0e6 * 100.0 * math.log(3.0) /
      (1.0 - 1.0 / 2.0)).toLong
    assert(r.getLong(6) === expectR)
  }

  test("vocabSpectrum: all-hapax corpus has NULL Honore R") {
    val df = Seq((1L, "x y z")).toDF("doc_id", "text")
    val r = Curation.vocabSpectrum(df, "text").collect().head
    assert(r.getLong(2) === 3L && r.isNullAt(6))
    assert(r.getLong(4) === 0L) // S2 = N for all-hapax → K = 0
  }

  test("sourceWeightedJaccard: hand tf vectors, zero-overlap pair " +
      "still present with wjaccard 0") {
    val docs = Seq((1L, "a", "x x y"), (2L, "b", "x y y z"),
      (3L, "c", "q q")).toDF("doc_id", "src", "text")
    val out = Curation.sourceWeightedJaccard(docs, "src", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // a={x:2,y:1}, b={x:1,y:2,z:1}: min mass 2, union 3+4-2=5
    assert(out(("a", "b")) === ((2L, 5L, 400000L)))
    assert(out(("a", "c")) === ((0L, 5L, 0L)))
    assert(out(("b", "c")) === ((0L, 6L, 0L)))
  }

  test("burrowsDelta: identical sources are at distance 0, the " +
      "divergent source is strictly farther") {
    val docs = Seq((1L, "a", "x y x y z"), (2L, "b", "x y x y z"),
      (3L, "c", "q q q q q")).toDF("doc_id", "src", "text")
    val out = Curation.burrowsDelta(docs, "src", "text", topM = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getLong(2)).toMap
    assert(out(("a", "b")) === 0L)
    assert(out(("a", "c")) > 0L)
    assert(out(("a", "c")) === out(("b", "c")))
  }

  test("dispersionDP: proportional spread is 0, single-source " +
      "concentration is 1 - its size share") {
    // sources a,b each 2 tokens; 'x' only in a; 'y' in both once
    val docs = Seq((1L, "a", "x x"), (2L, "b", "y y"))
      .toDF("doc_id", "src", "text")
    val out = Curation.dispersionDP(docs, "src", "text", topM = 2)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out("x") === 500000L) // 1 - 0.5
    assert(out("y") === 500000L)
    val even = Seq((1L, "a", "x y"), (2L, "b", "x z"))
      .toDF("doc_id", "src", "text")
    val o2 = Curation.dispersionDP(even, "src", "text", topM = 1)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(o2("x") === 0L) // x spread exactly like the sizes
  }

  test("msttr: full chunks only, exact mean of segment type counts") {
    // tokens: a b | a b | c c | d(tail dropped) → types 2+2+1 over 3
    val df = Seq((1L, "g", "a b a b c c d")).toDF("doc_id", "grp", "text")
    val r = Curation.msttr(df, "grp", "doc_id", "text", chunkLen = 2)
      .collect().head
    assert(r.getLong(1) === 3L)
    assert(r.getLong(2) === 1000000L * 5 / 6)
  }

  test("msttr: docs shorter than one chunk contribute nothing") {
    val df = Seq((1L, "g", "a b c"), (2L, "h", "x y z w"))
      .toDF("doc_id", "grp", "text")
    val out = Curation.msttr(df, "grp", "doc_id", "text", chunkLen = 4)
      .collect()
    assert(out.length === 1 && out.head.getString(0) === "h")
    assert(out.head.getLong(2) === 1000000L) // 4 distinct / 4
  }

  test("kFoldPlan: content-keyed folds co-locate whitespace variants " +
      "and cover all of [0, k)") {
    val docs = Seq((1L, "a  b"), (2L, "A b "), (3L, " a B"),
      (4L, "something else entirely here"), (5L, "third distinct text"),
      (6L, "fourth distinct content"), (7L, "fifth one more"))
      .toDF("doc_id", "text")
    val out = Curation.kFoldPlan(docs, "doc_id", "text", k = 5)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // whitespace/case variants of the same content share a fold
    assert(out(1L) === out(2L) && out(2L) === out(3L))
    assert(out.values.forall(f => f >= 0 && f < 5))
    // deterministic across invocations
    val again = Curation.kFoldPlan(docs, "doc_id", "text", k = 5)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(again === out)
  }

  test("luhnAudit: textbook vectors validate, off-by-one fails, " +
      "short/long runs never candidates") {
    val docs = Seq(
      (1L, "pay 4532015112830366 now"),        // valid PAN
      (2L, "id 4532015112830367 here"),        // checksum off by one
      (3L, "num 4111111111111111 and 79927398713"), // valid + 11-digit (not a candidate)
      (4L, "12345678901234567890123 too long"), // 23 digits: not a candidate
      (5L, "no digits at all"),
      (6L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Curation.luhnAudit(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out(1L) === ((1L, 1L)))
    assert(out(2L) === ((1L, 0L)))
    assert(out(3L) === ((1L, 1L))) // the 11-digit run is below PAN length
    assert(out(4L) === ((0L, 0L)))
    assert(out(5L) === ((0L, 0L)) && out(6L) === ((0L, 0L)))
  }

  test("secretTokenAudit: hex key flags, repeated-alphabet string " +
      "scores exactly ln 2, short tokens never candidates") {
    val key = "deadbeef0123456789abcdef01234567" // 32 hex chars
    val docs = Seq(
      (1L, s"token $key end"),
      (2L, "word aAaAaAaAaAaAaAaAaAaA tail"), // 20 chars, 2 symbols
      (3L, "short b64run123 under the length floor"))
      .toDF("doc_id", "text")
    val out = Curation.secretTokenAudit(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L)._1 === 1L && out(1L)._2 === 1L)
    assert(out(1L)._3 > 2500000000L)
    // two equally-frequent symbols: H = 2 * floor(1e9 * 0.5 * ln 2)
    val ln2 = math.floor(1.0e9 * 0.5 * math.log(2.0)).toLong
    assert(out(2L) === ((1L, 0L, 2 * ln2)))
    assert(!out.contains(3L)) // no candidates -> no row (inner shape)
  }

  test("vocabIdMap: ids are contiguous frequency ranks with " +
      "deterministic term tie-break") {
    val docs = Seq((1L, "b b b a a c"), (2L, "a c d")).toDF("doc_id", "text")
    val out = Curation.vocabIdMap(docs, "text", 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // a: 3, b: 3, c: 2 -> tie (a, b) breaks term-ascending
    assert(out.toSeq === Seq((1L, "a", 3L), (2L, "b", 3L), (3L, "c", 2L)))
  }
}
