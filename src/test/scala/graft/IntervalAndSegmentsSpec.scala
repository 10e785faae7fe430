package graft

import org.apache.spark.sql.functions._

import graft.operators.{IntervalJoin, Segments}

class IntervalAndSegmentsSpec extends SparkSpec {
  import spark.implicits._

  // --------------------------------------------------------- overlapJoin

  private def pairs(l: Seq[(Long, Long, Long, Long)],
                    r: Seq[(Long, Long, Long, Long)],
                    chunk: Long): Set[(Long, Long)] = {
    val lf = l.toDF("k", "lid", "ls", "le")
    val rf = r.toDF("k", "rid", "rs", "re")
    IntervalJoin.overlapJoin(lf, rf, Seq("k"), "ls", "le", "rs", "re", chunk)
      .select("lid", "rid").collect()
      .map(row => (row.getLong(0), row.getLong(1))).toSet
  }

  test("overlapJoin: half-open semantics — touching endpoints do NOT match") {
    // [0,10) vs [10,20): no overlap; [0,10) vs [9,20): overlap
    assert(pairs(Seq((1L, 1L, 0L, 10L)), Seq((1L, 1L, 10L, 20L)), 5L)
      === Set.empty)
    assert(pairs(Seq((1L, 1L, 0L, 10L)), Seq((1L, 2L, 9L, 20L)), 5L)
      === Set((1L, 2L)))
  }

  test("overlapJoin: a pair spanning many shared chunks appears exactly once") {
    // both intervals cover chunks 0..9 with chunk=10 — ownership filter
    // must collapse the 10 candidate hits to one output row
    val out = IntervalJoin.overlapJoin(
      Seq((1L, 1L, 0L, 100L)).toDF("k", "lid", "ls", "le"),
      Seq((1L, 2L, 5L, 95L)).toDF("k", "rid", "rs", "re"),
      Seq("k"), "ls", "le", "rs", "re", 10L)
    assert(out.count() === 1L)
  }

  test("overlapJoin: key columns separate otherwise-overlapping intervals") {
    assert(pairs(Seq((1L, 1L, 0L, 10L)), Seq((2L, 2L, 0L, 10L)), 4L)
      === Set.empty)
  }

  test("overlapJoin: degenerate (end <= start) intervals match nothing") {
    assert(pairs(Seq((1L, 1L, 5L, 5L)), Seq((1L, 2L, 0L, 10L)), 4L)
      === Set.empty)
  }

  test("overlapJoin: matches the naive quadratic join on random data") {
    val rnd = new scala.util.Random(7)
    val l = (1L to 60L).map { i =>
      val s = rnd.nextInt(1000).toLong; (rnd.nextInt(3).toLong, i, s, s + 1 + rnd.nextInt(80)) }
    val r = (1L to 60L).map { i =>
      val s = rnd.nextInt(1000).toLong; (rnd.nextInt(3).toLong, i, s, s + 1 + rnd.nextInt(80)) }
    val naive = (for {
      (lk, lid, ls, le) <- l; (rk, rid, rs, re) <- r
      if lk == rk && ls < re && rs < le
    } yield (lid, rid)).toSet
    assert(pairs(l, r, 37L) === naive)
  }

  // --------------------------------------------------------- vocabGrowth

  test("vocabGrowth: prefix distincts truncate at the document length") {
    val df = Seq((1L, "a b a c"), (2L, "")).toDF("doc_id", "text")
    val out = Segments.vocabGrowth(df, "doc_id", "text", ks = Seq(2, 10))
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) === 4L)  // n_tok
    assert(out(0).getLong(2) === 3L)  // n_distinct
    assert(out(0).getLong(3) === 2L)  // d2 = {a, b}
    assert(out(0).getLong(4) === 3L)  // d10 truncates to whole doc
    assert(out(1).getLong(1) === 0L && out(1).getLong(2) === 0L &&
      out(1).getLong(3) === 0L)
  }

  // --------------------------------------------------------- maxTokenRun

  private def run(text: String): (Long, String) = {
    val r = Segments.maxTokenRun(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text").collect()(0)
    (r.getLong(1), r.getString(2))
  }

  test("maxTokenRun: finds the longest loop, not the most frequent token") {
    // 'x' appears 4 times but never consecutively; 'y y y' is the run
    assert(run("x a x y y y x b x") === (3L, "y"))
  }

  test("maxTokenRun: length ties break to the lexicographically smallest") {
    assert(run("b b a a") === (2L, "a"))
    assert(run("a a b b") === (2L, "a"))
  }

  test("maxTokenRun: single-token and empty documents") {
    assert(run("solo") === (1L, "solo"))
    assert(run("   ") === (0L, ""))
  }

  test("maxTokenRun: case folding merges runs") {
    assert(run("The THE the") === (3L, "the"))
  }

  test("charNgramProfile: sliding trigrams, deterministic top-k") {
    val docs = Seq(("en", "aaab"), ("en", "aaa"), ("en", "ab"),
      ("tie", "abcabd")).toDF("lang", "text")
    val out = Segments.charNgramProfile(docs, "lang", "text", n = 3, k = 5)
      .collect().map(r => (r.getString(0), r.getInt(3)) ->
        ((r.getString(1), r.getLong(2)))).toMap
    // "aaab" → aaa,aab; "aaa" → aaa; "ab" too short → dropped
    assert(out(("en", 1)) === (("aaa", 2L)))
    assert(out(("en", 2)) === (("aab", 1L)))
    // all-count-1 grams rank lexicographically: abc < abd < bca < cab
    assert(out(("tie", 1))._1 === "abc")
    assert(out(("tie", 2))._1 === "abd")
    assert(out(("tie", 3))._1 === "bca")
    assert(out(("tie", 4))._1 === "cab")
  }

  test("zipfSlope: matches an exact driver-side replay of the quantized kernel") {
    // exact Zipf: freq = 12/rank → 12/6/4/3, slope −1 on the ln-ln grid
    val text = (Seq.fill(12)("a") ++ Seq.fill(6)("b") ++ Seq.fill(4)("c") ++
      Seq.fill(3)("d")).mkString(" ")
    val out = Segments.zipfSlope(Seq(text).toDF("text"), "text", topK = 100)
      .collect().head
    // replay: quantize exactly as the operator does, brute-force pairs
    val freqs = Seq(12L, 6L, 4L, 3L)
    val pts = freqs.zipWithIndex.map { case (f, i) =>
      (math.floor(1000000.0 * math.log((i + 1).toDouble)).toLong,
        math.floor(1000000.0 * math.log(f.toDouble)).toLong)
    }
    val slopes = (for {
      (a, i) <- pts.zipWithIndex; b <- pts.drop(i + 1)
    } yield math.floor(1000000.0 * (b._2 - a._2).toDouble /
        (b._1 - a._1).toDouble).toLong).sorted
    val median = slopes((slopes.size + 1) / 2 - 1)
    assert(out.getLong(1) === slopes.size.toLong)
    assert(out.getLong(2) === median)
    assert(median <= -1000000L && median >= -1000002L) // exponent −1
  }

  // -------------------------------------------------- distinctNgramRatio

  test("distinctNgramRatio: hand-computed totals per n") {
    val docs = Seq(("A", "a a a"), ("A", "a a")).toDF("src", "text")
    val out = Segments.distinctNgramRatio(docs, "src", "text", Seq(1, 2, 3))
      .collect().map(r => r.getInt(1) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(1) === ((5L, 1L, 200000L)))   // 5 unigrams, 1 distinct
    assert(out(2) === ((3L, 1L, 333333L)))   // "a a" ×3
    assert(out(3) === ((1L, 1L, 1000000L)))  // "a a a" once
  }

  test("distinctNgramRatio: distinct is corpus-level, not per-doc") {
    // the same bigram in two docs counts once distinct, twice total
    val docs = Seq(("A", "x y"), ("A", "x y")).toDF("src", "text")
    val out = Segments.distinctNgramRatio(docs, "src", "text", Seq(2))
      .collect()(0)
    assert((out.getLong(2), out.getLong(3)) === ((2L, 1L)))
  }

  // ------------------------------------------------------ sentenceProfile

  test("sentenceProfile: counts, mean, max segment, terminal flag") {
    val docs = Seq(
      (1L, "Hello world. Bye now! ok"),
      (2L, "One two three."),
      (3L, ""),
      (4L, "no terminator here")).toDF("id", "text")
    val out = Segments.sentenceProfile(docs, "id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3),
          r.getLong(4), r.getBoolean(5)))).toMap
    // doc 1: 2 punctuation runs, 5 tokens, mean 2.5, segments 2/2/1
    assert(out(1L) === ((2L, 5L, 2500000L, 2L, false)))
    assert(out(2L) === ((1L, 3L, 3000000L, 3L, true)))
    assert(out(3L) === ((0L, 0L, -1L, 0L, false)))
    // no terminator: clamps to 1 sentence (the Flesch rule)
    assert(out(4L) === ((1L, 3L, 3000000L, 3L, false)))
  }

  // ----------------------------------------------------------- goodTuring

  test("goodTuring: hand count-of-counts") {
    // tokens a a b c → N=4, V=3, N1=2, N2=1
    val docs = Seq(("A", "a a b c")).toDF("src", "text")
    val out = Segments.goodTuring(docs, "src", "text").collect()(0)
    assert((out.getLong(1), out.getLong(2), out.getLong(3),
      out.getLong(4)) === ((4L, 3L, 2L, 1L)))
    assert(out.getLong(5) === 500000L)  // p_unseen = 2/4
    assert(out.getLong(6) === 1000000L) // r1* = 2·1/2
  }

  test("goodTuring: no hapax yields null discounted count") {
    val docs = Seq(("A", "a a b b")).toDF("src", "text")
    val out = Segments.goodTuring(docs, "src", "text").collect()(0)
    assert(out.getLong(3) === 0L)
    assert(out.getLong(5) === 0L)
    assert(out.isNullAt(6))
  }

  // ----------------------------------------------------------- chao1

  test("chao1: bias-corrected richness by hand") {
    // tokens a a b c: V=3, f1=2 (b,c), f2=1 (a)
    // chao1 = 3 + 2*1/(2*2) = 3.5 -> 3500000
    val docs = Seq(("A", "a a b c")).toDF("src", "text")
    val out = Segments.chao1(docs, "src", "text").collect()(0)
    assert((out.getLong(1), out.getLong(2), out.getLong(3)) ===
      ((3L, 2L, 1L)))
    assert(out.getLong(4) === 3500000L)
  }

  test("chao1: zero dis legomena stays defined (the +1 correction)") {
    // a b c: V=3, f1=3, f2=0 -> chao1 = 3 + 3*2/(2*1) = 6
    val docs = Seq(("A", "a b c")).toDF("src", "text")
    val out = Segments.chao1(docs, "src", "text").collect()(0)
    assert(out.getLong(4) === 6000000L)
  }

  test("chao1: fully saturated vocab adds nothing") {
    // every type seen >= 3 times: f1 = 0 -> chao1 = V exactly
    val docs = Seq(("A", "a a a b b b")).toDF("src", "text")
    val out = Segments.chao1(docs, "src", "text").collect()(0)
    assert(out.getLong(1) === 2L && out.getLong(4) === 2000000L)
  }

  // ------------------------------------------------------- rakeKeywords

  test("rakeKeywords: hand phrases — degree/frequency word scores and " +
      "integer phrase sums") {
    val docs = Seq(("A", 1L, "deep learning is the best deep model"))
      .toDF("src", "doc_id", "text")
    val out = Segments.rakeKeywords(docs, "src", "doc_id", "text",
      stopwords = Seq("is", "the"), maxPhraseLen = 4, topK = 10)
      .collect().map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    // freq: deep 2, learning 1, best 1, model 1
    // deg:  deep 2+3=5, learning 2, best 3, model 3
    // wq:   deep 2500000, learning 2000000, best/model 3000000
    assert(out === Map(
      "deep learning" -> ((1L, 4500000L)),
      "best deep model" -> ((1L, 8500000L))))
  }

  test("rakeKeywords: repeated phrase counts occurrences once per " +
      "appearance; maxPhraseLen drops over-long runs; topK ranks " +
      "(score DESC, phrase ASC)") {
    val docs = Seq(
      ("A", 1L, "red fox is red fox"),
      ("A", 2L, "one two three four five is x")).toDF("s", "id", "text")
    val out = Segments.rakeKeywords(docs, "s", "id", "text",
      stopwords = Seq("is"), maxPhraseLen = 4, topK = 2).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    // "one two three four five" (len 5) is dropped by maxPhraseLen;
    // "red fox": freq red 2, fox 2, deg red 4, fox 4 → wq 2e6 each,
    // phrase score 4e6, 2 occurrences; "x": wq 1e6, score 1e6
    assert(out.toSet === Set(("red fox", 2L, 4000000L), ("x", 1L, 1000000L)))
  }

  // ---- textRank ------------------------------------------------------------

  test("textRank: hub term outranks leaves on a star co-occurrence graph") {
    // "hub" is adjacent to every leaf; leaves only touch the hub
    val docs = Seq(
      (1L, "hub alpha hub beta hub gamma hub delta"),
      (2L, "hub alpha hub beta hub gamma hub delta"))
      .toDF("doc_id", "text")
    val out = Segments.textRank(docs, "doc_id", "text",
        window = 1, minCount = 2L, rounds = 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out.keySet === Set("hub", "alpha", "beta", "gamma", "delta"))
    assert(out("hub")._1 === 4L, "hub degree = 4 distinct neighbors")
    val leafRanks = (out - "hub").values.map(_._2).toSet
    assert(leafRanks.size === 1, "symmetric leaves must tie exactly")
    assert(out("hub")._2 > leafRanks.head, "hub must outrank leaves")
  }

  test("textRank: minCount support threshold prunes rare edges") {
    val docs = Seq(
      (1L, "a b a b a b"),      // (a,b) seen 5 times in window 1
      (2L, "c d"))              // (c,d) seen once
      .toDF("doc_id", "text")
    val out = Segments.textRank(docs, "doc_id", "text",
      window = 1, minCount = 2L, rounds = 2).collect()
    assert(out.map(_.getString(0)).toSet === Set("a", "b"),
      "the once-seen (c,d) edge must not enter the graph")
  }

  test("textRank: self-loops from repeated tokens are dropped") {
    val docs = Seq((1L, "x x x x x y")).toDF("doc_id", "text")
    val out = Segments.textRank(docs, "doc_id", "text",
      window = 1, minCount = 1L, rounds = 1).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("x" -> 1L, "y" -> 1L),
      "only the (x,y) edge survives; (x,x) is a self-loop")
  }

  // ---- burstiness ----------------------------------------------------------

  test("burstiness: bursty token scores above an evenly spread one") {
    // "even" once per doc (VMR -> sample var 0 -> b_q = 0);
    // "burst" 4 times in one doc, absent in 3
    val docs = Seq(
      (1L, "even burst burst burst burst"),
      (2L, "even filler"), (3L, "even filler"), (4L, "even filler"))
      .toDF("doc_id", "text")
    val out = Segments.burstiness(docs, "doc_id", "text", minDf = 1L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("even") === ((4L, 4L, 0L))) // (4*4 - 16)/((3)*4) = 0
    // burst: D=4, S=4, Q=16: (64 - 16)/(3*4) = 4 -> 4e6
    assert(out("burst") === ((1L, 4L, 4000000L)))
  }

  test("burstiness: minDf filters hapax noise") {
    val docs = Seq((1L, "a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = Segments.burstiness(docs, "doc_id", "text", minDf = 2L)
      .collect().map(_.getString(0)).toSet
    assert(out === Set("a"))
  }

  // ---- eventFunnel ---------------------------------------------------------

  private def funnel(rows: Seq[(Long, String, Long)],
                     window: Long): Map[String, Long] = {
    val df = rows.toDF("u", "t", "ts")
    graft.operators.TimeAgg.eventFunnel(df, "u", "t", "ts",
      Seq("view", "click", "buy"), window)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
  }

  test("eventFunnel: in-order completion counts; out-of-order does not") {
    val rows = Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "buy", 30L), // converts
      (2L, "click", 10L), (2L, "view", 20L), (2L, "buy", 30L), // click b4 view
      (3L, "view", 10L), (3L, "buy", 20L))                     // skips click
    // anchors: u1 view@10, u2 view@20, u3 view@10; only u1 has a
    // click AFTER its anchor (u2's click@10 precedes its view)
    val f = funnel(rows, window = 100L)
    assert(f === Map("view" -> 3L, "click" -> 1L, "buy" -> 1L))
  }

  test("eventFunnel: the window bounds the whole chain from the anchor") {
    val rows = Seq(
      (1L, "view", 0L), (1L, "click", 5L), (1L, "buy", 50L),  // buy outside
      (2L, "view", 0L), (2L, "click", 5L), (2L, "buy", 9L))   // inside
    val f = funnel(rows, window = 10L)
    assert(f === Map("view" -> 2L, "click" -> 2L, "buy" -> 1L))
  }

  test("eventFunnel: strict ordering, ties do not advance the funnel") {
    val rows = Seq((1L, "view", 10L), (1L, "click", 10L))
    val f = funnel(rows, window = 100L)
    assert(f === Map("view" -> 1L, "click" -> 0L, "buy" -> 0L))
  }

  test("eventFunnel: first-touch anchor is the documented undercount") {
    // anchor view@0 expires before click@200; the later view@150
    // would convert, but first-touch does not re-anchor
    val rows = Seq((1L, "view", 0L), (1L, "view", 150L), (1L, "click", 200L))
    val f = funnel(rows, window = 100L)
    assert(f === Map("view" -> 1L, "click" -> 0L, "buy" -> 0L))
  }
}
