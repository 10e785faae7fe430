package graft.operators

import graft.operators.Mat._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Token-sequence profile operators that look INSIDE the token stream
  * (order matters), complementing the bag-of-words signals in
  * [[Curation]]: prefix vocabulary growth (lexical diversity without
  * the length confound) and maximal consecutive-token runs (the
  * cheapest detector for degenerate generated text, which loops one
  * token — distinct from Gopher's top-fraction, which a long doc can
  * pass while still containing a pathological local loop).
  *
  * Both are pure scan-stage projections built from higher-order array
  * functions — zero shuffles, zero explodes, whole-stage codegen —
  * so at 100 TB they ride the document scan for free.
  */
object Segments {

  private def toks(textCol: String): Column =
    filter(split(lower(trim(col(textCol))), "\\s+"), t => length(t) > 0)

  /** Prefix vocabulary-growth profile: for each prefix length k in
    * `ks`, the number of DISTINCT tokens among the first k tokens
    * (`d{k}` columns), plus the full token and distinct-token counts.
    * Comparing d_k across documents at FIXED k removes the length
    * confound that makes raw type/token ratios incomparable — the
    * standard lexical-diversity correction.
    *
    * All-integer output; `slice` beyond the array end truncates, so
    * short documents report their true prefix diversity.
    */
  def vocabGrowth(docs: DataFrame, idCol: String, textCol: String,
                  ks: Seq[Int] = Seq(10, 25, 50, 100)): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ > 0), s"ks ($ks) must be positive")
    val base = docs.select(col(idCol), toks(textCol).as("__t"))
    val withKs = ks.foldLeft(base) { (df, k) =>
      df.withColumn(s"d$k",
        size(array_distinct(slice(col("__t"), 1, k))).cast("long"))
    }
    withKs.select(
      col(idCol) +:
        size(col("__t")).cast("long").as("n_tok") +:
        size(array_distinct(col("__t"))).cast("long").as("n_distinct") +:
        ks.map(k => col(s"d$k")): _*)
  }

  /** Longest run of identical consecutive tokens per document: the
    * run's length and its token (ties broken by lexicographically
    * smallest token, so the answer is total-order deterministic).
    * Zero-token documents report `(run_len = 0, run_token = '')`.
    *
    * One `aggregate()` left-to-right scan over the token array per row
    * — state is (previous token, current run, best run, best token) —
    * instead of the explode → per-doc window → gaps-and-islands
    * formulation, which shuffles every token instance and sorts it
    * again inside the window. Same answer, none of the movement.
    */
  def maxTokenRun(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol),
      aggregate(
        toks(textCol),
        struct(lit("").as("prev"), lit(0L).as("cur"),
          lit(0L).as("best"), lit("").as("btok")),
        (acc, t) => {
          val cur = when(t === acc("prev") && acc("cur") > 0,
            acc("cur") + 1L).otherwise(lit(1L))
          val better = cur > acc("best") ||
            (cur === acc("best") && t < acc("btok")) || acc("best") === 0L
          struct(t.as("prev"), cur.as("cur"),
            when(better, cur).otherwise(acc("best")).as("best"),
            when(better, t).otherwise(acc("btok")).as("btok"))
        },
        acc => struct(acc("best"), acc("btok"))
      ).as("__r"))
      .select(col(idCol), col("__r.best").as("run_len"),
        col("__r.btok").as("run_token"))

  /** Vocabulary discovery curve over ingestion batches: group
    * documents into arrival batches (`idCol div batchSize` — id order
    * stands in for arrival order), find each distinct token's FIRST
    * batch, and report per batch the newly-seen token count plus the
    * cumulative vocabulary. The corpus-growth audit that says whether
    * another crawl increment still buys new vocabulary or only
    * repeats — a flattening curve is the data-driven stop signal.
    *
    * Plan: one explode + min-aggregate per distinct token (map-side
    * combined), then all curve arithmetic on the bounded batch table
    * (one tiny window). Batches absent from the firsts (no new
    * tokens) still appear with 0.
    */
  def vocabDiscovery(docs: DataFrame, idCol: String, textCol: String,
                     batchSize: Long): DataFrame = {
    require(batchSize > 0, s"batchSize ($batchSize) must be positive")
    val batchOf = expr(s"$idCol div ${batchSize}L")
    val firsts = docs.select(batchOf.as("batch"), toks(textCol).as("__t"))
      .select(col("batch"), explode(col("__t")).as("tok"))
      .groupBy(col("tok")).agg(min(col("batch")).as("batch"))
      .groupBy(col("batch")).agg(count(lit(1)).as("n_new_terms"))
    val allBatches = docs.select(batchOf.as("batch")).distinct()
    val w = Window.orderBy(col("batch"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    allBatches.join(firsts, Seq("batch"), "left")
      .na.fill(0L, Seq("n_new_terms"))
      .withColumn("vocab_cum", sum(col("n_new_terms")).over(w))
  }

  /** Top-k character n-gram profile per group — the byte-level
    * signature behind language/script identification and
    * encoding-corruption triage (a lang bucket whose top trigrams
    * look nothing like its siblings' is mislabeled or mojibake).
    * N-grams slide over `lower(trim(text))` by CODE POINT (both
    * engines' substring semantics), counted per (group, gram); top-k
    * by (count desc, gram asc) — fully deterministic.
    *
    * Plan: the explode is scan-stage (higher-order sequence/
    * transform, no UDF), the count map-side combines to the bounded
    * (groups × distinct grams) grid, and ONLY the grid reaches the
    * per-group top-k window.
    */
  def charNgramProfile(docs: DataFrame, groupCol: String, textCol: String,
                       n: Int, k: Int): DataFrame = {
    require(n >= 1 && n <= 8, s"n ($n) must be in [1, 8]")
    require(k >= 1, s"k ($k) must be >= 1")
    // native one-walk gram generator: the HOF/substring form re-scans
    // the string from byte 0 per window (O(len²) per doc, q207)
    val grams = docs
      .select(col(groupCol), lower(trim(col(textCol))).as("__t"))
      .filter(length(col("__t")) >= n)
      .select(col(groupCol),
        explode(TextFns.charNgrams(col("__t"), n)).as("gram"))
      .groupBy(col(groupCol), col("gram")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("cnt").desc, col("gram").asc)
    grams.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Zipf-law exponent of the corpus term distribution: the Theil–Sen
    * median slope of (⌊10⁶·ln rank⌋, ⌊10⁶·ln freq⌋) over the top-K
    * terms — a healthy natural-language corpus sits near −1·10⁶ on
    * the grid; a synthetic/template-heavy one flattens, a
    * deduplicated-to-death one steepens. ln runs on INTEGER-valued
    * doubles only (the q166 ln contract), the slope median selects
    * among exact longs ([[graft.operators.Robust.theilSen]]).
    *
    * Plan: the explode+count map-side combines to the vocabulary
    * grid; ONLY that grid is sorted for top-K (K rows reach the
    * window); the pair frame is K²/2 — constant-bounded, never
    * corpus-bounded.
    */
  def zipfSlope(docs: DataFrame, textCol: String, topK: Int): DataFrame = {
    require(topK >= 3 && topK <= 10000, s"topK ($topK) must be in [3, 10000]")
    val counts = docs.select(explode(toks(textCol)).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("__f"))
    val w = Window.orderBy(col("__f").desc, col("tok").asc)
    val pts = counts
      .orderBy(col("__f").desc, col("tok").asc).limit(topK)
      .withColumn("__r", row_number().over(w))
      .select(lit("corpus").as("scope"),
        floor(lit(1000000.0) * log(col("__r").cast("double")))
          .cast("long").as("__x"),
        floor(lit(1000000.0) * log(col("__f").cast("double")))
          .cast("long").as("__y"))
    Robust.theilSen(pts, "scope", "__x", "__y")
  }

  /** Distinct-n generation-diversity profile per group: for each n in
    * `ns`, the group's TOTAL n-gram count, its corpus-level DISTINCT
    * n-gram count, and ⌊10⁶·distinct/total⌋ — the standard distinct-n
    * metric (low values flag template/boilerplate-heavy or
    * mode-collapsed sources that per-DOC repetition filters miss,
    * because the repetition is across documents).
    *
    * Plan per n: explode to (group, ngram), ONE map-side-combined hash
    * agg to the (group, ngram) grid, one per-group agg over the grid —
    * the exact-distinct two-stage shape (no countDistinct sort-agg,
    * no per-doc arrays through a shuffle). The ns frames union after
    * aggregation, so the widest shuffle is the largest single-n grid.
    * (A fused single-scan variant — per-n gram arrays wrapped in
    * (n, gram) structs, flattened, one explode — measured 2.6× SLOWER:
    * transform/flatten are interpreted higher-order functions, and the
    * extra struct-building lambda per gram costs more than the saved
    * scans. Keep the n scans; they're embarrassingly parallel.)
    */
  def distinctNgramRatio(docs: DataFrame, groupCol: String,
                         textCol: String, ns: Seq[Int]): DataFrame = {
    require(ns.nonEmpty && ns.forall(n => n >= 1 && n <= 8),
      s"ns ($ns) must be within [1, 8]")
    ns.map { n =>
      // letCol binds the token array ONCE per row; a raw toks(textCol)
      // inside the transform body re-inlines the split per window —
      // the interpreted-HOF O(windows × |text|) quadratic (q215).
      val grams = Dedup.letCol(toks(textCol)) { tk =>
        when(size(tk) - lit(n - 1) > 0,
          transform(sequence(lit(1), greatest(size(tk) - lit(n - 1), lit(1))),
            i => array_join(slice(tk, i, lit(n)), " ")))
          .otherwise(array().cast("array<string>"))
      }
      docs.select(col(groupCol), explode(grams).as("__g"))
        .groupBy(col(groupCol), col("__g"))
        .agg(count(lit(1)).as("__c"))
        .groupBy(col(groupCol))
        .agg(count(lit(1)).as("n_distinct"), sum(col("__c")).as("n_total"))
        .select(col(groupCol), lit(n).as("n"), col("n_total"), col("n_distinct"),
          floor(lit(1000000.0) * col("n_distinct").cast("double") /
            col("n_total").cast("double")).cast("long").as("ratio_q"))
    }.reduce(_ unionByName _)
  }

  /** Per-document sentence profile: sentence count (shared with the
    * Flesch gate: terminal-punctuation runs, min 1 for non-empty
    * text), token total, mean and MAX tokens per punctuation-split
    * segment, and whether the document ends in terminal punctuation —
    * the Gopher-style structural signals (a 400-token "sentence" is a
    * table or a log dump; a doc not ending in .!? is likely truncated).
    *
    * Pure scan-stage array math — the segment split, per-segment token
    * counts, and max fold never leave the row. mean_q = ⌊10⁶·W/S⌋.
    */
  def sentenceProfile(docs: DataFrame, idCol: String,
                      textCol: String): DataFrame = {
    val blank = col(textCol).isNull || length(trim(col(textCol))) === 0
    val segTokens = filter(
      transform(split(trim(col(textCol)), "[.!?]+"),
        s => size(filter(split(lower(trim(s)), "\\s+"), t => length(t) > 0))),
      c => c > 0)
    val nSent = TextFns.sentenceCount(col(textCol))
    val nTok = TextFns.tokenCount(col(textCol)).cast("long")
    docs.select(col(idCol),
      when(blank, lit(0L)).otherwise(nSent).as("n_sentences"),
      when(blank, lit(0L)).otherwise(nTok).as("n_tokens"),
      when(!blank && nSent > 0,
        floor(lit(1000000.0) * nTok.cast("double") / nSent.cast("double"))
          .cast("long")).as("mean_sent_tokens_q"),
      when(!blank, coalesce(array_max(segTokens), lit(0)).cast("long"))
        .otherwise(lit(0L)).as("max_seg_tokens"),
      when(blank, lit(false))
        .otherwise(trim(col(textCol)).rlike("[.!?]$")).as("ends_terminal"))
  }

  /** Good–Turing unseen-mass estimate per group: from the
    * count-of-counts grid, the hapax count N₁, the dis legomena N₂,
    * the Good–Turing probability mass of UNSEEN vocabulary
    * p₀ = N₁/N (⌊10⁶·⌋) and the discounted singleton count
    * r*₁ = 2·N₂/N₁ (⌊10⁶·⌋) — the two numbers that tell a corpus
    * curator how much of a source's vocabulary distribution is still
    * unobserved (high p₀ = under-sampled source; near-zero = saturated
    * or template text).
    *
    * Plan: one map-side-combined hash agg to the (group, term) grid,
    * one to the (group, freq) count-of-counts grid (bounded: distinct
    * frequencies are O(√mass) under Zipf), one per-group rollup.
    */
  def goodTuring(docs: DataFrame, groupCol: String,
                 textCol: String): DataFrame = {
    val terms = docs.select(col(groupCol), explode(toks(textCol)).as("__t"))
      .groupBy(col(groupCol), col("__t")).agg(count(lit(1)).as("__c"))
    val coc = terms.groupBy(col(groupCol), col("__c"))
      .agg(count(lit(1)).as("__nr"))
    coc.groupBy(col(groupCol))
      .agg(sum(col("__c") * col("__nr")).as("n_tokens"),
        sum(col("__nr")).as("n_types"),
        sum(when(col("__c") === 1, col("__nr")).otherwise(lit(0L)))
          .as("n_hapax"),
        sum(when(col("__c") === 2, col("__nr")).otherwise(lit(0L)))
          .as("n_dis"))
      .select(col(groupCol), col("n_tokens"), col("n_types"),
        col("n_hapax"), col("n_dis"),
        floor(lit(1000000.0) * col("n_hapax").cast("double") /
          col("n_tokens").cast("double")).cast("long").as("p_unseen_q"),
        when(col("n_hapax") > 0,
          floor(lit(1000000.0) * lit(2.0) * col("n_dis").cast("double") /
            col("n_hapax").cast("double")).cast("long")).as("r1_star_q"))
  }

  /** Chao1 species-richness estimator per group (Chao 1984, the
    * bias-corrected form): "how many DISTINCT tokens does this source
    * really have, counting the ones we haven't seen yet" —
    *
    *   chao1 = n_types + f1·(f1 − 1) / (2·(f2 + 1))
    *
    * from the same count-of-counts grid as [[goodTuring]] (f1 = hapax,
    * f2 = dis legomena; the +1 correction keeps it defined at f2 = 0).
    * chao1_q = 10⁶·n_types + (10⁶·f1·(f1−1)) div (2·(f2+1)) — pure
    * integer arithmetic — the 10⁶·f1² product runs in decimal(38,0),
    * but the div result narrows back to int64, so the result is exact
    * only while the QUOTIENT fits: 10⁶·f1²/(2·(f2+1)) < 2⁶³, i.e.
    * f1 ≲ 3·10⁶·√(f2+1). The widening protects the numerator from
    * overflow; a hapax-heavy corpus where f2 stays tiny as f1 grows
    * past ~3M still wraps the quotient (same residual-bound phrasing
    * as Stats.cliffs/u2) — engine-identical either way, as the oracle
    * narrows through BIGINT at the same point. The vocabulary-budget planner's
    * companion to goodTuring's unseen-mass rate: GT says how OFTEN a
    * new type appears next token; Chao1 says how MANY remain.
    */
  def chao1(docs: DataFrame, groupCol: String,
            textCol: String): DataFrame =
    goodTuring(docs, groupCol, textCol)
      .select(col(groupCol), col("n_types"), col("n_hapax"),
        col("n_dis"),
        expr("1000000L * n_types + (CAST(1000000 AS DECIMAL(38,0)) " +
          "* n_hapax * (n_hapax - 1)) div (2L * (n_dis + 1))")
          .as("chao1_q"))

  /** Per-token burstiness (Church & Gale 1995): the variance-to-mean
    * ratio of a token's per-document count, zeros included — content
    * words ARRIVE IN BURSTS (one doc uses "spark" twenty times, most
    * use it never → VMR ≫ 1) while function words spread evenly
    * (VMR ≈ 1, the Poisson floor). The signal dedup/quality scoring
    * can't get from raw frequency: two tokens with equal corpus count
    * but different burstiness are a topic word vs a stop word.
    *
    * EXACT: with D docs, S = Σ per-doc counts, Q = Σ counts², the
    * sample VMR is (D·Q − S²)/((D−1)·S) — an integer ratio, so
    * b_q = ⌊10⁶·num⌋ div den in decimal(38,0) with no float anywhere.
    *
    * Plan: one explode → (doc, token) hash agg → token hash agg
    * (vocabulary-bounded), scalar D broadcast. `minDf` keeps hapax
    * noise out of the output.
    *
    * @return (token, df, total, b_q) for tokens with df ≥ minDf
    */
  def burstiness(docs: DataFrame, idCol: String, textCol: String,
                 minDf: Long): DataFrame = {
    require(minDf >= 1, s"minDf ($minDf) must be >= 1")
    val d38 = "decimal(38,0)"
    val perDoc = docs
      .select(col(idCol).as("__id"), explode(toks(textCol)).as("__t"))
      .groupBy(col("__id"), col("__t")).agg(count(lit(1)).as("__c"))
    val perTok = perDoc.groupBy(col("__t").as("token"))
      .agg(count(lit(1)).as("df"), sum(col("__c")).as("total"),
        sum(col("__c") * col("__c")).as("__q"))
      .filter(col("df") >= minDf)
    val nDocs = docs.agg(count(lit(1)).as("__D"))
    perTok.crossJoin(broadcast(nDocs))
      .filter(col("__D") >= 2)
      .select(col("token"), col("df"), col("total"),
        expr(s"CAST((CAST(1000000 AS $d38) * " +
          s"(CAST(__D AS $d38) * __q - CAST(total AS $d38) * total)) div " +
          s"((CAST(__D AS $d38) - 1) * total) AS LONG)").as("b_q"))
  }

  /** RAKE keyword extraction per group (Rose et al. 2010): candidate
    * phrases are maximal stopword-free token runs (length ≤
    * `maxPhraseLen`), each word w scores
    *
    *   wscore_q(w) = (10⁶ · deg(w)) div freq(w)
    *
    * with freq = occurrences of w in candidate phrases and deg = Σ of
    * the containing phrase's length over those occurrences (the
    * degree-over-frequency ratio that favors words living in long
    * multi-word phrases), and a phrase scores the INTEGER sum of its
    * member word scores (multiplicity counted) — so the whole metric
    * is exact integer arithmetic, engine-identical. Top `topK`
    * phrases per group, ranked (score DESC, phrase ASC).
    *
    * Plan: one posexplode + per-doc window (running stopword count
    * assigns phrase ids) → phrase assembly by hash agg (sort_array
    * makes the collect order-free) → word-stat hash agg joined back →
    * per-group top-k window over the phrase-bounded frame. The only
    * per-row window is the doc-local position sort; nothing
    * corpus-scale sorts globally.
    *
    * @return (group, phrase, n_occurrences, score_q) — topK per group
    */
  def rakeKeywords(docs: DataFrame, groupCol: String, idCol: String,
                   textCol: String, stopwords: Seq[String],
                   maxPhraseLen: Int, topK: Int): DataFrame = {
    require(maxPhraseLen >= 1, s"maxPhraseLen ($maxPhraseLen) must be >= 1")
    require(topK >= 1, s"topK ($topK) must be >= 1")
    val tok = docs
      .select(col(groupCol).as("__g"), col(idCol).as("__id"),
        posexplode(toks(textCol)).as(Seq("__pos", "__t")))
      .withColumn("__stop",
        col("__t").isin(stopwords.map(lit): _*).cast("int"))
    val wDoc = Window.partitionBy(col("__g"), col("__id"))
      .orderBy(col("__pos"))
    val phrases = tok
      .withColumn("__pid", sum(col("__stop")).over(wDoc))
      .filter(col("__stop") === 0)
      .groupBy(col("__g"), col("__id"), col("__pid"))
      .agg(sort_array(collect_list(struct(col("__pos"), col("__t"))))
        .as("__st"))
      .select(col("__g"), col("__id"), col("__pid"),
        transform(col("__st"), s => s.getField("__t")).as("__ptoks"))
      .filter(size(col("__ptoks")) <= maxPhraseLen)
      .mat
    val wordScores = phrases
      .select(col("__g"), size(col("__ptoks")).cast("long").as("__len"),
        explode(col("__ptoks")).as("__w"))
      .groupBy(col("__g"), col("__w"))
      .agg(count(lit(1)).as("__freq"), sum(col("__len")).as("__deg"))
      .select(col("__g"), col("__w"),
        expr("(1000000L * __deg) div __freq").as("__wq"))
    val occScores = phrases
      .select(col("__g"), col("__id"), col("__pid"),
        array_join(col("__ptoks"), " ").as("phrase"),
        explode(col("__ptoks")).as("__w"))
      .join(wordScores, Seq("__g", "__w"))
      .groupBy(col("__g"), col("__id"), col("__pid"), col("phrase"))
      .agg(sum(col("__wq")).as("__score"))
    val byPhrase = occScores.groupBy(col("__g"), col("phrase"))
      .agg(count(lit(1)).as("n_occurrences"), max(col("__score")).as("score_q"))
    val wTop = Window.partitionBy(col("__g"))
      .orderBy(col("score_q").desc, col("phrase").asc)
    byPhrase.withColumn("__rn", row_number().over(wTop))
      .filter(col("__rn") <= topK)
      .select(col("__g").as(groupCol), col("phrase"), col("n_occurrences"),
        col("score_q"))
  }

  /** TextRank keyword scores (Mihalcea & Tarau 2004, the unweighted
    * §2.2 variant): PageRank over the token co-occurrence graph —
    * vertices are terms, an edge joins two terms seen within ±`window`
    * positions at least `minCount` times (df-style support threshold:
    * rare accidental adjacencies never become edges, so the graph is
    * vocabulary-bounded however large the corpus). Self-loops (a token
    * repeated inside the window) are dropped. Scores are
    * [[Graph.pageRank]]'s exact 10¹²-grid integer ranks — deterministic
    * on any engine and partitioning.
    *
    * The corpus-level complement to [[rakeKeywords]]' per-doc phrase
    * extraction: RAKE scores PHRASES by their own co-occurrence
    * degree; TextRank scores TERMS by global graph centrality.
    *
    * Plan: [[Curation.cooccurrencePairs]] (one explode, text never
    * shuffles) → hash agg to edge support → bounded-round integer
    * PageRank (each round one join + one agg on the vocabulary-sized
    * edge frame).
    *
    * @return (term, degree, rank_q)
    */
  def textRank(docs: DataFrame, idCol: String, textCol: String,
               window: Int, minCount: Long, rounds: Int): DataFrame = {
    require(minCount >= 1, s"minCount ($minCount) must be >= 1")
    val edges = Curation.cooccurrencePairs(docs, idCol, textCol, window)
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= minCount && col("a") =!= col("b"))
      .select(col("a"), col("b"))
    Graph.pageRank(edges, rounds)
      .select(col("id").as("term"), col("degree"), col("rank_q"))
  }
}
