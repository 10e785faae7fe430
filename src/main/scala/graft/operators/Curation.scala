package graft.operators

import graft.operators.Mat._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Corpus-curation operators for training-data pipelines: Gopher-style
  * repetition quality signals, leakage-safe stratified splits, and
  * fixed-size token chunking. All shapes are 100 TB-safe: one explode +
  * map-side-combined hash aggregates (repetition), pure scan-stage
  * expressions (split), or a single explode with no shuffle (chunking).
  *
  * These extend the engine beyond the reference's BMP surface (same
  * role as the dedup/similarity operators — see SURVEY.md §2 LLM
  * extensions); signal definitions follow the published Gopher /
  * MassiveText filtering rules (Rae et al. 2021, §A1.1) re-expressed
  * over whitespace tokens.
  */
object Curation {

  /** Per-document n-gram repetition signals — the MassiveText/Gopher
    * "repetitious document" filter family:
    *
    *  - `top{n}_frac`: occurrences of the single most frequent n-gram
    *    divided by the document's n-gram instance count (fraction of the
    *    doc dominated by one phrase);
    *  - `dup{n}_frac`: fraction of n-gram instances whose gram occurs
    *    more than once in the document (self-repetition mass);
    *  - `passes_repetition`: all thresholds hold.
    *
    * Plan shape: ONE explode producing (id, n, gram) for n ∈ {2,3,5} in
    * a single pass over the token array, then two hash aggregates
    * (gram counts → per-(doc,n) max/sum), both map-side combined; the
    * exploded rows shuffle once on (id, n, gram). No windows, no
    * driver-side state — linear in corpus size at any scale. Documents
    * shorter than n tokens contribute no n-grams and score 0.0.
    */
  def repetitionSignals(docs: DataFrame, idCol: String, textCol: String,
                        maxTop2: Double = 0.05, maxTop3: Double = 0.04,
                        maxDup2: Double = 0.10, maxDup5: Double = 0.15): DataFrame = {
    val ns = Seq(2, 3, 5)
    val toks = TextFns.tokens(col(textCol))
    val blank = length(trim(col(textCol))) === 0
    val base = docs.select(
      col(idCol),
      when(blank, lit(0L)).otherwise(size(toks).cast("long")).as("n_tokens"),
      toks.as("__toks"))

    // one row per n-gram instance, all n sizes in a single explode
    // (blank text needs no guard here: it tokenizes to [""], size 1,
    // below every n >= 2)
    val gramArrays = ns.map { n =>
      when(size(col("__toks")) >= n,
        transform(sequence(lit(1), size(col("__toks")) - n + 1),
          i => struct(lit(n).as("n"),
            array_join(slice(col("__toks"), i, lit(n)), " ").as("gram"))))
        .otherwise(array().cast("array<struct<n:int,gram:string>>"))
    }
    val grams = base.select(col(idCol), explode(flatten(array(gramArrays: _*))).as("g"))
      .select(col(idCol), col("g.n").as("n"), col("g.gram").as("gram"))

    val sig = grams
      .groupBy(col(idCol), col("n"), col("gram")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol), col("n"))
      .agg(
        (max(col("c")).cast("double") / sum(col("c"))).as("top_frac"),
        (sum(when(col("c") > 1, col("c")).otherwise(lit(0L))).cast("double") /
          sum(col("c"))).as("dup_frac"))

    def pick(n: Int, c: String): Column =
      coalesce(max(when(col("n") === n, col(c))), lit(0.0))
    val wide = sig.groupBy(col(idCol)).agg(
      pick(2, "top_frac").as("top2_frac"),
      pick(3, "top_frac").as("top3_frac"),
      pick(2, "dup_frac").as("dup2_frac"),
      pick(5, "dup_frac").as("dup5_frac"))

    base.drop("__toks").join(wide, Seq(idCol), "left")
      .select(
        col(idCol), col("n_tokens"),
        coalesce(col("top2_frac"), lit(0.0)).as("top2_frac"),
        coalesce(col("top3_frac"), lit(0.0)).as("top3_frac"),
        coalesce(col("dup2_frac"), lit(0.0)).as("dup2_frac"),
        coalesce(col("dup5_frac"), lit(0.0)).as("dup5_frac"))
      .withColumn("passes_repetition",
        col("top2_frac") <= maxTop2 && col("top3_frac") <= maxTop3 &&
          col("dup2_frac") <= maxDup2 && col("dup5_frac") <= maxDup5)
  }

  /** Per-document top-k characteristic terms by tf·idf, with a LINEAR
    * idf (`tf · N/df` instead of `tf · ln(N/df)`): the ranking the log
    * form produces is the same within a document whenever df ordering
    * agrees, and the linear form stays in EXACT integer arithmetic until
    * one final double division — bit-reproducible across engines and
    * runs, where `ln` differs by an ulp between libm implementations
    * and can flip top-k ties.
    *
    * Plan shape: explode → two hash aggregates (term frequency, then
    * document frequency — both map-side combined) → shuffle join on
    * term → per-DOC row_number window. Nothing global except the doc
    * count (`docCount`, one metadata action when not supplied —
    * per-micro-batch callers should pass it, same contract as
    * vIpRoutesGeo's dimSizeHint).
    */
  def tfIdfTopTerms(docs: DataFrame, idCol: String, textCol: String, k: Int,
                    docCount: Option[Long] = None): DataFrame = {
    require(k > 0, s"k ($k) must be positive")
    val n = docCount.getOrElse(docs.count())
    val terms = docs
      .select(col(idCol), explode(TextFns.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
    // snapshot: tf feeds BOTH the df aggregate and the join left side —
    // without it the corpus explode+aggregate runs twice (same pattern
    // as Similarity.cosineCandidates' signature snapshot)
    val tf = terms.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      .mat
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("score").desc, col("term").asc)
    tf.join(dfreq, Seq("term"))
      .withColumn("score", (col("tf") * lit(n)).cast("double") / col("df"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("tf"), col("df"), col("score"))
  }

  /** Leakage-safe deterministic train/val/test assignment: the split key
    * is a hash of the NORMALIZED CONTENT (not the row id), so byte-dup
    * and whitespace/case-variant copies of a document always land in the
    * same split — the property that keeps eval sets uncontaminated when
    * dedup is imperfect. Pure scan-stage expressions (md5 + modulo), no
    * shuffle, reproducible across engines and runs (vs rand()-seeded
    * splits, which reshuffle on every retry/backfill).
    *
    * `trainPct`/`valPct` are integer percent cut points on the hash
    * bucket (0..99): bucket < trainPct → train, < trainPct+valPct → val,
    * else test.
    */
  def stratifiedSplit(docs: DataFrame, textCol: String,
                      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages: train=$trainPct val=$valPct")
    val bucket = Dedup.md5Hash60(TextFns.normalizeText(col(textCol))) % 100
    // null text hashes to a null bucket; all null-text docs are mutual
    // content-duplicates, so they must share ONE split — train, where
    // they dilute rather than contaminate evaluation
    docs.withColumn("split",
      when(bucket.isNull || bucket < trainPct, lit("train"))
        .when(bucket < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }

  /** Cross-document boilerplate removal, CCNet/RefinedWeb line-dedup
    * re-expressed over fixed token segments (the corpus has no line
    * structure; a real crawl pipeline passes its line/paragraph
    * splitter's output through the same shape). Each doc is cut into
    * consecutive non-overlapping `segTokens`-token segments; a segment
    * is boilerplate when its text occurs in at least `minDocs` DISTINCT
    * documents (the header/footer/nav signature — distinct-doc df, not
    * occurrence count, so a doc repeating its own refrain is not
    * penalized here; that is [[repetitionSignals]]' job). Returns one
    * row per input doc: segment counts, boilerplate fraction, and the
    * cleaned text with boilerplate segments cut out.
    *
    * Plan shape: one explode → distinct-doc df as TWO map-side-combined
    * hash aggregates (groupBy(seg,id) then groupBy(seg) — never a
    * count-distinct expand) → the boilerplate key set joins back →
    * per-doc rebuild via collect_list of (start, seg) pairs, sorted
    * in-row. Per-doc state is bounded by the doc's own segment count;
    * nothing global. Docs with null text survive with n_segments=0 and
    * null cleaned text.
    */
  def boilerplateSegments(docs: DataFrame, idCol: String, textCol: String,
                          segTokens: Int, minDocs: Int = 2): DataFrame = {
    require(segTokens > 0, s"segTokens ($segTokens) must be positive")
    require(minDocs >= 2, s"minDocs ($minDocs) must be at least 2")
    val toks = TextFns.tokens(col(textCol))
    val segs = docs
      .select(col(idCol).as("__id"), toks.as("__toks"))
      .select(col("__id"), explode(
        when(col("__toks").isNotNull,
          transform(sequence(lit(1), greatest(size(col("__toks")), lit(1)), lit(segTokens)),
            i => struct(i.as("start"),
              array_join(slice(col("__toks"), i, lit(segTokens)), " ").as("seg"))))
          .otherwise(array().cast("array<struct<start:int,seg:string>>"))).as("s"))
      .select(col("__id"), col("s.start").as("start"), col("s.seg").as("seg"))
    val boiler = segs
      .groupBy(col("seg"), col("__id")).agg(count(lit(1)).as("__c"))
      .groupBy(col("seg")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDocs)
      .select(col("seg"), lit(true).as("__boiler"))
    val perDoc = segs.join(boiler, Seq("seg"), "left")
      .groupBy(col("__id"))
      .agg(
        count(lit(1)).as("n_segments"),
        sum(when(col("__boiler"), 1L).otherwise(0L)).as("n_boiler"),
        array_join(transform(
          array_sort(collect_list(when(not(coalesce(col("__boiler"), lit(false))),
            struct(col("start"), col("seg"))))),
          p => p.getField("seg")), " ").as("clean_text"))
    docs.select(col(idCol)).join(perDoc, col(idCol) === col("__id"), "left")
      .select(col(idCol),
        coalesce(col("n_segments"), lit(0L)).as("n_segments"),
        coalesce(col("n_boiler"), lit(0L)).as("n_boiler"),
        when(col("n_segments") > 0,
          col("n_boiler").cast("double") / col("n_segments")).as("boiler_frac"),
        col("clean_text"))
  }

  /** Cross-source contamination matrix: for every unordered pair of
    * sources, how many DISTINCT `gramSize`-token windows occur in both
    * — the dataset-level view of [[Dedup.duplicateSpans]] (which marks
    * positions) and the decontamination check (which guards one
    * benchmark): "which of my corpus components are copying from each
    * other, and how much". Drives mixing-weight and dedup-order
    * decisions before training.
    *
    * Plan shape: single pass, never a corpus self-join — window-explode
    * → distinct (gramKey, source) via one map-side-combined aggregate →
    * per-key sorted source set (bounded by the source count) → in-row
    * ordered-pair expansion → one final count aggregate on (a, b).
    * Shuffles carry 8-byte keys + source ids; gram text dies in the
    * scan stage. A gram present in all S sources expands to S(S−1)/2
    * pairs in-row — bounded by the source-count square, not the corpus.
    */
  def sourceOverlap(docs: DataFrame, textCol: String, srcCol: String,
                    gramSize: Int,
                    gramKeyOf: Column => Column = xxhash64(_)): DataFrame = {
    require(gramSize > 0, s"gramSize ($gramSize) must be positive")
    val toks = TextFns.tokens(col(textCol))
    val grams = docs
      .select(col(srcCol).as("__src"), toks.as("__toks"))
      .select(col("__src"), explode(
        when(col("__toks").isNotNull && size(col("__toks")) >= gramSize,
          transform(sequence(lit(1), size(col("__toks")) - gramSize + 1),
            i => gramKeyOf(array_join(slice(col("__toks"), i, lit(gramSize)), " "))))
          .otherwise(array().cast("array<long>"))).as("__gk"))
    val srcSets = grams
      .groupBy(col("__gk"), col("__src")).agg(count(lit(1)).as("__c"))
      .groupBy(col("__gk"))
      .agg(array_sort(collect_set(col("__src"))).as("__srcs"))
      .filter(size(col("__srcs")) >= 2)
    srcSets
      .select(explode(flatten(
        transform(sequence(lit(1), size(col("__srcs")) - 1), i =>
          transform(slice(col("__srcs"), i + 1, size(col("__srcs"))), b =>
            struct(element_at(col("__srcs"), i).as("source_a"), b.as("source_b"))))))
        .as("p"))
      .groupBy(col("p.source_a").as("source_a"), col("p.source_b").as("source_b"))
      .agg(count(lit(1)).as("n_shared_grams"))
  }

  /** Fit a unigram language model over the corpus: one row per distinct
    * token with its count and the corpus-total token count (`total`
    * repeated on every row so the frame is self-contained for
    * [[unigramScore]] — k rows × 2 longs, centroid-table sized).
    * Tokens are the same whitespace normalization as [[tfIdfTopTerms]];
    * empty tokens are dropped.
    */
  def fitUnigramLm(docs: DataFrame, textCol: String): DataFrame = {
    // the lazy checkpoint snapshots the corpus-scale explode+aggregate:
    // `counts` is referenced by both the crossJoin side and the `total`
    // scalar here, and [[unigramScore]] references the lm frame twice
    // more (term join + max(total)) — without the snapshot the corpus
    // scan re-runs up to 4×, the same double-scan tfIdfTopTerms kills
    // with its own localCheckpoint
    val counts = docs
      .select(explode(TextFns.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
      .mat
    val total = counts.agg(sum(col("c")).as("total"))
    counts.crossJoin(broadcast(total))
  }

  /** Per-document mean token log-probability under a [[fitUnigramLm]]
    * model — the CCNet-style LM quality proxy (lower = more
    * out-of-distribution; CCNet buckets docs by KenLM perplexity, this
    * is the order-0 form that needs no external model). Out-of-vocab
    * tokens score `ln(oovDiscount / total)` so scoring a NEW batch
    * against a frozen corpus model is well-defined.
    *
    * Plan shape: explode → shuffle join on term against the (small) LM
    * frame — broadcast when Catalyst sizes it under the threshold — →
    * one per-doc hash aggregate. The mean is `sum(ln)/count`: the sum's
    * fp addition order is engine- and partition-dependent at the
    * 10⁻¹⁵ level, so the result is rounded to 6 decimals (same
    * contract as centroidOutliers' cos_r) — bit-stable in practice,
    * document-ranking-stable by construction.
    */
  def unigramScore(docs: DataFrame, lm: DataFrame, idCol: String, textCol: String,
                   oovDiscount: Double = 0.5): DataFrame = {
    require(oovDiscount > 0, s"oovDiscount ($oovDiscount) must be positive")
    val terms = docs
      .select(col(idCol), explode(TextFns.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
    // OOV rows have a null `total` after the left join, so the scalar
    // corpus total rides in separately (1-row broadcast)
    val scored = terms.join(lm, Seq("term"), "left")
      .crossJoin(broadcast(lm.select(max(col("total")).as("__total"))))
      .withColumn("__lp",
        log(coalesce(col("c").cast("double"), lit(oovDiscount)) / col("__total")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(col("__lp")) / count(lit(1)), 6).as("logprob_mean"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("logprob_mean"))
  }

  /** The Gopher document-quality rule battery (Rae et al. 2021,
    * Appendix A1.1) — each named rule emitted as its OWN verdict column
    * so a pipeline can audit which rule killed a document, plus the
    * conjunction `passes_gopher`. Rules over whitespace tokens:
    * word-count bounds, mean word length bounds, symbol-to-word ratio
    * (`#`/`...`), alphabetic-word fraction, and a minimum stop-word hit
    * count. (Gopher's line-shape rules — bullet/ellipsis line ratios —
    * live with the repetition gates; this battery is the token-shape
    * half.)
    *
    * Every ratio is exact-integer arithmetic with ONE double division,
    * so verdicts are engine-reproducible. Pure scan-stage expressions:
    * zero shuffle, zero join — the same plan class as blocklistFilter.
    * Null/blank text fails the word-count rule (n_words 0) and every
    * dependent rule evaluates against n_words = 0 conservatively.
    */
  def gopherRules(docs: DataFrame, idCol: String, textCol: String,
                  stopwords: Seq[String], minWords: Long = 50,
                  maxWords: Long = 100000, minMeanLen: Double = 3.0,
                  maxMeanLen: Double = 10.0, maxSymbolRatio: Double = 0.1,
                  minAlphaFrac: Double = 0.8, minStopHits: Long = 2): DataFrame = {
    require(stopwords.nonEmpty, "stopwords must be non-empty (the rule is a hit COUNT)")
    require(minWords >= 0 && maxWords >= minWords,
      s"bad word-count bounds [$minWords, $maxWords]")
    val toks = TextFns.tokens(col(textCol))
    val blank = col(textCol).isNull || length(trim(col(textCol))) === 0
    val base = docs.select(col(idCol),
      when(blank, array().cast("array<string>")).otherwise(toks).as("__t"))
    val n = size(col("__t")).cast("long")
    val sumLen = aggregate(col("__t"), lit(0L), (acc, t) => acc + length(t))
    val nSymbol = size(filter(col("__t"),
      t => t.contains("#") || t.contains("..."))).cast("long")
    val nAlpha = size(filter(col("__t"), t => t.rlike("[a-z]"))).cast("long")
    val nStop = size(filter(col("__t"),
      t => t.isin(stopwords.map(lit): _*))).cast("long")
    base.select(
      col(idCol),
      n.as("n_words"),
      (sumLen.cast("double") / greatest(n, lit(1L)).cast("double"))
        .as("mean_word_len"),
      (nSymbol.cast("double") / greatest(n, lit(1L)).cast("double"))
        .as("symbol_ratio"),
      (nAlpha.cast("double") / greatest(n, lit(1L)).cast("double"))
        .as("alpha_frac"),
      nStop.as("stop_hits"))
      .withColumn("ok_word_count",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("ok_mean_len",
        col("mean_word_len") >= minMeanLen && col("mean_word_len") <= maxMeanLen)
      .withColumn("ok_symbols", col("symbol_ratio") <= maxSymbolRatio)
      .withColumn("ok_alpha", col("alpha_frac") >= minAlphaFrac)
      .withColumn("ok_stopwords", col("stop_hits") >= minStopHits)
      .withColumn("passes_gopher",
        col("ok_word_count") && col("ok_mean_len") && col("ok_symbols") &&
          col("ok_alpha") && col("ok_stopwords"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020, CCNet §3.3):
    * split the corpus into head / middle / tail by LM score — CCNet
    * buckets by KenLM perplexity per language and trains on head(+middle);
    * this is the same policy over [[unigramScore]]'s order-0 LM proxy
    * (higher mean log-prob = more in-distribution = head).
    *
    * The two cutoffs are EXACT percentiles of the score distribution
    * (`lowFrac`/`highFrac`, default terciles), computed as one aggregate
    * and broadcast back — deliberately NOT a global rank window: ntile
    * over the whole corpus would funnel 100 TB through one task, while
    * a threshold comparison stays in the scan stage. CCNet itself
    * computes cutoffs once (on a sample) and applies them as filters —
    * the same two-phase shape. At production scale swap the exact
    * percentile for `approx_percentile`; the exact form is the
    * oracle-gated configuration. Docs with no scorable tokens (null
    * score) bucket to 'tail' (CCNet drops them; keeping them auditable
    * with the worst label is the conservative verdict-per-doc policy).
    */
  def perplexityBuckets(docs: DataFrame, lm: DataFrame, idCol: String,
                        textCol: String, lowFrac: Double = 1.0 / 3,
                        highFrac: Double = 2.0 / 3): DataFrame = {
    require(lowFrac > 0 && highFrac < 1 && lowFrac <= highFrac,
      s"need 0 < lowFrac ($lowFrac) <= highFrac ($highFrac) < 1")
    // snapshot: the scored frame feeds BOTH the cutoff aggregate and
    // the bucketed output — without it the whole unigram-scoring
    // pipeline (explode + LM join + per-doc aggregate) runs twice
    // (the fitUnigramLm compute-once contract)
    val scored = unigramScore(docs, lm, idCol, textCol)
      .mat
    val cuts = scored.agg(
      percentile(col("logprob_mean"), lit(lowFrac)).as("__lo"),
      percentile(col("logprob_mean"), lit(highFrac)).as("__hi"))
    scored.crossJoin(broadcast(cuts))
      .withColumn("bucket",
        when(col("logprob_mean").isNull, lit("tail"))
          .when(col("logprob_mean") <= col("__lo"), lit("tail"))
          .when(col("logprob_mean") <= col("__hi"), lit("middle"))
          .otherwise(lit("head")))
      .select(col(idCol), col("n_tokens"), col("logprob_mean"), col("bucket"))
  }

  /** Source-level quality rollup + keep/drop verdict — the RefinedWeb /
    * Dolma "filter at the domain level" step (Penedo et al. 2023 §3.1
    * filter whole URLs/domains, not single pages): aggregate per-source
    * document count, mean heuristic quality, and exact-duplicate ratio,
    * then verdict each SOURCE against thresholds. One row per source —
    * the caller semi-joins docs against kept sources (broadcast: the
    * source table is domain-cardinality, tiny next to the corpus).
    *
    * Mean quality uses QUANTIZED exact arithmetic (`floor(q·10⁶)`
    * summed as longs, one division at the end) so the mean is identical
    * regardless of partition order — the same determinism contract as
    * centroidOutliers. dup_ratio = 1 − distinct(normalized-text)/count:
    * integer arithmetic, one division. Plan shape: ONE map-side-combined
    * hash aggregate over the corpus (count + quantized sum +
    * count-distinct-hash per source); no window, no join.
    */
  def sourceQualityStats(docs: DataFrame, textCol: String,
                         srcCol: String, stopwords: Seq[String],
                         minMeanQuality: Double, maxDupRatio: Double): DataFrame =
    docs
      .select(col(srcCol).as("source"),
        floor(TextFns.qualityScore(col(textCol), stopwords) * 1000000.0)
          .cast("long").as("__q"),
        md5(TextFns.normalizeText(col(textCol))).as("__k"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        (sum(col("__q")).cast("double") / (lit(1000000.0) * count(lit(1))))
          .as("mean_quality"),
        (lit(1.0) - countDistinct(col("__k")).cast("double") /
          count(lit(1)).cast("double")).as("dup_ratio"))
      .withColumn("keep_source",
        col("mean_quality") >= minMeanQuality && col("dup_ratio") <= maxDupRatio)

  /** Fixed-size token chunking with overlap — the context-window
    * chunker for RAG indexing / training-sequence preparation. Emits one
    * row per chunk: start token offset (1-based), chunk token count, and
    * the chunk text; stride < chunkSize gives overlapping windows.
    *
    * Plan shape: the window starts are generated per row with
    * `sequence` and exploded — a single narrow explode in the scan
    * stage, NO shuffle at all; output order within a doc is the
    * (doc, start_tok) order. Null text yields no chunks; empty text
    * yields one empty chunk (consistent with the tokenizer's `[""]`).
    */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
                  chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0,
      s"chunkSize ($chunkSize) and stride ($stride) must be positive")
    val toks = TextFns.tokens(col(textCol))
    docs.select(col(idCol), toks.as("__toks"))
      .select(col(idCol),
        // null text → null starts → explode drops the row (the guard
        // matters: size(null)=null but greatest(null,1)=1 would
        // otherwise fabricate one null chunk)
        // A start whose window adds no new tokens — the previous window
        // already reached the end of the doc — is dropped: it would emit
        // a chunk fully contained in its predecessor, up-weighting
        // document tails in the output.
        explode(transform(
          filter(
            when(col("__toks").isNotNull,
              sequence(lit(1), greatest(size(col("__toks")), lit(1)), lit(stride))),
            i => i === 1 ||
              i + lit(chunkSize - stride - 1) < size(col("__toks"))),
          i => struct(i.as("start_tok"),
            slice(col("__toks"), i, lit(chunkSize)).as("chunk")))).as("c"))
      .select(
        col(idCol),
        col("c.start_tok").as("start_tok"),
        size(col("c.chunk")).as("n_chunk_tokens"),
        array_join(col("c.chunk"), " ").as("chunk_text"))
  }

  /** C4-style blocklist filter (Raffel et al. 2020 §2.2: "we removed
    * any page that contained any word on the 'List of Dirty, Naughty,
    * Obscene or Otherwise Bad Words'"): per doc, how many token
    * occurrences hit the list, which distinct listed words appear
    * (sorted), and the pass verdict (zero hits). Token-exact, not
    * substring — "scrap" does not hit a listed "crap" (C4's actual
    * behavior, and the difference matters: substring matching is the
    * classic clbuttic-mistake failure mode).
    *
    * The list is a Scala Seq compiled into the plan as an array
    * literal: for the realistic list size (C4's is ~400 words) every
    * comparison happens IN the scan stage via a codegen'd
    * `array_contains` — zero shuffle, zero join, the filter costs one
    * pass over already-read tokens. A list too large for a literal
    * (say, a multi-million-entry URL blocklist) is a different
    * operator: broadcast-join the exploded tokens against the list
    * table — same output contract, one narrow shuffle-free broadcast
    * stage; [[graft.operators.Dedup.contaminationFlags]] already
    * covers that shape.
    */
  def blocklistFilter(docs: DataFrame, idCol: String, textCol: String,
                      blocklist: Seq[String]): DataFrame = {
    require(blocklist.nonEmpty, "blocklist must not be empty")
    val list = array(blocklist.map(w => lit(w.toLowerCase)): _*)
    val toks = TextFns.tokens(col(textCol))
    val hits = filter(toks, t => array_contains(list, t))
    docs.select(col(idCol),
      coalesce(size(hits).cast("long"), lit(0L)).as("n_blocked"),
      coalesce(array_sort(array_distinct(hits)),
        array().cast("array<string>")).as("blocked_terms"),
      coalesce(size(hits) === 0, lit(true)).as("passes_blocklist"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every
    * document by the log-likelihood ratio of its tokens under a
    * target-domain unigram model vs the rest-of-corpus model, both
    * add-one smoothed over the SHARED vocabulary. Positive weight =
    * looks like the target domain; downstream selection keeps the
    * top-weighted (or hash-resamples proportional to weight).
    *
    * Determinism contract: the per-TERM log-ratio is quantized ONCE to
    * a long, ⌊10⁶·(ln((ct+1)/(Nt+V)) − ln((cr+1)/(Nr+V)))⌋, and a
    * document's weight is the SUM of those longs over its token
    * instances — long sums are associative, so the result is
    * partition-order free and the DuckDB oracle hash-matches (the
    * ln-ulp floor-boundary risk is q83/q97's accepted ~10⁻¹⁰ class).
    *
    * Plan shape: one explode → (term → target/raw counts) as a single
    * map-side-combined hash aggregate; the vocab-sized counts frame is
    * localCheckpoint'd (compute-once contract, [[tfIdfTopTerms]])
    * because it feeds BOTH the three scalar totals and the per-term
    * weight join. The token-INSTANCE frame is deliberately NOT
    * materialized: at 100 TB it is corpus-sized, and re-running a
    * scan-stage explode twice is cheaper than storing it — the
    * opposite trade from the vocab frame. Per-doc weight is one
    * hash-aggregated sum after an equi-join on term; docs with no
    * tokens surface with weight 0 via the left join back.
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        srcCol: String, targetSource: String): DataFrame = {
    val inst = docs
      .select(col(idCol), col(srcCol),
        explode(TextFns.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
    val counts = inst
      .groupBy(col("term"))
      .agg(
        sum(when(col(srcCol) === targetSource, 1L).otherwise(0L)).as("ct"),
        sum(when(col(srcCol) === targetSource, 0L).otherwise(1L)).as("cr"))
      .mat
    val totals = counts.agg(
      sum(col("ct")).as("nt"), sum(col("cr")).as("nr"),
      count(lit(1)).as("v"))
    val termW = counts.crossJoin(broadcast(totals))
      .select(col("term"),
        floor(lit(1000000.0) * (
          log((col("ct") + lit(1L)).cast("double") /
            (col("nt") + col("v")).cast("double")) -
          log((col("cr") + lit(1L)).cast("double") /
            (col("nr") + col("v")).cast("double"))))
          .cast("long").as("w_q"))
    val perDoc = inst
      .join(termW, Seq("term"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("w_q")).as("weight_q"))
    docs.select(col(idCol), col(srcCol).as("source"))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col("source"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("weight_q"), lit(0L)).as("dsir_weight_q"),
        round(coalesce(col("weight_q"), lit(0L)).cast("double") /
          lit(1000000.0), 6).as("dsir_weight"))
  }

  /** Adjacent token transitions (t1, t2) per row of `docs` — the shared
    * explode for [[fitBigramLm]] (corpus counts) and [[bigramScore]]
    * (per-doc scoring). Empty/blank/null text yields no rows.
    */
  private def transitions(docs: DataFrame, idCol: String,
                          textCol: String): DataFrame = {
    // materialize the token array behind a projection BOUNDARY before
    // the transform: element_at on the raw filter(split(...)) expression
    // would inline the whole tokenization into EVERY element access —
    // O(|doc|²) re-splitting per row (measured 8× on the q104 gate)
    val toks = docs.select(col(idCol),
      filter(TextFns.tokens(col(textCol)), t => length(t) > 0).as("__toks"))
    toks.select(col(idCol),
        explode(when(size(col("__toks")) >= 2,
          transform(sequence(lit(1), size(col("__toks")) - 1), i =>
            struct(element_at(col("__toks"), i).as("t1"),
              element_at(col("__toks"), i + 1).as("t2"))))
          .otherwise(array().cast("array<struct<t1:string,t2:string>>")))
          .as("__tr"))
      .select(col(idCol), col("__tr.t1").as("t1"), col("__tr.t2").as("t2"))
  }

  /** Per-document trigram stupid-backoff log-score (Brants et al. 2007
    * — the web-scale LM smoothing that skips discounting entirely):
    * each in-document trigram (w1 w2 w3) scores
    *
    *   S(w3|w1w2) = c123/c12            when the trigram is attested
    *              = 0.4 · c23/c2        else when the bigram is
    *              = 0.16 · (c3+1)/(N+V) else (add-one unigram floor,
    *                                    keeps the score total for OOV)
    *
    * with all counts from the `corpus` frame — fit/score separation is
    * the point: score a candidate batch against a frozen reference
    * corpus and the backoff chain handles everything unseen. (Scoring
    * the corpus against itself never leaves branch 1 — the gate fits
    * on even doc ids and scores the odd ones.)
    *
    * Determinism: the [[bigramScore]] contract — one ⌊10⁶·ln S⌋ long
    * per trigram (every double inside the floor is a literal-identical
    * chain of correctly-rounded ops on exact longs), LONG per-doc sum,
    * two exact-input double divisions for the mean.
    *
    * Plan: corpus explodes once per order (trigram/bigram/unigram
    * map-side-combined counts; bigram and unigram tables checkpointed —
    * each is read twice downstream), the doc stream joins the three
    * count tables by key, N/V broadcast. All joins are gram-keyed; at
    * 100 TB nothing wider than (gram, count) shuffles.
    */
  def stupidBackoffScore(docs: DataFrame, corpus: DataFrame, idCol: String,
                         textCol: String): DataFrame = {
    val d = (c: Column) => c.cast("double")
    val tri3 = trigrams(corpus.select(lit(0L).as("__id"), col(textCol)),
        "__id", textCol)
      .groupBy(col("t1"), col("t2"), col("t3"))
      .agg(count(lit(1)).as("c123"))
    val bi = transitions(corpus.select(lit(0L).as("__id"), col(textCol)),
        "__id", textCol)
      .groupBy(col("t1"), col("t2")).agg(count(lit(1)).as("cb"))
      .mat
    val uni = corpus
      .select(explode(filter(TextFns.tokens(col(textCol)),
        t => length(t) > 0)).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cu"))
      .mat
    val scalars = uni.agg(sum(col("cu")).as("__n"),
      count(lit(1)).as("__v"))
    val score =
      when(coalesce(col("c123"), lit(0L)) > 0,
        d(col("c123")) / d(col("c12")))
      .when(coalesce(col("c23"), lit(0L)) > 0,
        lit(0.4) * (d(col("c23")) / d(col("c2"))))
      .otherwise(lit(0.16) *
        (d(coalesce(col("c3"), lit(0L)) + lit(1L)) /
          d(col("__n") + col("__v"))))
    val scored = trigrams(docs, idCol, textCol)
      .join(tri3, Seq("t1", "t2", "t3"), "left")
      .join(bi.select(col("t1"), col("t2"), col("cb").as("c12")),
        Seq("t1", "t2"), "left")
      .join(bi.select(col("t1").as("t2"), col("t2").as("t3"),
        col("cb").as("c23")), Seq("t2", "t3"), "left")
      .join(uni.select(col("term").as("t2"), col("cu").as("c2")),
        Seq("t2"), "left")
      .join(uni.select(col("term").as("t3"), col("cu").as("c3")),
        Seq("t3"), "left")
      .crossJoin(broadcast(scalars))
      .withColumn("__lpq", floor(lit(1000000.0) * log(score)).cast("long"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trigrams"), sum(col("__lpq")).as("sb_lp_q"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("sb_lp_q"), lit(0L)).as("sb_lp_q"),
        when(col("n_trigrams") > 0,
          (col("sb_lp_q").cast("double") / lit(1000000.0)) /
            col("n_trigrams").cast("double"))
          .as("sb_lp_mean"))
  }

  /** In-document trigram stream — [[transitions]]' order-2 sibling,
    * same projection-boundary contract (tokenize once, transform over
    * the materialized array).
    */
  private def trigrams(docs: DataFrame, idCol: String,
                       textCol: String): DataFrame = {
    val toks = docs.select(col(idCol),
      filter(TextFns.tokens(col(textCol)), t => length(t) > 0).as("__toks"))
    toks.select(col(idCol),
        explode(when(size(col("__toks")) >= 3,
          transform(sequence(lit(1), size(col("__toks")) - 2), i =>
            struct(element_at(col("__toks"), i).as("t1"),
              element_at(col("__toks"), i + 1).as("t2"),
              element_at(col("__toks"), i + 2).as("t3"))))
          .otherwise(array()
            .cast("array<struct<t1:string,t2:string,t3:string>>")))
          .as("__tr"))
      .select(col(idCol), col("__tr.t1").as("t1"), col("__tr.t2").as("t2"),
        col("__tr.t3").as("t3"))
  }

  /** Order-1 (bigram) corpus LM with add-one smoothing — the next step
    * up from [[fitUnigramLm]]'s order-0 CCNet proxy: transition
    * probability P(t2|t1) = (c12+1)/(c1+V) where c12 = corpus count of
    * the bigram, c1 = count of transitions leaving t1, V = unigram
    * vocabulary size. Returns (t1, t2, c12, c1, v) — counts, not
    * probabilities, so [[bigramScore]] can smooth unseen bigrams and
    * unseen contexts consistently (c12=0 / c1=0 fall out of the same
    * formula).
    *
    * Plan: one transition explode → map-side-combined count; context
    * counts are a second aggregate OF THE COUNTS (vocab-bounded, not
    * corpus-bounded); V rides in as a broadcast scalar. The bigram
    * frame is localCheckpoint'd — it is read twice downstream (bigram
    * join + context derivation), same compute-once contract as
    * [[fitUnigramLm]].
    */
  def fitBigramLm(docs: DataFrame, textCol: String): DataFrame = {
    val c12 = transitions(docs.select(lit(0L).as("__id"), col(textCol)),
        "__id", textCol)
      .groupBy(col("t1"), col("t2")).agg(count(lit(1)).as("c12"))
      .mat
    val c1 = c12.groupBy(col("t1")).agg(sum(col("c12")).as("c1"))
    val vocab = docs
      .select(explode(filter(TextFns.tokens(col(textCol)),
        t => length(t) > 0)).as("term"))
      .agg(count_distinct(col("term")).as("v"))
    c12.join(c1, Seq("t1")).crossJoin(broadcast(vocab))
  }

  /** Per-document bigram log-probability under a [[fitBigramLm]] model.
    * Determinism contract (importanceWeights' trick at order 1): each
    * transition's log-prob is quantized ONCE to a long,
    * ⌊10⁶·ln((c12+1)/(c1+V))⌋, and the document score is the LONG sum —
    * partition-order free, and the mean `(Σq/10⁶)/n_trans` is two
    * exact-input double divisions, bit-identical in DuckDB. Unseen
    * bigrams of a seen context smooth to 1/(c1+V); unseen contexts to
    * 1/V — both from the same coalesced formula, so scoring a NEW batch
    * against a frozen corpus model is well-defined.
    */
  def bigramScore(docs: DataFrame, lm: DataFrame, idCol: String,
                  textCol: String): DataFrame = {
    val tr = transitions(docs, idCol, textCol)
    val ctx = lm.select(col("t1"), col("c1")).dropDuplicates("t1")
    val scalarV = lm.select(max(col("v")).as("__v"))
    val scored = tr
      .join(lm.select(col("t1"), col("t2"), col("c12")), Seq("t1", "t2"), "left")
      .join(ctx, Seq("t1"), "left")
      .crossJoin(broadcast(scalarV))
      .withColumn("__lpq",
        floor(lit(1000000.0) * log(
          (coalesce(col("c12"), lit(0L)) + lit(1L)).cast("double") /
            (coalesce(col("c1"), lit(0L)) + col("__v")).cast("double")))
          .cast("long"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trans"), sum(col("__lpq")).as("bigram_lp_q"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_trans"), lit(0L)).as("n_trans"),
        coalesce(col("bigram_lp_q"), lit(0L)).as("bigram_lp_q"),
        when(col("n_trans") > 0,
          (col("bigram_lp_q").cast("double") / lit(1000000.0)) /
            col("n_trans").cast("double"))
          .as("bigram_lp_mean"))
  }

  /** Interpolated Kneser-Ney bigram model (Kneser & Ney 1995; Chen &
    * Goodman 1999 eq. 4.27 with one discount): the smoothing all
    * serious n-gram LM filters use (CCNet's KenLM is modified-KN) —
    * absolute discount d = 3/4 off every seen pair, mass re-spent on
    * the CONTINUATION unigram P_cont(w2) = N1−(w2)/B ("how many
    * contexts does w2 complete" — the reason "francisco" scores low
    * despite high frequency). Returns the pair table joined with every
    * statistic scoring needs: (t1, t2, c12, c1, n1p, n1m, b, v) where
    * n1p = |{w2 : c(t1,w2)>0}|, n1m = |{w1 : c(w1,t2)>0}|, b = distinct
    * pair types, v = vocabulary.
    *
    * d = 3/4 makes every probability a RATIO OF EXACT INTEGERS:
    * P = (max(4·c12−3, 0)·B + 3·n1p·n1m) / (4·B·c1) — so cross-engine
    * scoring needs one double division of exact longs (contract:
    * c12·B < 2⁶¹; past that, lift the numerator to Decimal(38)).
    *
    * Same shuffle shape as [[fitBigramLm]] plus two map-side-combined
    * aggregates (continuation counts) — all pair-table-bounded.
    */
  def fitKnBigramLm(docs: DataFrame, textCol: String): DataFrame = {
    val c12 = transitions(docs.select(lit(0L).as("__id"), col(textCol)),
        "__id", textCol)
      .groupBy(col("t1"), col("t2")).agg(count(lit(1)).as("c12"))
      .mat
    val ctx = c12.groupBy(col("t1"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1p"))
    val cont = c12.groupBy(col("t2")).agg(count(lit(1)).as("n1m"))
    val pairTypes = c12.agg(count(lit(1)).as("b"))
    val vocab = docs
      .select(explode(filter(TextFns.tokens(col(textCol)),
        t => length(t) > 0)).as("term"))
      .agg(count_distinct(col("term")).as("v"))
    c12.join(ctx, Seq("t1")).join(cont, Seq("t2"))
      .crossJoin(broadcast(pairTypes)).crossJoin(broadcast(vocab))
  }

  /** Per-document Kneser-Ney bigram log-probability under a
    * [[fitKnBigramLm]] model — [[bigramScore]]'s determinism contract
    * (per-transition ⌊10⁶·ln P⌋ long, LONG sum, two exact-input double
    * divisions for the mean) over the KN probability. Backoffs for a
    * NEW batch against a frozen model: a seen context with an unseen
    * target whose word never appears as a continuation (numerator 0),
    * and an unseen context, both fall back to ln(1/V) — the same
    * uniform floor [[bigramScore]] uses, so the score is total.
    */
  def knBigramScore(docs: DataFrame, lm: DataFrame, idCol: String,
                    textCol: String): DataFrame = {
    val tr = transitions(docs, idCol, textCol)
    val ctx = lm.select(col("t1"), col("c1"), col("n1p")).dropDuplicates("t1")
    val cont = lm.select(col("t2"), col("n1m")).dropDuplicates("t2")
    val scalars = lm.select(max(col("b")).as("__b"), max(col("v")).as("__v"))
    val scored = tr
      .join(lm.select(col("t1"), col("t2"), col("c12")), Seq("t1", "t2"), "left")
      .join(ctx, Seq("t1"), "left")
      .join(cont, Seq("t2"), "left")
      .crossJoin(broadcast(scalars))
      .withColumn("__num",
        greatest(lit(4L) * coalesce(col("c12"), lit(0L)) - lit(3L), lit(0L)) *
          col("__b") +
          lit(3L) * coalesce(col("n1p"), lit(0L)) * coalesce(col("n1m"), lit(0L)))
      .withColumn("__lpq",
        when(col("c1").isNotNull && col("__num") > 0,
          floor(lit(1000000.0) * log(col("__num").cast("double") /
            (lit(4L) * col("__b") * col("c1")).cast("double"))))
          .otherwise(
            floor(lit(1000000.0) * log(lit(1.0) / col("__v").cast("double"))))
          .cast("long"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trans"), sum(col("__lpq")).as("kn_lp_q"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_trans"), lit(0L)).as("n_trans"),
        coalesce(col("kn_lp_q"), lit(0L)).as("kn_lp_q"),
        when(col("n_trans") > 0,
          (col("kn_lp_q").cast("double") / lit(1000000.0)) /
            col("n_trans").cast("double"))
          .as("kn_lp_mean"))
  }

  /** Curriculum quality binning: split the corpus into `nBins`
    * equal-size tiles by descending [[TextFns.qualityScore]] (ties by
    * id; NULL text scores −1, after everything real) — the
    * easy-to-hard ordering curriculum schedules train on, reported as
    * per-bin (n_docs, sum_tokens, min/max quality).
    *
    * The bin IS SQL `ntile(n) OVER (ORDER BY score DESC, id)`, but
    * computed WITHOUT the single-partition global window (a global
    * sort of the corpus through one task — the canonical 100 TB
    * scale-killer). Two passes instead:
    *   1. coarse bucket = ⌊score·64⌋ (score ∈ [−1, 1] ⇒ ≤ 129 distinct
    *      buckets); one hash aggregate counts each bucket, and the
    *      bounded count table collects to the driver, where
    *      higher-bucket prefix sums become per-bucket rank offsets;
    *   2. `row_number` partitioned BY BUCKET (each task sorts one
    *      score-slice, never the corpus) + broadcast offset = the exact
    *      global rank; the ntile bin then follows arithmetically
    *      (first N mod n tiles take ⌈N/n⌉ rows, the rest ⌊N/n⌋).
    *
    * Skew note: a single coarse bucket can still concentrate mass if
    * scores pile on one value (e.g. every empty doc scores exactly 0);
    * per-bucket partitions bound the sort at |bucket|, which for a
    * continuous composite score is ≈ N/129 — and the operator never
    * sorts more than one bucket in one task either way.
    */
  def curriculumBins(docs: DataFrame, idCol: String, textCol: String,
                     stopwords: Seq[String], nBins: Int): DataFrame = {
    require(nBins > 0, s"nBins ($nBins) must be positive")
    import docs.sparkSession.implicits._
    val scored = docs.select(
      col(idCol),
      TextFns.tokenCount(col(textCol)).cast("long").as("__tok"),
      coalesce(TextFns.qualityScore(col(textCol), stopwords), lit(-1.0))
        .as("__score"))
      .withColumn("__bucket", floor(col("__score") * lit(64.0)).cast("int"))
    // bounded: ≤ 129 buckets regardless of corpus size
    val counts = scored.groupBy(col("__bucket")).agg(count(lit(1)).as("__c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(-_._1)
    val total = counts.map(_._2).sum
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (b, c)) => (b, acc + c) }
      .zip(counts).map { case ((_, before), (b, _)) => (b, before) }
    val offsetDf = offsets.toSeq.toDF("__bucket", "__off")
    val wInBucket = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__bucket"))
      .orderBy(col("__score").desc, col(idCol).asc)
    val nBig = total % nBins          // first nBig tiles take small+1 rows
    val small = total / nBins
    val cut = nBig * (small + 1)
    val ranked = scored
      .join(broadcast(offsetDf), Seq("__bucket"))
      .withColumn("__rank", col("__off") + row_number().over(wInBucket))
    val binned =
      if (small == 0) ranked.withColumn("bin", col("__rank").cast("int"))
      else ranked.withColumn("bin",
        when(col("__rank") <= cut,
          floor((col("__rank") - 1) / lit(small + 1)) + 1)
          .otherwise(lit(nBig) + floor((col("__rank") - lit(cut) - 1) / lit(small)) + 1)
          .cast("int"))
    binned.groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__tok")).as("sum_tokens"),
        min(col("__score")).as("min_quality"),
        max(col("__score")).as("max_quality"))
  }

  /** Corpus snapshot diff — what changed between two crawl/ingest
    * versions, by id and content hash: `added` (id only in new),
    * `removed` (id only in old), `changed` (same id, different
    * normalized-content hash), `unchanged`. The operational primitive
    * behind incremental re-processing: downstream stages (dedup
    * signatures, embeddings, LM scores) re-run on `added ∪ changed`
    * only, and retention audits read `removed`. Content equality is
    * [[graft.functions.TextFns.normalizeText]] + [[Dedup.md5Hash60]] —
    * whitespace/case churn is NOT a change (re-crawls reformat
    * constantly; re-embedding the corpus over tabs-vs-spaces is the
    * classic wasted-epoch story).
    *
    * Plan shape: both sides reduce to (id, 8-byte hash) in the scan
    * stage, then ONE full outer join on id — text never shuffles. NULL
    * text hashes NULL; two NULLs compare equal here (`<=>`), so a
    * doc missing text in both versions is `unchanged`, not forever
    * `changed`.
    */
  def corpusDiff(oldDocs: DataFrame, newDocs: DataFrame, idCol: String,
                 textCol: String): DataFrame = {
    // presence flags, not hash-nullness, decide added/removed — a
    // null-TEXT doc also hashes null and must not read as absent
    def keyed(df: DataFrame, hashAs: String, presAs: String): DataFrame =
      df.select(col(idCol),
        Dedup.md5Hash60(TextFns.normalizeText(col(textCol))).as(hashAs),
        lit(true).as(presAs))
    keyed(oldDocs, "__ho", "__po")
      .join(keyed(newDocs, "__hn", "__pn"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__po").isNull, lit("added"))
          .when(col("__pn").isNull, lit("removed"))
          .when(col("__ho") <=> col("__hn"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Per-source vocabulary profile — the Heaps/Zipf diagnostics a
    * corpus report leads with: token mass N, type count V (distinct
    * tokens), hapax legomena count (types seen exactly once) and the
    * hapax share of the vocabulary. A healthy natural-language source
    * shows V ≪ N with a large hapax share (Zipf tail); V ≈ N flags
    * id/hash spam, a collapsed hapax share flags template/boilerplate
    * farms — cheap signals that catch whole bad SOURCES before any
    * per-doc scoring runs.
    *
    * Plan shape: one explode to (source, token) with map-side-combined
    * counting — the only shuffle carries distinct (source, token)
    * pairs (vocabulary-bounded, NOT corpus-bounded) — then a per-source
    * fold. Empty-string tokens (blank docs tokenize to `[""]`) are
    * dropped, not counted as a type.
    */
  def vocabStats(docs: DataFrame, textCol: String,
                 srcCol: String): DataFrame =
    docs
      .select(col(srcCol), explode(TextFns.tokens(col(textCol))).as("__t"))
      .filter(col("__t") =!= "")
      .groupBy(col(srcCol), col("__t")).agg(count(lit(1)).as("__n"))
      .groupBy(col(srcCol))
      .agg(sum(col("__n")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("__n") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .withColumn("hapax_ratio",
        col("n_hapax").cast("double") / col("n_types").cast("double"))

  /** k-anonymity suppression: drop every row whose quasi-identifier
    * combination is shared by fewer than `k` rows. The release-safety
    * primitive for publishing event/interaction data alongside a
    * training corpus — any group small enough to re-identify a member
    * is suppressed wholesale, the standard k-anonymity guarantee
    * (Sweeney 2002) restricted to suppression (no generalization
    * hierarchy — that is a policy input, not an engine feature).
    *
    * Plan shape: one hash aggregate over the quasi columns (map-side
    * combined — the shuffle carries distinct quasi combinations, not
    * rows), then an equi-join of the input back to the surviving
    * groups on the same keys — AQE co-partitions the join with the
    * aggregate's shuffle, so the corpus moves once. Returns the
    * surviving rows plus `grp_n` (their group's size); suppressed
    * rows are absent, not nulled.
    */
  def kAnonSuppress(df: DataFrame, quasiCols: Seq[String],
                    k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "quasiCols must not be empty")
    require(k >= 1, s"k ($k) must be >= 1")
    val keys = quasiCols.map(col)
    val groups = df.groupBy(keys: _*)
      .agg(count(lit(1)).as("grp_n"))
      .filter(col("grp_n") >= k)
    df.join(groups, quasiCols)
  }

  /** Distinct-l diversity audit per quasi-identifier group — the
    * companion check [[kAnonSuppress]] cannot express: a group can be
    * k-large yet carry ONE sensitive value (everyone in the group
    * shares it, so membership still discloses it). A group is diverse
    * iff its sensitive column takes ≥ l distinct values.
    *
    * Plan: exact-distinct two-stage shape — hash agg to the
    * (quasi…, sensitive) grid, then per-group counts from the grid
    * (no countDistinct sort-agg). Returns one row per group with
    * `grp_n`, `n_sensitive`, `diverse`.
    */
  def lDiversity(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, l: Int): DataFrame = {
    require(quasiCols.nonEmpty, "quasiCols must not be empty")
    require(l >= 1, s"l ($l) must be >= 1")
    val keys = quasiCols.map(col)
    df.groupBy((quasiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("__c"))
      .groupBy(keys: _*)
      .agg(sum(col("__c")).as("grp_n"),
        count(lit(1)).as("n_sensitive"))
      .withColumn("diverse", col("n_sensitive") >= l)
  }

  /** t-closeness audit per quasi-identifier group (Li, Li &
    * Venkatasubramanian 2007) for an ORDERED sensitive attribute —
    * the distributional companion to [[lDiversity]]: a group can be
    * k-large and l-diverse yet still disclosive when its sensitive
    * distribution is far from the corpus-wide one (e.g. one cohort's
    * values all sit in the top band). Distance is the ordered-attribute
    * Earth Mover's Distance: with the m global sensitive values sorted,
    * EMD = (1/(m−1))·Σ_j |CumP_j − CumQ_j|, computed EXACTLY in
    * integers on the common denominator grp_n·N —
    * |cum_c_j·N − cum_C_j·grp_n| summed as Decimal(38,0), quantized
    * once at the end (⌊10⁶·Σ/(grp_n·N·(m−1))⌋). A group passes iff
    * emd_q ≤ tQ.
    *
    * Plan shape: hash agg to the (quasi…, sensitive) grid, a second
    * agg to the m-row global distribution (broadcast back), one
    * join onto the groups×values grid (groups × m rows — m is
    * the BAND count, bounded by construction), and a per-group window
    * over ≤ m rows for the cumulatives. Nothing scans rows twice and
    * no window partition exceeds m.
    */
  def tCloseness(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, tQ: Long): DataFrame = {
    require(quasiCols.nonEmpty, "quasiCols must not be empty")
    require(tQ >= 0, s"tQ ($tQ) must be >= 0")
    val keys = quasiCols.map(col)
    val cells = df.groupBy((quasiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("__c"))
    val global = cells.groupBy(col(sensitiveCol))
      .agg(sum(col("__c")).as("__gc"))
    val groups = cells.groupBy(keys: _*)
      .agg(sum(col("__c")).as("grp_n"))
    // groups × global-value grid (missing cells count 0), so every
    // group's cumulative walks the SAME m sensitive values
    val grid = groups.crossJoin(broadcast(global))
      .join(cells, quasiCols :+ sensitiveCol, "left")
      .withColumn("__c", coalesce(col("__c"), lit(0L)))
    val wCum = Window.partitionBy(keys: _*)
      .orderBy(col(sensitiveCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keys: _*)
    val d38 = "decimal(38,0)"
    grid
      .withColumn("__n", sum(col("__gc")).over(wAll))
      .withColumn("__m", count(lit(1)).over(wAll))
      .withColumn("__cumc", sum(col("__c")).over(wCum))
      .withColumn("__cumg", sum(col("__gc")).over(wCum))
      .withColumn("__d",
        abs(col("__cumc").cast(d38) * col("__n").cast(d38) -
          col("__cumg").cast(d38) * col("grp_n").cast(d38)))
      .groupBy((keys :+ col("grp_n")): _*)
      .agg(first(col("__n")).as("__n"), first(col("__m")).as("m_values"),
        sum(col("__d")).as("__dsum"))
      .withColumn("emd_q",
        when(col("m_values") > 1,
          expr(s"CAST((CAST(1000000 AS $d38) * __dsum) div " +
            s"(CAST(grp_n AS $d38) * CAST(__n AS $d38) * " +
            "CAST(m_values - 1 AS decimal(38,0))) AS LONG)"))
          .otherwise(lit(0L)))
      .withColumn("close", col("emd_q") <= tQ)
      .drop("__n", "__dsum")
  }

  /** Duplicate-cluster-aware train/val/test split — the leakage-safe
    * upgrade of [[stratifiedSplit]]: that operator guarantees EXACT
    * duplicates share a split (content-hash key), but two NEAR-dup
    * docs can still land on opposite sides and leak evaluation
    * answers into training. Here the split key is the doc's duplicate
    * CLUSTER (connected components over a caller-supplied near-dup
    * pair frame — [[Dedup.dupClusters]], so LSH/Jaccard/edit-distance
    * pairs all work), and every member of a cluster lands in ONE
    * split. Docs in no pair are their own singleton cluster. The
    * bucket is md5₆₀(cluster:salt) % 100 — deterministic across runs,
    * engines, and partitionings, and STABLE under corpus growth as
    * long as cluster representatives (min ids) are stable.
    *
    * Plan: components (bounded label-propagation rounds or in-core
    * union-find — dupClusters' contract), one left join back to ids,
    * scan-stage hash. Returns (id, cluster_id, split); the caller
    * joins payload back by id, so no text ever shuffles here.
    */
  def clusterSplit(docs: DataFrame, idCol: String, pairs: DataFrame,
                   trainPct: Int = 80, valPct: Int = 10,
                   salt: String = ""): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages: train=$trainPct val=$valPct")
    val comp = Dedup.dupClusters(pairs)
      .select(col("id").as(idCol), col("cluster_id"))
    val bucket = Dedup.md5Hash60(concat(
      col("cluster_id").cast("string"), lit(":" + salt))) % 100
    docs.select(col(idCol))
      .join(comp, Seq(idCol), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col(idCol)))
      .withColumn("split",
        when(bucket < trainPct, lit("train"))
          .when(bucket < trainPct + valPct, lit("val"))
          .otherwise(lit("test")))
  }

  /** Seeded Laplace-mechanism noisy counts — the ε-differential-privacy
    * release primitive for count statistics (Dwork, McSherry, Nissim &
    * Smith 2006; count queries have sensitivity 1, so Laplace scale
    * b = 1/ε): per-group exact count n plus Laplace(0, b) noise, where
    * the uniform draw is the md5₆₀ of the group key and a caller salt —
    * fully deterministic across runs, partitionings, and engines (the
    * [[weightedSample]] device), so a privacy-release job is replayable
    * and auditable while still drawing honest inverse-CDF Laplace noise
    * per key. A fresh salt per release epoch gives fresh noise.
    *
    * u = (md5₆₀(key:salt) + ½)/2⁶⁰ ∈ (0,1), then the inverse CDF
    * x = −b·sgn(u−½)·ln(1−2·|u−½|), quantized ⌊10⁶·x⌋ once. The
    * released value is `noisy_n_q = 10⁶·n + noise_q` (micro-units).
    *
    * Plan: one hash aggregate to groups, then scan-stage hash + ln per
    * group row — noise cost is O(groups), never O(rows).
    */
  def dpNoisyCounts(df: DataFrame, keyCols: Seq[String], bQ: Long,
                    salt: String): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must not be empty")
    require(bQ > 0, s"bQ ($bQ) must be positive")
    val counts = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
    val keyStr = concat_ws(":",
      keyCols.map(c => coalesce(col(c).cast("string"), lit(""))) :+
        lit(salt): _*)
    val u = (Dedup.md5Hash60(keyStr).cast("double") + lit(0.5)) /
      lit(math.pow(2, 60))
    val b = lit(bQ.toDouble / 1e6)
    val noise = -b * signum(u - lit(0.5)) *
      log(lit(1.0) - lit(2.0) * abs(u - lit(0.5)))
    counts
      .withColumn("noise_q", floor(lit(1000000.0) * noise).cast("long"))
      .withColumn("noisy_n_q", lit(1000000L) * col("n") + col("noise_q"))
  }

  /** Purged chronological split: train on the past, validate on the
    * future, with an embargo gap between them so near-boundary leakage
    * (a validation row whose context overlaps the last training rows)
    * is structurally impossible — the purged split of financial ML
    * (de Prado 2018, ch. 7) applied to corpus events.
    *
    * The cutoff is the EXACT (num/den)-quantile of `tsMicrosCol`
    * (rational rank arithmetic, [[Quantiles.exactQuantiles]] — no
    * float ever touches rank selection, so any engine derives the same
    * boundary). Rows with ts <= cutoff are `train`; rows with
    * ts > cutoff + embargoMicros are `valid`; rows inside the gap are
    * labeled `embargo` for the caller to discard or audit.
    *
    * Plan shape: the quantile pass is the two-pass bucket-count shape
    * (shuffles counts, not rows); the labeling pass is a scan with two
    * broadcast scalars. Nothing global-sorts the corpus.
    */
  def timeSplit(df: DataFrame, tsMicrosCol: String,
                num: Int, den: Int, embargoMicros: Long,
                bucketWidth: Long = 86400L * 1000000L): DataFrame = {
    require(embargoMicros >= 0, "embargoMicros must be non-negative")
    val cut = Quantiles.exactQuantiles(
      df.select(lit("all").as("__one"), col(tsMicrosCol)),
      "__one", tsMicrosCol, bucketWidth, Seq(("cut", num, den)))
      .select(col("value").as("__cut"))
    df.crossJoin(broadcast(cut))
      .withColumn("split",
        when(col(tsMicrosCol) <= col("__cut"), lit("train"))
          .when(col(tsMicrosCol) > col("__cut") + lit(embargoMicros),
            lit("valid"))
          .otherwise(lit("embargo")))
      .drop("__cut")
  }

  /** Windowed token co-occurrence with PMI (Church & Hanks 1990) — the
    * word2vec/GloVe-style association table a corpus pipeline derives
    * for embedding pre-training, synonym mining, and tokenizer-merge
    * diagnostics. Pairs are unordered (lexicographically normalized)
    * over a ±`window` token neighborhood;
    *
    *   pmi = ln(c_xy · N² / (P · c_x · c_y))
    *
    * with c_x unigram occurrence counts (N total), c_xy pair counts
    * (P total). Quantized ⌊10⁶·pmi⌋ — every factor is an exact long,
    * so the double expression is engine-identical.
    *
    * Plan shape: one explode to ≤ window·tokens pair rows (the token
    * array is let-bound behind a projection boundary — the transitions
    * lesson: element_at over an unmaterialized split would re-tokenize
    * per element), then two map-side-combined hash aggregates
    * (vocabulary- and pair-bounded, not corpus-bounded). `minCount`
    * prunes the pair tail before the PMI join.
    */
  /** Canonical (a ≤ b) token co-occurrence pairs within a ±`window`
    * token span — the shared association-edge builder for [[pmiPairs]]
    * and [[Segments.textRank]]. One explode per doc; the pair structs
    * are built inline from the token array, so TEXT never shuffles —
    * only the (a, b) string pairs do.
    */
  def cooccurrencePairs(docs: DataFrame, idCol: String, textCol: String,
                        window: Int): DataFrame = {
    require(window >= 1, s"window ($window) must be >= 1")
    docs
      .select(col(idCol),
        filter(TextFns.tokens(col(textCol)), t => length(t) > 0)
          .as("__toks"))
      .select(explode(when(size(col("__toks")) >= 2,
        flatten(transform(sequence(lit(1), size(col("__toks")) - 1), i =>
          transform(sequence(i + 1, least(i + lit(window), size(col("__toks")))),
            j => struct(
              least(element_at(col("__toks"), i),
                element_at(col("__toks"), j)).as("a"),
              greatest(element_at(col("__toks"), i),
                element_at(col("__toks"), j)).as("b"))))))
        .otherwise(array().cast("array<struct<a:string,b:string>>")))
        .as("__p"))
      .select(col("__p.a").as("a"), col("__p.b").as("b"))
  }

  def pmiPairs(docs: DataFrame, idCol: String, textCol: String,
               window: Int, minCount: Long = 1L): DataFrame = {
    require(window >= 1, s"window ($window) must be >= 1")
    val pairs = cooccurrencePairs(docs, idCol, textCol, window)
    val uni = docs
      .select(explode(filter(TextFns.tokens(col(textCol)),
        t => length(t) > 0)).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
      .mat
    val nTot = uni.agg(sum(col("c")).as("n_tot"))
    val pc = pairs.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minCount)
      .mat
    val pTot = pc.agg(sum(col("c_xy")).as("p_tot"))
    pc
      .join(uni.select(col("t").as("a"), col("c").as("c_x")), Seq("a"))
      .join(uni.select(col("t").as("b"), col("c").as("c_y")), Seq("b"))
      .crossJoin(broadcast(nTot)).crossJoin(broadcast(pTot))
      .select(col("a"), col("b"), col("c_xy"), col("c_x"), col("c_y"),
        floor(lit(1000000.0) * log(
          col("c_xy").cast("double") * col("n_tot").cast("double") *
            col("n_tot").cast("double") /
            (col("p_tot").cast("double") * col("c_x").cast("double") *
              col("c_y").cast("double"))))
          .cast("long").as("pmi_q"))
  }

  /** Per-source z-score normalization of a per-doc metric (token
    * count here) — cross-source quality scores are not comparable raw
    * (a code corpus's "short" is a news corpus's "long"), so mixing
    * policies normalize within source first. Population mean/std from
    * exact long sums (Σx, Σx², n) — the double expression
    * `sqrt(Σx²/n − (Σx/n)²)` is engine-identical; z is emitted
    * quantized ⌊10⁴·z⌋ and null for degenerate (std = 0) sources.
    *
    * Plan shape: one map-side-combined aggregate to |sources| rows,
    * broadcast back, z in the scan stage.
    */
  def sourceZScores(docs: DataFrame, idCol: String, textCol: String,
                    srcCol: String): DataFrame = {
    val base = docs.select(col(idCol), col(srcCol),
      TextFns.tokenCount(col(textCol)).cast("long").as("x"))
    val stats = base.groupBy(col(srcCol))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"),
        sum(col("x") * col("x")).as("ss"))
    val mean = col("s").cast("double") / col("n").cast("double")
    val variance = col("ss").cast("double") / col("n").cast("double") -
      mean * mean
    base.join(broadcast(stats), Seq(srcCol))
      .withColumn("__std", sqrt(variance))
      .select(col(idCol), col(srcCol), col("x").as("n_tokens"),
        when(col("__std") > 0,
          floor(lit(10000.0) * (col("x").cast("double") - mean) /
            col("__std")).cast("long")).as("z_q"))
  }

  /** χ² keyness: the terms most distinctive of each source vs the rest
    * of the corpus (Dunning/keyness analysis — the corpus-linguistics
    * tool a curation team uses to understand WHAT a source contributes
    * before weighting it). For term t in source s with the 2×2 table
    * (a = c(t,s), b = c(t,¬s), c = c(¬t,s), d = c(¬t,¬s)):
    *
    *   χ² = N·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d))
    *
    * computed in doubles OF exact longs (literal-identical expression
    * on any engine), emitted ⌊100·χ²⌋. Only positively-associated
    * terms (ad > bc) rank — depletion keyness is the complement set,
    * not this listing. `minCount` drops unstable low-frequency cells.
    *
    * Plan shape: one explode → one (source, term) hash aggregate
    * (vocabulary-bounded shuffle), term and source margins derived
    * from it, broadcast margins joined back, top-k per source over
    * vocab-bounded rows — never a corpus-sized window.
    */
  def keyness(docs: DataFrame, textCol: String, srcCol: String,
              minCount: Long = 5L, k: Int = 10): DataFrame = {
    require(k > 0, s"k ($k) must be positive")
    val st = docs
      .select(col(srcCol).as("source"),
        explode(TextFns.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("a"))
      .mat
    val termTot = st.groupBy(col("term")).agg(sum(col("a")).as("ct"))
    val srcTot = st.groupBy(col("source")).agg(sum(col("a")).as("ns"))
    val nTot = srcTot.agg(sum(col("ns")).as("n_tot"))
    val cells = st
      .join(termTot, Seq("term"))
      .join(broadcast(srcTot), Seq("source"))
      .crossJoin(broadcast(nTot))
      .withColumn("b", col("ct") - col("a"))
      .withColumn("c", col("ns") - col("a"))
      .withColumn("d", col("n_tot") - col("ns") - col("b"))
      .filter(col("a") >= minCount)
      .filter(col("a").cast("double") * col("d").cast("double") >
        col("b").cast("double") * col("c").cast("double"))
    val num = col("n_tot").cast("double") *
      (col("a").cast("double") * col("d").cast("double") -
        col("b").cast("double") * col("c").cast("double")) *
      (col("a").cast("double") * col("d").cast("double") -
        col("b").cast("double") * col("c").cast("double"))
    val den = (col("a") + col("b")).cast("double") *
      (col("c") + col("d")).cast("double") *
      (col("a") + col("c")).cast("double") *
      (col("b") + col("d")).cast("double")
    val w = Window.partitionBy(col("source"))
      .orderBy(col("chi2_q").desc, col("term").asc)
    cells
      .withColumn("chi2_q", floor(lit(100.0) * num / den).cast("long"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("source"), col("rank"), col("term"), col("a"),
        col("chi2_q"))
  }

  /** Deterministic MLM masking plan (BERT's 80/10/10 at 15%): for each
    * token position, a portable hash-derived uniform decides mask /
    * random-replace / keep-original; unmasked positions are not
    * emitted. Pre-computing the plan as data (instead of RNG calls in
    * the training loop) makes masking reproducible across epochs,
    * engines, and restarts — u = (md5₆₀(id:pos:salt)+1)/2⁶⁰, the q131
    * sampling contract.
    *
    * Plan shape: one posexplode over the let-bound token array (the
    * transitions lesson) then a scan-stage filter keeping ~15 % of
    * positions. No shuffle at all.
    */
  def mlmMaskPlan(docs: DataFrame, idCol: String, textCol: String,
                  salt: String = "mlm"): DataFrame = {
    val toks = docs.select(col(idCol),
      filter(TextFns.tokens(col(textCol)), t => length(t) > 0).as("__toks"))
    val u = (Dedup.md5Hash60(concat(col(idCol).cast("string"), lit(":"),
      col("pos").cast("string"), lit(":" + salt))) + lit(1L))
      .cast("double") / lit(math.pow(2, 60))
    toks
      .select(col(idCol), posexplode(col("__toks")).as(Seq("__p", "token")))
      .withColumn("pos", (col("__p") + 1).cast("long")).drop("__p")
      .withColumn("__u", u)
      .filter(col("__u") < 0.15)
      .withColumn("action",
        when(col("__u") < 0.12, lit("mask"))
          .when(col("__u") < 0.135, lit("random"))
          .otherwise(lit("keep")))
      .select(col(idCol), col("pos"), col("token"), col("action"),
        round(col("__u"), 6).as("u_r"))
  }

  /** Vocabulary coverage / OOV-rate audit: fix the top-`vocabSize`
    * corpus terms (by frequency, ties lexicographic — fully
    * deterministic) as the vocabulary, then report each source's
    * out-of-vocabulary token share — the pre-tokenizer sizing question
    * ("does a 32k vocab cover the code source or starve it?").
    * oov_q = ⌊10⁶·oov/total⌋ from exact longs.
    *
    * Plan shape: one explode → (term) and (source, term) hash
    * aggregates (vocabulary-bounded shuffles); the vocab cut is a sort
    * of the VOCAB table (never the corpus) and broadcasts back as an
    * anti-join key set.
    */
  def vocabCoverage(docs: DataFrame, textCol: String, srcCol: String,
                    vocabSize: Int): DataFrame = {
    require(vocabSize > 0, s"vocabSize ($vocabSize) must be positive")
    val st = docs
      .select(col(srcCol).as("source"),
        explode(TextFns.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("c"))
      .mat
    val vocab = st.groupBy(col("term")).agg(sum(col("c")).as("ct"))
      .orderBy(col("ct").desc, col("term").asc)
      .limit(vocabSize)
      .select(col("term"), lit(1L).as("__in"))
    st.join(broadcast(vocab), Seq("term"), "left")
      .groupBy(col("source"))
      .agg(sum(col("c")).as("n_tokens"),
        sum(when(col("__in").isNull, col("c")).otherwise(0L)).as("n_oov"))
      .withColumn("oov_q",
        floor(lit(1000000.0) * col("n_oov").cast("double") /
          col("n_tokens").cast("double")).cast("long"))
  }

  /** Term burstiness (Church & Gale): variance-to-mean ratio of a
    * term's per-document count over ALL `nDocs` documents (zeros
    * included) — bursty terms (VMR ≫ 1) concentrate in few documents
    * (topical/template terms), Poisson-like terms spread evenly
    * (function words). The complement diagnostic to [[keyness]]:
    * keyness says WHERE a term lives, burstiness says HOW it clusters.
    *
    *   vmr = (Σc²/N − (Σc/N)²) / (Σc/N), emitted ⌊10⁴·vmr⌋
    *
    * from exact long Σc, Σc², N — engine-identical doubles. `minDf`
    * drops unstable rare terms; top-`k` by (vmr, term) ranks over the
    * vocabulary-bounded table, never the corpus.
    */
  def burstiness(docs: DataFrame, idCol: String, textCol: String,
                 nDocs: Long, minDf: Long = 5L, k: Int = 50): DataFrame = {
    require(nDocs > 0, s"nDocs ($nDocs) must be positive")
    require(k > 0, s"k ($k) must be positive")
    val tc = docs
      .select(col(idCol),
        explode(TextFns.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("c"))
    val stats = tc.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("c")).as("s"),
        sum(col("c") * col("c")).as("ss"))
      .filter(col("df") >= minDf)
    val mean = col("s").cast("double") / lit(nDocs).cast("double")
    val e2 = col("ss").cast("double") / lit(nDocs).cast("double")
    val w = Window.orderBy(col("vmr_q").desc, col("term").asc)
    stats
      .withColumn("vmr_q",
        floor(lit(10000.0) * (e2 - mean * mean) / mean).cast("long"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("rank"), col("term"), col("df"), col("s").as("tf"),
        col("vmr_q"))
  }

  /** Corpus health card: the per-source dataset-card row a curation
    * run publishes next to its export manifest — doc/token mass,
    * type/hapax vocabulary health ([[vocabStats]] semantics), the
    * exact-duplicate share (normalized-hash groups of size > 1), and
    * the OOV share vs the corpus top-`vocabSize` vocabulary
    * ([[vocabCoverage]] semantics). Every number derives from exact
    * longs.
    *
    * Plan shape: composes three vocabulary-bounded aggregates and one
    * (hash → count) dedup aggregate; the corpus is scanned twice
    * (tokens, hashes), nothing corpus-sized shuffles beyond the
    * (source, term) tables the components already pay for.
    */
  def corpusHealthCard(docs: DataFrame, idCol: String, textCol: String,
                       srcCol: String, vocabSize: Int): DataFrame = {
    val vs = vocabStats(docs, textCol, srcCol)
      .select(col(srcCol), col("n_tokens"), col("n_types"), col("n_hapax"))
    val cov = vocabCoverage(docs, textCol, srcCol, vocabSize)
      .select(col("source").as(srcCol), col("n_oov"), col("oov_q"))
    val hashes = docs.select(col(idCol), col(srcCol),
      md5(TextFns.normalizeText(coalesce(col(textCol), lit(""))))
        .as("__h"))
    val dupGroups = hashes.groupBy(col("__h"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1)
      .select(col("__h"), lit(1L).as("__dup"))
    val dups = hashes.join(dupGroups, Seq("__h"), "left")
      .groupBy(col(srcCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__dup").isNotNull, 1L).otherwise(0L))
          .as("n_dup_docs"))
      .withColumn("dup_q",
        floor(lit(1000000.0) * col("n_dup_docs").cast("double") /
          col("n_docs").cast("double")).cast("long"))
    dups
      .join(vs, Seq(srcCol), "left")
      .join(cov, Seq(srcCol), "left")
      .select(col(srcCol), col("n_docs"), col("n_dup_docs"), col("dup_q"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_types"), lit(0L)).as("n_types"),
        coalesce(col("n_hapax"), lit(0L)).as("n_hapax"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        coalesce(col("oov_q"), lit(0L)).as("oov_q"))
  }

  /** Code-switch detection: chunk each document into fixed token
    * windows, language-ID every chunk ([[TextFns.langId]]'s marker
    * heuristic), and report per doc how the language flips — mixed-
    * language documents poison monolingual training mixes yet pass
    * doc-level language ID (the dominant language wins the vote). Per
    * doc: chunk count, distinct chunk languages, boundary switches
    * (adjacent chunks disagreeing), the dominant language
    * (lexicographically smallest among count ties — deterministic) and
    * its share ⌊10⁶·max/n⌋.
    *
    * Plan shape: one chunk explode, per-doc-bounded windows (a doc's
    * chunk list, never the corpus), two hash aggregates.
    */
  def codeSwitchSignals(docs: DataFrame, idCol: String, textCol: String,
                        chunkSize: Int = 20): DataFrame = {
    val ch = chunkTokens(docs, idCol, textCol, chunkSize, chunkSize)
      .select(col(idCol), col("start_tok"),
        TextFns.langId(col("chunk_text")).as("__lang"))
    val wSeq = Window.partitionBy(col(idCol)).orderBy(col("start_tok"))
    val switches = ch
      .withColumn("__prev", lag(col("__lang"), 1).over(wSeq))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("__prev").isNotNull &&
          col("__prev") =!= col("__lang"), 1L).otherwise(0L))
          .as("n_switches"))
    val perLang = ch.groupBy(col(idCol), col("__lang"))
      .agg(count(lit(1)).as("__c"))
    val wDoc = Window.partitionBy(col(idCol))
    val dom = perLang
      .withColumn("__mx", max(col("__c")).over(wDoc))
      .withColumn("__nl", count(lit(1)).over(wDoc))
      .filter(col("__c") === col("__mx"))
      .groupBy(col(idCol))
      .agg(min(col("__lang")).as("dominant_lang"),
        min(col("__mx")).as("__mxc"), min(col("__nl")).as("n_langs"))
    switches.join(dom, Seq(idCol))
      .select(col(idCol), col("n_chunks"), col("n_langs"),
        col("n_switches"), col("dominant_lang"),
        floor(lit(1000000.0) * col("__mxc").cast("double") /
          col("n_chunks").cast("double")).cast("long").as("dom_share_q"))
  }

  /** Preference-pair construction for reward-model / DPO-style
    * training: within each source, rank docs by an integer quality
    * score (exact ranks, [[Quantiles.exactRanks]] — no per-group
    * global sort), then pair rank r with rank r + ⌈n/2⌉ — maximally
    * separated halves, every doc used at most once, the odd middle
    * element skipped. Emits (source, low/high ids and scores, margin);
    * callers filter small margins.
    *
    * Plan shape: the rank pass plus ONE self equi-join on
    * (source, rank) — co-partitioned keys, no broadcast of the corpus.
    */
  def preferencePairs(docs: DataFrame, idCol: String, textCol: String,
                      srcCol: String, bucketWidth: Long = 8L): DataFrame = {
    val ranked = Quantiles.exactRanks(
      docs.select(col(idCol), col(srcCol),
        TextFns.tokenCount(col(textCol)).cast("long").as("score")),
      srcCol, "score", bucketWidth, Seq(idCol))
    val half = col("grp_n") - (col("grp_n") / lit(2L)).cast("long")
    val low = ranked.filter(col("rank") <= col("grp_n") / lit(2L))
      .select(col(srcCol).as("source"), col(idCol).as("low_id"),
        col("score").as("low_score"), (col("rank") + half).as("__pr"))
    val high = ranked.select(col(srcCol).as("source"),
      col(idCol).as("high_id"), col("score").as("high_score"),
      col("rank").as("__pr"))
    low.join(high, Seq("source", "__pr"))
      .select(col("source"), col("low_id"), col("high_id"),
        col("low_score"), col("high_score"),
        (col("high_score") - col("low_score")).as("margin"))
  }

  /** T5-style span-corruption plan: fixed `spanLen`-token blocks, each
    * independently selected with probability `rate` by the portable
    * md5₆₀ uniform ([[mlmMaskPlan]]'s contract) — span starts never
    * depend on earlier selections, so the plan is embarrassingly
    * parallel AND exactly replayable (sequential geometric-span
    * sampling would be neither). Emits per selected block its span
    * start/length and the per-doc sentinel ordinal.
    *
    * Plan shape: one block explode (n/spanLen rows per doc) filtered
    * to ~rate of blocks, one per-doc-bounded window for the sentinel
    * numbering.
    */
  def spanCorruptPlan(docs: DataFrame, idCol: String, textCol: String,
                      spanLen: Int = 3, rate: Double = 0.05,
                      salt: String = "t5"): DataFrame = {
    require(spanLen >= 1, s"spanLen ($spanLen) must be >= 1")
    require(rate > 0 && rate < 1, s"rate ($rate) must be in (0,1)")
    val toks = docs.select(col(idCol),
      filter(TextFns.tokens(col(textCol)), t => length(t) > 0).as("__toks"))
    val u = (Dedup.md5Hash60(concat(col(idCol).cast("string"), lit(":"),
      col("block").cast("string"), lit(":" + salt))) + lit(1L))
      .cast("double") / lit(math.pow(2, 60))
    val wDoc = Window.partitionBy(col(idCol)).orderBy(col("block"))
    toks
      .filter(size(col("__toks")) > 0)
      .select(col(idCol), size(col("__toks")).cast("long").as("__n"),
        // integer block count ⌈n/spanLen⌉ via `div` (Spark `/` on
        // longs is DOUBLE division and would break sequence())
        explode(sequence(lit(0L),
          expr(s"(CAST(size(__toks) AS BIGINT) + ${spanLen - 1}L) " +
            s"div ${spanLen}L") - lit(1L))).as("block"))
      .withColumn("__u", u)
      .filter(col("__u") < lit(rate))
      .withColumn("span_start", col("block") * spanLen + 1)
      .withColumn("span_len",
        least(lit(spanLen.toLong), col("__n") - col("block") * spanLen))
      .withColumn("sentinel", row_number().over(wDoc))
      .select(col(idCol), col("block"), col("span_start"), col("span_len"),
        col("sentinel"), round(col("__u"), 6).as("u_r"))
  }

  /** Inverse-frequency class weights: weight_q = ⌊10⁶ · N / (K · n_c)⌋
    * per label value — the "balanced" class-weight heuristic
    * (sklearn's class_weight='balanced') for loss re-weighting when a
    * corpus's label distribution is skewed. Quantized to a long so the
    * division result is engine-exact (the centroidOutliers contract).
    *
    * One map-side-combined hash aggregate (labels are tiny) plus a
    * broadcast total — scan-stage at any scale.
    */
  def classWeights(df: DataFrame, labelCol: String): DataFrame = {
    val counts = df.groupBy(col(labelCol))
      .agg(count(lit(1)).as("n_c"))
    val totals = counts.agg(sum(col("n_c")).as("__n"),
      count(lit(1)).as("__k"))
    counts.crossJoin(broadcast(totals))
      .select(col(labelCol),
        col("n_c"),
        floor(lit(1000000.0) * col("__n").cast("double") /
          (col("__k") * col("n_c")).cast("double")).cast("long")
          .as("weight_q"))
  }

  /** Per-doc Shannon entropy of the token distribution — the
    * information-density quality signal (near-zero entropy = keyword
    * stuffing / repeated-token spam, even when length and stopword
    * filters pass).
    *
    * H = ln n − (Σ_t c_t·ln c_t)/n is quantized PER TERM before the
    * sum: each type contributes ⌊10⁶·c_t·ln c_t⌋ (one ln + one
    * multiply + one floor, engine-identical), so the corpus-wide sum
    * is exact long arithmetic — no float accumulation whose value
    * depends on partition order. The reported
    *   entropy_q = ⌊10⁶·ln n⌋ − (S div n)
    * is therefore bit-reproducible and within 2·10⁻⁶ nats of exact H.
    *
    * Plan shape: one explode with map-side-combined (doc, term)
    * counting, one per-doc fold, one left join back for empty docs.
    */
  def tokenEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = docs
      .select(col(idCol), explode(TextFns.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("c"))
    val perDoc = tf.groupBy(col(idCol))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(floor(lit(1000000.0) * col("c").cast("double") *
          log(col("c").cast("double"))).cast("long")).as("__s"))
      .select(col(idCol), col("n_tokens"), col("n_types"),
        (floor(lit(1000000.0) * log(col("n_tokens").cast("double")))
          .cast("long") - expr("__s div n_tokens")).as("entropy_q"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .na.fill(0L, Seq("n_tokens", "n_types"))
  }

  /** Corpus vocabulary-spectrum constants — Yule's K, Sichel's S and
    * Honoré's R — the lexical-richness fingerprints that stay stable
    * under corpus growth (unlike raw type counts, which ride Heaps'
    * law; see q173/q194). From the term-frequency spectrum
    * V_m = #types occurring m times:
    *
    *   K = 10⁴·(Σ m²·V_m − N)/N²      (repeat-rate, size-invariant)
    *   S = V₂/V                        (dis legomena share)
    *   R = 100·ln(N)/(1 − V₁/V)        (hapax-driven richness)
    *
    * K and S are EXACT integer divisions on decimal(38,0) products
    * (Σm² = Σ over types of count², which overflows long ×10¹⁰ at
    * corpus scale); R is one mirrored ln-on-exact-input chain, NULL
    * for the all-hapax corpus. Plan: explode → term hash agg → one
    * bounded agg — the same two-shuffle shape as every tf gate; the
    * spectrum never materializes per-m rows.
    */
  def vocabSpectrum(docs: DataFrame, textCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val tf = docs
      .select(explode(TextFns.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("term")).agg(count(lit(1)).as("m"))
    tf.agg(sum(col("m")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("m") === 1, 1L).otherwise(0L)).as("v1"),
        sum(when(col("m") === 2, 1L).otherwise(0L)).as("v2"),
        sum(dec(col("m")) * dec(col("m"))).as("__s2"))
      .select(col("n_tokens"), col("n_types"), col("v1"), col("v2"),
        // integral div, NOT decimal '/': Spark decimal division rounds
        // HALF_UP at the result scale while DuckDB // truncates
        expr("""(CAST(10000000000 AS DECIMAL(38,0)) *
                 (__s2 - CAST(n_tokens AS DECIMAL(38,0))))
                div (CAST(n_tokens AS DECIMAL(38,0)) *
                 CAST(n_tokens AS DECIMAL(38,0)))""").as("yule_k_q"),
        expr("(1000000L * v2) div n_types").as("sichel_s_q"),
        when(col("v1") < col("n_types"),
          floor(lit(1000000.0) * lit(100.0) *
            log(col("n_tokens").cast("double")) /
            (lit(1.0) - col("v1").cast("double") /
              col("n_types").cast("double"))).cast("long"))
          .as("honore_r_q"))
  }

  /** Weighted Jaccard similarity between every pair of source
    * vocabularies — Σ min(tf_a, tf_b) / Σ max(tf_a, tf_b) over the
    * term-frequency vectors — the corpus-overlap matrix that mixture
    * design reads before setting source weights (plain Jaccard
    * ignores mass; MinHash estimates it — this is the exact value at
    * source granularity, where exactness is affordable).
    *
    * Σmax never materializes: max = T_a + T_b − Σ min over SHARED
    * terms, so the only join is term-keyed over the sparse (source,
    * term) tf table — per-term fan-out is (#sources with the term)²,
    * bounded by the source count squared, never corpus-scale. The
    * full pair matrix (including zero-overlap pairs) comes from the
    * bounded totals cross-join. One exact integer division per pair.
    */
  def sourceWeightedJaccard(docs: DataFrame, groupCol: String,
                            textCol: String): DataFrame = {
    val tf = docs
      .select(col(groupCol).as("__g"),
        explode(TextFns.tokens(col(textCol))).as("__t"))
      .filter(length(col("__t")) > 0 && col("__g").isNotNull)
      .groupBy(col("__g"), col("__t")).agg(count(lit(1)).as("__tf"))
      .mat
    val tot = tf.groupBy(col("__g")).agg(sum(col("__tf")).as("__T"))
    val shared = tf.join(
        tf.select(col("__g").as("__g2"), col("__t"),
          col("__tf").as("__tf2")), Seq("__t"))
      .filter(col("__g") < col("__g2"))
      .groupBy(col("__g"), col("__g2"))
      .agg(sum(least(col("__tf"), col("__tf2"))).as("__min"))
    tot.select(col("__g").as("source_a"), col("__T").as("__ta"))
      .crossJoin(broadcast(tot.select(col("__g").as("source_b"),
        col("__T").as("__tb"))))
      .filter(col("source_a") < col("source_b"))
      .join(shared.select(col("__g").as("source_a"),
        col("__g2").as("source_b"), col("__min")),
        Seq("source_a", "source_b"), "left")
      .na.fill(0L, Seq("__min"))
      .select(col("source_a"), col("source_b"),
        col("__min").as("shared_mass"),
        (col("__ta") + col("__tb") - col("__min")).as("union_mass"))
      // dec38: 10⁶·shared_mass wraps int64 past ~9.2e12 shared tokens
      .withColumn("wjaccard_q",
        expr("(CAST(1000000 AS DECIMAL(38,0)) * shared_mass) div union_mass"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** Burrows' Delta stylometric distance between sources: over the
    * top-M corpus terms, z-score each source's relative frequency
    * across sources, then Delta(a,b) = mean |z_a − z_b| — the
    * classical authorship/register distance (function words dominate
    * the top-M, so it reads STYLE, not topic).
    *
    * Exactness discipline: relative frequencies quantize FIRST
    * (f_q = (10¹²·tf) div T_s, exact integer), so the cross-source
    * mean/variance are integer sums — partition order can't perturb
    * them — and each z is ONE fp chain on exact inputs:
    * z_q = ⌊10⁶·(S·f_q − Σf_q)/√(S·Σf_q² − (Σf_q)²)⌋ (constant terms
    * get z 0). Delta is then pure integer: Σ|z_a − z_b| div M.
    *
    * Plan: term agg → bounded top-M (tf desc, term asc) → the
    * sources×M grid (bounded both ways) for z → grid self-join on
    * term for the pair matrix. Corpus is scanned once.
    */
  def burrowsDelta(docs: DataFrame, groupCol: String, textCol: String,
                   topM: Int): DataFrame = {
    require(topM >= 1 && topM <= 500, s"topM ($topM) out of range")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val d = (c: Column) => c.cast("double")
    val tf = docs
      .select(col(groupCol).as("__g"),
        explode(TextFns.tokens(col(textCol))).as("__t"))
      .filter(length(col("__t")) > 0 && col("__g").isNotNull)
      .groupBy(col("__g"), col("__t")).agg(count(lit(1)).as("__tf"))
      .mat
    val top = tf.groupBy(col("__t")).agg(sum(col("__tf")).as("__ct"))
      .orderBy(col("__ct").desc, col("__t")).limit(topM)
      .select(col("__t"))
    // NB: resolution is case-insensitive — totals must not be named
    // __T or they collide with the term column __t
    val tot = tf.groupBy(col("__g")).agg(sum(col("__tf")).as("__gtot"))
    val grid = tot.crossJoin(broadcast(top))
      .join(tf, Seq("__g", "__t"), "left")
      .na.fill(0L, Seq("__tf"))
      .withColumn("__fq",
        // decimal numerator: 10¹²·tf overflows long past tf ~ 9·10⁶
        expr("(CAST(1000000000000 AS DECIMAL(38,0)) * __tf) div __gtot"))
      .mat
    val m = grid.groupBy(col("__t"))
      .agg(count(lit(1)).as("__S"), sum(dec(col("__fq"))).as("__sf"),
        sum(dec(col("__fq")) * dec(col("__fq"))).as("__sff"))
      .withColumn("__var2",
        (dec(col("__S")) * col("__sff") - col("__sf") * col("__sf"))
          .cast("decimal(38,0)"))
    val z = grid.join(broadcast(m), Seq("__t"))
      .select(col("__g"), col("__t"),
        when(col("__var2") > 0,
          floor(lit(1000000.0) *
            d(dec(col("__S")) * dec(col("__fq")) - col("__sf")) /
            sqrt(d(col("__var2")))).cast("long"))
          .otherwise(lit(0L)).as("__z"))
      .mat
    z.join(z.select(col("__g").as("__g2"), col("__t"),
        col("__z").as("__z2")), Seq("__t"))
      .filter(col("__g") < col("__g2"))
      .groupBy(col("__g").as("source_a"), col("__g2").as("source_b"))
      .agg(sum(abs(col("__z") - col("__z2"))).as("__sz"))
      .select(col("source_a"), col("source_b"),
        expr(s"__sz div ${topM}L").as("delta_q"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** Gries' DP (deviation of proportions) dispersion for the top-M
    * corpus terms — "is this term spread like the corpus, or does it
    * live in a few sources" (DP 0 = perfectly proportional, → 1 =
    * concentrated; the burstiness-across-shards signal a df count
    * misses because df ignores mass). With part sizes T_i (tokens)
    * and term mass TF_t:
    *
    *   DP_t = ½ Σ_i |tf_ti/TF_t − T_i/T|
    *        = (Σ_i |tf_ti·T − T_i·TF_t|) / (2·TF_t·T)
    *
    * — the common-denominator form is EXACT decimal(38,0) end to
    * end; one integral division to the 10⁶ grid. Absent (term,
    * part) cells contribute their full T_i·TF_t term via the bounded
    * top-M × parts grid. Plan: one corpus scan, bounded grid math.
    */
  def dispersionDP(docs: DataFrame, groupCol: String, textCol: String,
                   topM: Int): DataFrame = {
    require(topM >= 1 && topM <= 500, s"topM ($topM) out of range")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val tf = docs
      .select(col(groupCol).as("__g"),
        explode(TextFns.tokens(col(textCol))).as("__t"))
      .filter(length(col("__t")) > 0 && col("__g").isNotNull)
      .groupBy(col("__g"), col("__t")).agg(count(lit(1)).as("__tf"))
      .mat
    val termTot = tf.groupBy(col("__t")).agg(sum(col("__tf")).as("__ct"))
      .mat
    val top = termTot.orderBy(col("__ct").desc, col("__t")).limit(topM)
    val parts = tf.groupBy(col("__g")).agg(sum(col("__tf")).as("__ptot"))
    val corpus = parts.agg(sum(col("__ptot")).as("__ctot"))
    top.crossJoin(broadcast(parts)).crossJoin(broadcast(corpus))
      .join(tf, Seq("__g", "__t"), "left")
      .na.fill(0L, Seq("__tf"))
      .groupBy(col("__t").as("term"), col("__ct").as("tf_total"),
        col("__ctot").as("__ctot"))
      .agg(sum(abs(dec(col("__tf")) * dec(col("__ctot")) -
        dec(col("__ptot")) * dec(col("__ct")))).as("__num"))
      .select(col("term"), col("tf_total"),
        expr("""(CAST(1000000 AS DECIMAL(38,0)) * __num)
                div (CAST(2 AS DECIMAL(38,0)) * tf_total * __ctot)""")
          .as("dp_q"))
      .orderBy(col("term"))
  }

  /** Mean segmental type-token ratio (MSTTR): tokens are cut into
    * fixed-length chunks per document (partial tail chunks dropped —
    * the fixed denominator is what makes segments comparable), the
    * type count of each chunk is exact, and the per-group mean is ONE
    * integer division — Σ types / (chunkLen · #chunks) — so the
    * length-bias of the raw TTR (long docs always score lower) never
    * enters. Empty tokens are filtered BEFORE sequence numbering on
    * both engines, so chunk membership is identical.
    *
    * Plan: explode + per-doc window (keyed by doc — scales out), one
    * distinct-per-chunk agg, one bounded per-group agg.
    */
  def msttr(docs: DataFrame, groupCol: String, idCol: String,
            textCol: String, chunkLen: Int): DataFrame = {
    require(chunkLen >= 2, s"chunkLen ($chunkLen) must be >= 2")
    val toks = docs
      .select(col(groupCol), col(idCol),
        posexplode(TextFns.tokens(col(textCol))).as(Seq("__p", "__t")))
      .filter(length(col("__t")) > 0)
      .withColumn("__seq", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("__p"))))
      .withColumn("__nt", count(lit(1)).over(
        Window.partitionBy(col(idCol))))
      .withColumn("__chunk", expr(s"(__seq - 1) div $chunkLen"))
      .filter((col("__chunk") + 1) * chunkLen <= col("__nt"))
    toks.groupBy(col(groupCol), col(idCol), col("__chunk"))
      .agg(countDistinct(col("__t")).as("__types"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_chunks"), sum(col("__types")).as("__st"))
      .select(col(groupCol), col("n_chunks"),
        // dec38: 10⁶·Σtypes wraps int64 past ~9.2e12 chunked tokens
        expr(s"(CAST(1000000 AS DECIMAL(38,0)) * __st) div " +
          s"(${chunkLen}L * n_chunks)").as("msttr_q"))
  }

  /** Leakage-safe k-fold cross-validation plan: fold =
    * md5₆₀(normalized content) mod k — keyed on CONTENT, not row id,
    * so whitespace/case near-duplicate documents always land in the
    * same fold (the [[stratifiedSplit]] leakage guard, generalized
    * from one holdout to k rotations). Pure scan-stage projection,
    * zero shuffle; the assignment is a reproducible FUNCTION of the
    * text, so any re-run, engine, or partitioning derives the same
    * plan.
    *
    * @return (id, fold ∈ [0, k), is_val_fold0) ordered by id
    */
  def kFoldPlan(docs: DataFrame, idCol: String, textCol: String,
                k: Int): DataFrame = {
    require(k >= 2 && k <= 64, s"k ($k) must be in [2, 64]")
    val fold = Dedup.md5Hash60(
      graft.functions.TextFns.normalizeText(col(textCol))) % k
    docs.select(col(idCol), fold.cast("int").as("fold"))
      .withColumn("is_val_fold0", col("fold") === 0)
      .orderBy(col(idCol))
  }

  /** Luhn-validated payment-card-number audit: contiguous digit runs
    * of plausible PAN length (13–19) checked with the Luhn mod-10
    * checksum — the verification step that separates real card
    * numbers from phone numbers/ids and cuts the false-positive rate
    * of a bare digit-run regex by ~10× (the PCI-scrubbing pre-pass a
    * PII pipeline runs before redaction).
    *
    * Pure scan-stage: runs extract with one regexp pass; the checksum
    * is an integer fold over ≤19 bound lambda chars (no re-inline —
    * the run is a lambda variable). All-integer output.
    *
    * @return (id, n_digit_runs, n_luhn_valid) ordered by id
    */
  def luhnAudit(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // extract MAXIMAL digit runs, then length-filter: a bounded-width
    // regex ({13,19}) would carve the first 19 digits out of a longer
    // run and miscount it as a candidate
    val runs = expr(
      s"filter(regexp_extract_all(coalesce($textCol, ''), '[0-9]+', 0), " +
        "r -> length(r) >= 13 AND length(r) <= 19)")
    val valid = expr("""
      size(filter(__runs, r ->
        aggregate(sequence(1, length(r)), 0,
          (acc, i) -> acc + (CASE WHEN i % 2 = 1
            THEN ascii(substring(r, length(r) + 1 - i, 1)) - 48
            ELSE CASE WHEN (ascii(substring(r, length(r) + 1 - i, 1)) - 48) * 2 > 9
              THEN (ascii(substring(r, length(r) + 1 - i, 1)) - 48) * 2 - 9
              ELSE (ascii(substring(r, length(r) + 1 - i, 1)) - 48) * 2 END
            END)) % 10 = 0))""")
    docs.select(col(idCol), runs.as("__runs"))
      .select(col(idCol), size(col("__runs")).cast("long").as("n_digit_runs"),
        valid.cast("long").as("n_luhn_valid"))
      .orderBy(col(idCol))
  }

  /** High-entropy token audit — the truffleHog-style secret detector:
    * candidate tokens are base64/hex-shaped runs (≥ `minLen` chars of
    * [A-Za-z0-9+/=_-]); each candidate's per-character Shannon entropy
    * quantizes ⌊10⁹·(c/n)·ln(n/c)⌋ per distinct char (the standing
    * entropy kernel — exact integer ratios into ln) and sums as longs,
    * so the flag threshold is engine-exact. A 32-char hex API key
    * scores ≈ ln 16 ≈ 2.77·10⁹; "aaaa…" scores 0.
    *
    * Plan: explode candidates → explode chars → one (id, token, char)
    * hash agg → per-token entropy agg → per-doc rollup. Candidate
    * tokens are rare and bounded, so the char explode is tiny relative
    * to the corpus scan.
    *
    * Counting contract: the char aggregation groups by (id, token
    * VALUE, char), so repeated occurrences of the same candidate token
    * in one doc collapse into one row — `n_candidates`/`n_flagged`
    * count DISTINCT candidate token values per doc, not occurrences
    * (entropy is a function of the value, so per-occurrence rows would
    * add duplicate work for identical verdicts; a leaked key pasted
    * twice is one secret). The DuckDB oracle mirrors the same
    * distinct-value grouping.
    *
    * @return (id, n_candidates, n_flagged, max_entropy_q) ordered by
    *         id — only docs WITH candidates appear (inner shape;
    *         callers left-join back if they need zeros);
    *         n_candidates/n_flagged are distinct-value counts (above)
    */
  def secretTokenAudit(docs: DataFrame, idCol: String, textCol: String,
                       minLen: Int = 20,
                       flagEntropyQ: Long = 2500000000L): DataFrame = {
    require(minLen >= 8, s"minLen ($minLen) must be >= 8")
    val cand = docs
      .select(col(idCol), explode(split(coalesce(col(textCol), lit("")),
        "\\s+")).as("__tok"))
      .filter(col("__tok").rlike(s"^[A-Za-z0-9+/=_-]{$minLen,}$$"))
    // position-indexed char extraction (not split(t, '')) so both
    // engines enumerate IDENTICAL char multisets; candidates are ≤ ~50
    // ASCII chars so the per-position substring is trivial
    val chars = cand
      .select(col(idCol), col("__tok"),
        explode(expr(
          "transform(sequence(1, length(__tok)), i -> substring(__tok, i, 1))"))
          .as("__ch"))
      .groupBy(col(idCol), col("__tok"), col("__ch"))
      .agg(count(lit(1)).as("__c"))
    val perTok = chars
      .withColumn("__n", sum(col("__c"))
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy(col(idCol), col("__tok"))))
      .select(col(idCol), col("__tok"),
        floor(lit(1.0e9) * col("__c").cast("double") *
          log(col("__n").cast("double") / col("__c").cast("double")) /
          col("__n").cast("double")).cast("long").as("__e"))
      .groupBy(col(idCol), col("__tok"))
      .agg(sum(col("__e")).as("__h"))
    perTok.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_candidates"),
        sum(when(col("__h") >= flagEntropyQ, 1L).otherwise(0L))
          .as("n_flagged"),
        max(col("__h")).as("max_entropy_q"))
      .orderBy(col(idCol))
  }

  /** Frequency-ranked vocabulary id map — the tokenizer-adjacent
    * artifact every training pipeline materializes once: the top
    * `vocabSize` corpus terms by (frequency desc, term asc) with their
    * contiguous 1-based ids (rank order = id order, so embedding
    * tables and frequency-bucketed dropout read straight off it).
    *
    * Plan: explode → one map-side-combined term count → TakeOrdered
    * top-N → a window over N rows only (the zipfSlope shape).
    *
    * @return (vocab_id, term, freq) ordered by vocab_id
    */
  def vocabIdMap(docs: DataFrame, textCol: String,
                 vocabSize: Int): DataFrame = {
    require(vocabSize > 0 && vocabSize <= 1000000,
      s"vocabSize ($vocabSize) must be in [1, 1000000]")
    val counts = docs
      .select(explode(TextFns.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("term")).agg(count(lit(1)).as("freq"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("freq").desc, col("term").asc)
    counts.orderBy(col("freq").desc, col("term").asc).limit(vocabSize)
      .withColumn("vocab_id", row_number().over(w).cast("long"))
      .select(col("vocab_id"), col("term"), col("freq"))
      .orderBy(col("vocab_id"))
  }
}
