package graft.operators

import graft.operators.Mat._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Lexical ranked retrieval over the corpus — the "find the docs most
  * like this query" primitive a curation pipeline uses for
  * similarity-to-benchmark filtering, decontamination triage, and
  * retrieval-augmented data selection. Sparse complement to the dense
  * ANN top-k family in [[Similarity]].
  */
object Retrieval {

  /** BM25 top-k: for each query doc, the `k` highest-scoring corpus
    * docs (self-matches excluded). Robertson/Sparck-Jones BM25 with the
    * standard (k1, b) saturation; `maxTermDf` drops stop terms from the
    * match set (the same fan-out cap as sparseCosinePairs — a term
    * matching every doc would join every query to the whole corpus).
    *
    * ORACLE-GRADE determinism: the per-(query, doc) score is
    * `Σ floor(10⁶ · idf · sat)` summed as LONGS, divided once by 10⁶ at
    * the end — float addition order never matters (the quantized
    * contract of centroidOutliers / kmeansAssign). Ranking compares the
    * quantized long (ties by ascending doc id), so rank order is
    * integer-exact. Every factor inside the quantize is a literal-
    * identical IEEE expression on both engines: dl/avgdl exact
    * divisions, decimal literals (1.2, 0.75) parse to the same doubles,
    * and ln's engine ulp risk is confined to a 10⁻¹⁰-probability floor
    * boundary per distinct (tf, df, dl) triple — the q83 precedent.
    *
    * Plan shape: corpus tf/dl are one explode + hash aggregate; the
    * query side (small by contract — a benchmark, a probe set) joins
    * the capped term table, then one map-side-combined hash aggregate
    * to (query, doc, score_q) and a per-query top-k window. The window
    * partitions by query over rows already bounded by maxTermDf·|query
    * terms| — never the corpus. At 100 TB: corpus side scans once,
    * shuffles (term, doc, tf) triples only.
    */
  def bm25TopK(queries: DataFrame, corpus: DataFrame, idCol: String,
               textCol: String, k: Int, k1: Double = 1.2, b: Double = 0.75,
               maxTermDf: Int = Int.MaxValue,
               docCount: Option[Long] = None): DataFrame = {
    require(k > 0, s"k ($k) must be positive")
    require(maxTermDf > 0, s"maxTermDf ($maxTermDf) must be positive")
    val terms = corpus
      .select(col(idCol).as("doc_id_"),
        explode(TextFns.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
    // snapshot: tf feeds df, dl, and the match join (q80 contract)
    val tf = terms.groupBy(col("doc_id_"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .mat
    val dl = tf.groupBy(col("doc_id_")).agg(sum(col("tf")).as("dl"))
    val n = docCount.getOrElse(corpus.count())
    // avgdl as ONE exact division of exact longs; broadcast scalar
    val avg = dl.agg((sum(col("dl")).cast("double") /
      count(lit(1)).cast("double")).as("avgdl"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxTermDf)
    val qterms = queries
      .select(col(idCol).as("query_id"),
        explode(TextFns.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .distinct() // BM25 query terms are a set; repeated terms score once
    // cap + query-term filter BEFORE touching the corpus tf table: the
    // broadcast (query term × df) side prunes stop terms at the join,
    // so a df > cap term never fans out
    val matched = tf
      .join(broadcast(qterms.join(dfreq, Seq("term"))), Seq("term"))
      .join(dl, Seq("doc_id_"))
      .crossJoin(broadcast(avg))
      .filter(col("query_id") =!= col("doc_id_"))
    val idf = log(lit(1.0) +
      (lit(n).cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)))
    val sat = (col("tf").cast("double") * (lit(k1) + lit(1.0))) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") / col("avgdl")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_q").desc, col("doc_id_").asc)
    matched
      .withColumn("__c", floor(lit(1000000.0) * (idf * sat)).cast("long"))
      .groupBy(col("query_id"), col("doc_id_"))
      .agg(sum(col("__c")).as("score_q"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id_").as("doc_id"),
        (col("score_q").cast("double") / lit(1000000.0)).as("score"))
  }

  /** Reciprocal-rank fusion of N ranked retrieval arms (the standard
    * hybrid-retrieval combiner: lexical BM25 + dense ANN, fused without
    * score calibration). Each arm is a `(query_id, doc_id, rank)` frame
    * — typically the output of [[bm25TopK]] and
    * [[Similarity.cosineTopK]]/`ivfTopK` with columns renamed; a doc's
    * fused score is Σ_arms 1/(k0 + rank), zero contribution from arms
    * that didn't rank it.
    *
    * ORACLE-GRADE determinism: each arm contribution is the INTEGER
    * division `10⁹ div (k0 + rank)` summed as longs — no float
    * addition anywhere; ranking compares the long (ties by ascending
    * doc id) and the emitted score is one final double division.
    *
    * Plan shape: a union of already-top-k-capped arms (≤ Σ armsᵢ·kᵢ
    * rows per query by construction), one map-side-combined hash
    * aggregate to (query, doc), and a per-query window over ≤ arms·k
    * rows — the window input is bounded by the upstream caps, never by
    * the corpus, so the 10⁹-row partitionBy failure mode can't occur.
    * At 100 TB the cost lives entirely in the arms; fusion is free.
    */
  def rrfFuse(arms: Seq[DataFrame], k: Int, k0: Int = 60): DataFrame = {
    require(arms.nonEmpty, "rrfFuse needs at least one ranked arm")
    require(k > 0, s"k ($k) must be positive")
    require(k0 >= 0, s"k0 ($k0) must be non-negative")
    val unioned = arms
      .map(_.select(col("query_id"), col("doc_id"), col("rank")))
      .reduce(_.unionByName(_))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_q").desc, col("doc_id").asc)
    unioned
      .withColumn("__c", expr(s"1000000000 div ($k0 + rank)"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("__c")).as("rrf_q"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        (col("rrf_q").cast("double") / lit(1000000000.0)).as("rrf_score"))
  }

  /** Recall@k of an approximate ranked result against the exact one —
    * the audit every ANN deployment runs before trading recall for
    * cost (IVF nprobe tuning, LSH plane count, PQ code size). Both
    * inputs are `(query_id, rank, neighbor_id)` frames; output is one
    * row per exact-side query: hits, the exact-neighbor count actually
    * present (≤ k when the corpus is small), and recall = hits/that.
    *
    * Plan shape: both sides pre-filtered to rank ≤ k (≤ k rows per
    * query each), one equi-join on (query, neighbor), one hash
    * aggregate — bounded by |queries|·k throughout.
    */
  def recallAtK(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k ($k) must be positive")
    val e = exact.filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"))
    val a = approx.filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("__hit"))
    e.join(a, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(sum(coalesce(col("__hit"), lit(0L))).as("n_hits"),
        count(lit(1)).as("n_exact"))
      .withColumn("recall",
        col("n_hits").cast("double") / col("n_exact").cast("double"))
  }

  /** Dirichlet-smoothed query-likelihood top-k (Zhai & Lafferty 2001)
    * — the language-model complement to [[bm25TopK]]. Scored in the
    * sparse rank-equivalent form
    *
    *   score(q,d) = Σ_{t ∈ q∩d} ln(1 + tf·|C| / (μ·cf_t))
    *              + n_q · ln(μ / (dl + μ))
    *
    * where cf_t is t's collection frequency, |C| the corpus token
    * count, and n_q the count of distinct query terms present in the
    * corpus vocabulary (OOV terms contribute nothing under the
    * collection LM, so they are excluded from n_q too — documented
    * choice, keeps the score computable from the match set alone).
    * Only documents matching ≥ 1 query term are ranked, the standard
    * inverted-index semantics.
    *
    * ORACLE-GRADE determinism, the bm25TopK contract: each matched
    * term contributes ⌊10⁶·ln(1 + tf·|C|/(μ·cf))⌋ summed as LONGS;
    * the doc-length term adds n_q·⌊10⁶·ln(μ/(dl+μ))⌋ once; ranking
    * compares the long with ascending-id ties. Every double inside a
    * ⌊·⌋ is a literal-identical IEEE expression of exact longs.
    *
    * Plan shape: identical to bm25TopK — corpus tf/dl/cf are one
    * explode + hash aggregates; the query side broadcasts with the
    * df cap applied BEFORE touching the corpus tf table; one
    * map-side-combined aggregate to (query, doc) and a per-query
    * window bounded by maxTermDf·|query terms|.
    */
  def qlTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
             textCol: String, k: Int, mu: Double = 2000.0,
             maxTermDf: Int = Int.MaxValue): DataFrame = {
    require(k > 0, s"k ($k) must be positive")
    require(mu > 0, s"mu ($mu) must be positive")
    require(maxTermDf > 0, s"maxTermDf ($maxTermDf) must be positive")
    val terms = corpus
      .select(col(idCol).as("doc_id_"),
        explode(TextFns.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
    // snapshot: tf feeds cf, df, dl, and the match join (q80 contract)
    val tf = terms.groupBy(col("doc_id_"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .mat
    val dl = tf.groupBy(col("doc_id_")).agg(sum(col("tf")).as("dl"))
    val ctot = dl.agg(sum(col("dl")).as("c_tot"))
    val vocab = tf.groupBy(col("term"))
      .agg(sum(col("tf")).as("cf"), count(lit(1)).as("df"))
      .filter(col("df") <= maxTermDf)
    val qterms = queries
      .select(col(idCol).as("query_id"),
        explode(TextFns.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .distinct() // QL query terms as a set (bm25TopK convention)
    val qv = qterms.join(vocab, Seq("term"))
    val nq = qv.groupBy(col("query_id")).agg(count(lit(1)).as("n_q"))
    val matched = tf
      .join(broadcast(qv), Seq("term"))
      .crossJoin(broadcast(ctot))
      .filter(col("query_id") =!= col("doc_id_"))
    val termC = log(lit(1.0) +
      col("tf").cast("double") * col("c_tot").cast("double") /
        (lit(mu) * col("cf").cast("double")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_q").desc, col("doc_id_").asc)
    matched
      .withColumn("__c", floor(lit(1000000.0) * termC).cast("long"))
      .groupBy(col("query_id"), col("doc_id_"))
      .agg(sum(col("__c")).as("match_q"))
      .join(dl, Seq("doc_id_"))
      .join(broadcast(nq), Seq("query_id"))
      .withColumn("score_q", col("match_q") + col("n_q") *
        floor(lit(1000000.0) *
          log(lit(mu) / (col("dl").cast("double") + lit(mu)))).cast("long"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id_").as("doc_id"),
        (col("score_q").cast("double") / lit(1000000.0)).as("score"))
  }

  /** RM3-style pseudo-relevance-feedback expansion (Lavrenko & Croft
    * 2001): run first-pass [[bm25TopK]] retrieval, treat each query's
    * top `fbDocs` results as pseudo-relevant, and estimate a relevance
    * model over their vocabulary —
    *
    *   P(w | R_q) ∝ Σ_{d ∈ fb(q)} tf(w,d) / dl(d)
    *
    * (uniform feedback-doc weights — the calibration-free variant; the
    * QL-weighted one needs exp() of log scores, an fp hazard the
    * uniform model avoids entirely). The top `fbTerms` terms per query
    * (original query terms included, as RM1 defines) are the expanded
    * query a second-pass retrieval or a data-selection filter consumes.
    *
    * ORACLE-GRADE determinism: each feedback doc contributes the exact
    * integer (10¹²·tf) div dl per term, summed as longs; term ranking
    * compares the long with ascending-term ties. No fp anywhere in the
    * expansion itself (the first pass is bm25TopK's quantized-long
    * contract).
    *
    * Plan shape: first pass = bm25TopK (one corpus explode); second
    * pass re-derives tf ONLY for the ≤ |queries|·fbDocs feedback docs —
    * the broadcast semi-join on doc ids prunes before the explode, so
    * the second corpus scan ships no text beyond the feedback set.
    * Term ranking windows over ≤ fb-doc vocabulary per query, never
    * the corpus.
    */
  def rm3Expansion(queries: DataFrame, corpus: DataFrame, idCol: String,
                   textCol: String, fbDocs: Int, fbTerms: Int,
                   maxTermDf: Int = Int.MaxValue): DataFrame = {
    require(fbDocs > 0, s"fbDocs ($fbDocs) must be positive")
    require(fbTerms > 0, s"fbTerms ($fbTerms) must be positive")
    // fb anchors two references (the distinct id set and the final
    // weight join) and its upstream is the whole BM25 pipeline —
    // materialize it so BM25 runs once (guide §2.4; bounded:
    // |queries|·fbDocs rows). fbTf also has two consumers (fbDl + the
    // join) but its duplicated subtrees are byte-identical, so AQE's
    // runtime stage reuse already deduplicates them — left
    // unmaterialized (and visible to the plan-shape spec).
    val fb = bm25TopK(queries, corpus, idCol, textCol, k = fbDocs,
        maxTermDf = maxTermDf)
      .select(col("query_id"), col("doc_id"))
      .mat
    val fbIds = fb.select(col("doc_id")).distinct()
    val fbTf = corpus
      .join(broadcast(fbIds), corpus(idCol) === fbIds("doc_id"), "left_semi")
      .select(col(idCol).as("doc_id"),
        explode(TextFns.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val fbDl = fbTf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rm_weight_q").desc, col("term").asc)
    fb.join(fbTf, Seq("doc_id"))
      .join(broadcast(fbDl), Seq("doc_id"))
      // dec38: 10¹²·tf wraps int64 for a term repeated >9.2e6 times in
      // one (pathologically concatenated) document
      .withColumn("__c",
        expr("(CAST(1000000000000 AS DECIMAL(38,0)) * tf) div dl"))
      .groupBy(col("query_id"), col("term"))
      .agg(sum(col("__c")).as("rm_weight_q"))
      .withColumn("term_rank", row_number().over(w))
      .filter(col("term_rank") <= fbTerms)
      .select(col("query_id"), col("term_rank"), col("term"),
        col("rm_weight_q"))
  }
}
