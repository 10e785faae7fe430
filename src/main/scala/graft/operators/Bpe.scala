package graft.operators

import graft.operators.Mat._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Byte-pair-encoding tokenizer training and application (Sennrich et
  * al. 2016, "Neural Machine Translation of Rare Words with Subword
  * Units") — the "fit a tokenizer on YOUR corpus" step of a training
  * pipeline. The architecture is the one every production trainer
  * (SentencePiece, the GPT-2 reference code) uses:
  *
  *  1. [[wordFrequencies]] — DISTRIBUTED: one explode + map-side-
  *     combined count over the corpus. This is the only part that
  *     touches 100 TB; its output is the Zipf-bounded distinct-word
  *     table.
  *  2. [[train]] — DRIVER-SIDE on the aggregated table, capped at
  *     `maxVocabRows` most-frequent words (collect of a bounded top-k,
  *     NOT of the corpus). The merge loop is inherently sequential —
  *     each merge changes the pair statistics the next one ranks on —
  *     and the word-frequency table it needs is millions of rows where
  *     the corpus is trillions. Fully deterministic: exact integer
  *     counts, ties broken by (count desc, left asc, right asc).
  *     [[trainDistributed]] is the same loop with the per-merge pair
  *     COUNT as a Spark aggregate over the symbol-array word table —
  *     for corpora whose distinct-word table exceeds driver memory.
  *     The sequential part that remains on the driver is only the
  *     argmax + the merge decision (one ~16-byte row per merge); the
  *     two paths emit byte-identical merge sequences (BpeSpec pins it).
  *  3. [[encode]] / [[tokenCount]] — DISTRIBUTED again: the learned
  *     merge ranks broadcast as a plan literal; application is
  *     row-local (a per-word loop bounded by word length — a Scala
  *     function, as with every real tokenizer, where a fixed-point
  *     merge loop has no SQL-expression form).
  */
object Bpe {

  /** Distinct words with corpus frequencies: (word, freq). */
  def wordFrequencies(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFns.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** One learned merge: rank 0 is applied first. */
  final case class Merge(rank: Int, left: String, right: String)

  /** Code-point string order (== UTF-8 binary order, which is what
    * Spark's UTF8String comparison gives the distributed path's
    * TakeOrdered). Plain Java String ordering compares UTF-16 units, so
    * it ranks U+E000..U+FFFF above supplementary characters — the two
    * tie-breaks would diverge on non-BMP symbols with tying counts.
    */
  private val cpOrdering: Ordering[String] = new Ordering[String] {
    def compare(a: String, b: String): Int = {
      var i = 0; var j = 0
      while (i < a.length && j < b.length) {
        val ca = a.codePointAt(i); val cb = b.codePointAt(j)
        if (ca != cb) return Integer.compare(ca, cb)
        i += Character.charCount(ca); j += Character.charCount(cb)
      }
      Integer.compare(a.length - i, b.length - j)
    }
  }

  /** Split into Unicode code points (NOT UTF-16 units: `"🙂".map(...)`
    * would shear a non-BMP character into two lone surrogate halves,
    * making learned symbols invalid strings on multilingual corpora).
    */
  private[operators] def codePoints(word: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** Learn `numMerges` merges from a word-frequency table. The table is
    * truncated to the `maxVocabRows` most frequent words (deterministic
    * tie-break on the word) before the driver-side loop — cap it to
    * what one driver can hold; the tail of a Zipf distribution
    * contributes negligible pair mass.
    */
  def train(wordFreqs: DataFrame, numMerges: Int,
            maxVocabRows: Int = 1000000): Seq[Merge] = {
    require(numMerges > 0, s"numMerges ($numMerges) must be positive")
    require(maxVocabRows > 0, s"maxVocabRows ($maxVocabRows) must be positive")
    val top = wordFreqs
      .orderBy(col("freq").desc, col("word").asc)
      .limit(maxVocabRows)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // words as symbol arrays; the loop mutates these in place
    var words: Array[(Array[String], Long)] =
      top.map { case (w, f) => (codePoints(w), f) }
    val merges = Vector.newBuilder[Merge]
    var rank = 0
    while (rank < numMerges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, f) <- words; i <- 0 until syms.length - 1)
        counts.updateWith((syms(i), syms(i + 1)))(c => Some(c.getOrElse(0L) + f))
      if (counts.isEmpty) rank = numMerges // every word fully merged: stop
      else {
        val ((l, r), _) = counts.min(
          Ordering.by[((String, String), Long), (Long, String, String)] {
            case ((a, b), c) => (-c, a, b)
          }(Ordering.Tuple3(Ordering.Long, cpOrdering, cpOrdering)))
        merges += Merge(rank, l, r)
        words = words.map { case (syms, f) => (applyMerge(syms, l, r), f) }
        rank += 1
      }
    }
    merges.result()
  }

  /** The safe batch from one round's sorted pair table: the maximal
    * PREFIX (no skipping — a skipped conflicting pair could still be
    * the true next argmax after its count decays) of candidates that
    * are pairwise symbol-disjoint, where "symbols" of an accepted
    * merge include its concatenation (a later candidate touching l,
    * r, OR l+r could gain/lose occurrences from the earlier merge).
    * The prefix is then truncated to counts STRICTLY above the stop
    * candidate's count: every pair sharing a symbol with an accepted
    * merge sorts at/after the stop point (else it would have stopped
    * the prefix earlier), so the new pairs an accepted merge creates
    * are count-bounded by c_stop — strict truncation means nothing the
    * batch couldn't see can tie or beat any accepted merge, making the
    * batch byte-identical to running the sequential argmax m times
    * (BpeSpec pins this against [[train]], ties and overlaps included).
    *
    * `candidates` must be the round's pairs sorted by (count desc,
    * left asc, right asc); `sawWholeTable` = the collect was NOT
    * truncated at K (then no hidden conflict exists below the last
    * row and an all-disjoint prefix may keep even its last count).
    */
  private[graft] def safeBatch(candidates: Array[(String, String, Long)],
                                   sawWholeTable: Boolean): Seq[(String, String)] = {
    val accepted = Vector.newBuilder[(String, String, Long)]
    var used = Set.empty[String]
    var stopCount = -1L
    var stopped = false
    var i = 0
    while (i < candidates.length && !stopped) {
      val (l, r, c) = candidates(i)
      if (used(l) || used(r) || used.contains(l + r)) {
        stopCount = c; stopped = true
      } else {
        accepted += ((l, r, c))
        used = used + l + r + (l + r)
        i += 1
      }
    }
    // unseen tail of a truncated collect could conflict: bound by the
    // last visible count unless we saw the whole table
    if (!stopped && !sawWholeTable && candidates.nonEmpty)
      stopCount = candidates.last._3
    val all = accepted.result()
    val safe =
      if (stopCount < 0) all // whole table was disjoint — all safe
      else all.filter(_._3 > stopCount)
    // always make progress: the head alone is the plain sequential argmax
    val batch = if (safe.isEmpty) all.take(1) else safe
    batch.map { case (l, r, _) => (l, r) }
  }

  /** The greedy disjoint batch: walk the sorted candidates, SKIP any
    * that touches a symbol (or concatenation) an earlier accepted one
    * touches, accept the rest. Rounds drop ~|batch|× but the merge
    * sequence may differ from sequential BPE: a skipped pair would
    * sometimes have been the sequential argmax after its count decayed,
    * and pairs created by earlier batch members are not visible until
    * the next round. The divergence is bounded in rank, not content —
    * every accepted pair was within the top `batchK` of its round
    * (ScaleProbe measures the realized merge-set overlap vs
    * sequential: 0.848 over a 1000-merge train on the 100k-word probe
    * vocab at batchK=64, with 6.5× fewer driver round-trips and 7.8×
    * lower wall-clock).
    */
  private[graft] def greedyBatch(candidates: Array[(String, String, Long)],
                                 maxAccept: Int): Seq[(String, String)] = {
    val accepted = Vector.newBuilder[(String, String)]
    var used = Set.empty[String]
    var n = 0
    var i = 0
    while (i < candidates.length && n < maxAccept) {
      val (l, r, _) = candidates(i)
      if (!used(l) && !used(r) && !used.contains(l + r)) {
        accepted += ((l, r))
        used = used + l + r + (l + r)
        n += 1
      }
      i += 1
    }
    accepted.result()
  }

  /** [[train]] with the per-merge pair count as a DISTRIBUTED
    * aggregate, for word tables too large to collect: the symbol-array
    * word table stays a DataFrame; each round runs
    * explode(adjacent pairs) → map-side-combined `sum(freq)` →
    * `TakeOrdered(batchK)` (count desc, left asc, right asc — the same
    * exact integer tie-break as the driver loop), accepts a batch of
    * merges, and rewrites the words once per round with the whole
    * batch. Per-round cost is one linear scan of the distinct-word
    * table; `localCheckpoint` every `checkpointEvery` rounds cuts the
    * plan lineage so round N doesn't replan N UDF layers.
    *
    * `exact = true` (default) accepts only the provably
    * order-preserving prefix ([[safeBatch]]) — byte-identical output
    * to the sequential loop, but real vocabularies' top pairs share
    * symbols, so batches collapse to ~1 and round-trips stay
    * ~numMerges. `exact = false` accepts the greedy disjoint set
    * ([[greedyBatch]]) — ~batchK merges per round, the difference
    * between 32k driver round-trips and ~hundreds for a production
    * vocabulary, at the cost of a documented local reordering of the
    * merge sequence.
    *
    * Use [[train]] when the top-`maxVocabRows` truncation is acceptable
    * (it collects one bounded top-k and runs zero jobs per merge);
    * use this when vocabulary must not be driver-bounded.
    */
  def trainDistributed(wordFreqs: DataFrame, numMerges: Int,
                       checkpointEvery: Int = 8, batchK: Int = 64,
                       exact: Boolean = true): Seq[Merge] = {
    require(numMerges > 0, s"numMerges ($numMerges) must be positive")
    require(checkpointEvery > 0, s"checkpointEvery ($checkpointEvery) must be positive")
    require(batchK > 0, s"batchK ($batchK) must be positive")
    val seed = udf((w: String) => codePoints(w).toSeq)
    var cur = wordFreqs
      .select(seed(col("word")).as("syms"), col("freq").cast("long").as("freq"))
      .mat
    val merges = Vector.newBuilder[Merge]
    var rank = 0
    var round = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val top = cur
        .select(col("freq"), explode(
          when(size(col("syms")) >= 2,
            transform(sequence(lit(1), size(col("syms")) - 1), i =>
              struct(element_at(col("syms"), i).as("l"),
                element_at(col("syms"), i + 1).as("r"))))
            .otherwise(array().cast("array<struct<l:string,r:string>>")))
          .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("c"))
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(batchK).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (top.isEmpty) exhausted = true // every word fully merged
      else {
        val batch = (if (exact) safeBatch(top, sawWholeTable = top.length < batchK)
                     else greedyBatch(top, numMerges - rank))
          .take(numMerges - rank)
        batch.foreach { case (l, r) => merges += Merge(rank, l, r); rank += 1 }
        val applyAll = udf { (syms: Seq[String]) =>
          var out = syms.toArray
          batch.foreach { case (l, r) => out = applyMerge(out, l, r) }
          out.toSeq
        }
        cur = cur.withColumn("syms", applyAll(col("syms")))
        round += 1
        if (round % checkpointEvery == 0) cur = cur.mat
      }
    }
    merges.result()
  }

  /** One left-to-right merge pass (the BPE convention: after merging at
    * i, scanning resumes at i+1, so "aaa" + merge(a,a) → ["aa","a"]).
    */
  private def applyMerge(syms: Array[String], l: String, r: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
        out += l + r; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Tokenize one word with a rank map: start from characters, always
    * apply the LOWEST-rank applicable merge (the BPE application rule —
    * merge priority order, not left-to-right greedy). Row-local; loop
    * count ≤ word length.
    */
  private[graft] def encodeWord(word: String,
                                ranks: Map[(String, String), Int]): Seq[String] = {
    var syms = codePoints(word).toIndexedSeq
    var done = false
    while (!done && syms.length > 1) {
      var best = Int.MaxValue; var at = -1
      var i = 0
      while (i < syms.length - 1) {
        val rk = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (rk < best) { best = rk; at = i }
        i += 1
      }
      if (at < 0) done = true
      else syms = (syms.take(at) :+ (syms(at) + syms(at + 1))) ++ syms.drop(at + 2)
    }
    syms
  }

  /** docs + `bpe_tokens` (array of subword strings). The merge table
    * broadcasts with the closure — a `Seq[Merge]` is a few MB at GPT-2
    * vocab scale. A UDF is the honest tool here: every real tokenizer
    * is a row-local native loop, and a fixed-point merge has no
    * Catalyst-expression form.
    */
  def encode(docs: DataFrame, textCol: String, merges: Seq[Merge]): DataFrame = {
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
    val enc = udf((ws: Seq[String]) =>
      if (ws == null) null else ws.filter(_.nonEmpty).flatMap(encodeWord(_, ranks)))
    docs.withColumn("bpe_tokens", enc(TextFns.tokens(col(textCol))))
  }

  /** docs + whitespace `n_words` + learned-vocab `n_bpe_tokens` — the
    * "how many tokens is my corpus under this tokenizer" budget number.
    */
  def tokenCount(docs: DataFrame, textCol: String, merges: Seq[Merge]): DataFrame =
    encode(docs, textCol, merges)
      .withColumn("n_words",
        when(col(textCol).isNull, lit(0))
          .otherwise(size(filter(TextFns.tokens(col(textCol)), w => length(w) > 0))))
      .withColumn("n_bpe_tokens",
        when(col("bpe_tokens").isNull, lit(0)).otherwise(size(col("bpe_tokens"))))
      .drop("bpe_tokens")

  /** Per-source tokenizer fertility (subword tokens per word) — the
    * "which sources does this tokenizer serve badly" audit every
    * multilingual/multi-domain pipeline runs after fitting a
    * tokenizer: a source whose fertility is far above the corpus mean
    * pays disproportionate sequence length for the same text, which
    * skews both the token budget ([[Packing]]) and training mixture
    * weights. One scan ([[tokenCount]]'s encode) + one hash aggregate
    * on source; the fertility division is two exact longs → DOUBLE,
    * bit-identical cross-engine.
    */
  def fertilityBySource(docs: DataFrame, textCol: String, srcCol: String,
                        merges: Seq[Merge]): DataFrame =
    tokenCount(docs, textCol, merges)
      .groupBy(col(srcCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words").cast("long")).as("n_words"),
        sum(col("n_bpe_tokens").cast("long")).as("n_bpe_tokens"))
      .withColumn("fertility",
        when(col("n_words") > 0,
          col("n_bpe_tokens").cast("double") / col("n_words").cast("double")))
}
