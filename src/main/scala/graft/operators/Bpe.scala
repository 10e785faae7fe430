package graft.operators

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
      top.map { case (w, f) => (w.map(_.toString).toArray, f) }
    val merges = Vector.newBuilder[Merge]
    var rank = 0
    while (rank < numMerges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, f) <- words; i <- 0 until syms.length - 1)
        counts.updateWith((syms(i), syms(i + 1)))(c => Some(c.getOrElse(0L) + f))
      if (counts.isEmpty) rank = numMerges // every word fully merged: stop
      else {
        val ((l, r), _) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        merges += Merge(rank, l, r)
        words = words.map { case (syms, f) => (applyMerge(syms, l, r), f) }
        rank += 1
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
    var syms = word.map(_.toString).toIndexedSeq
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
}
