package graft

import graft.operators.Bpe
import graft.operators.Bpe.Merge

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("train: hand-computed merge sequence with deterministic tie-break") {
    val docs = Seq((1L, "low low lower lowest")).toDF("doc_id", "text")
    val wf = Bpe.wordFrequencies(docs, "text")
    assert(wf.as[(String, Long)].collect().toSet ===
      Set(("low", 2L), ("lower", 1L), ("lowest", 1L)))
    // pair counts: (l,o)=4 (o,w)=4 (w,e)=2 (e,r)=1 (e,s)=1 (s,t)=1
    // rank 0: tie (l,o) vs (o,w) at 4 → lexicographic left wins: (l,o)
    // rank 1: (lo,w)=4; rank 2: (low,e)=2
    val merges = Bpe.train(wf, numMerges = 3)
    assert(merges === Seq(Merge(0, "l", "o"), Merge(1, "lo", "w"), Merge(2, "low", "e")))
  }

  test("train: stops early when every word is fully merged") {
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val merges = Bpe.train(Bpe.wordFrequencies(docs, "text"), numMerges = 10)
    assert(merges === Seq(Merge(0, "a", "b")))
    intercept[IllegalArgumentException] {
      Bpe.train(Bpe.wordFrequencies(docs, "text"), numMerges = 0)
    }
  }

  test("trainDistributed emits the byte-identical merge sequence") {
    // same fixtures as the driver-path tests, plus a tie-heavy corpus
    // (every pair count equal) so the (count desc, left, right)
    // tie-break — TakeOrdered on the distributed side, cpOrdering on
    // the driver side — is actually exercised
    val corpora = Seq(
      Seq("low low lower lowest"),
      Seq("ab ab"),
      Seq("ab cd ef gh", "ab cd ef gh"),                 // all-tie
      Seq("peer router collector rib rib attr announce withdraw")
    )
    for (texts <- corpora) {
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val wf = Bpe.wordFrequencies(docs, "text")
      val a = Bpe.train(wf, numMerges = 12)
      val b = Bpe.trainDistributed(wf, numMerges = 12, checkpointEvery = 3)
      assert(a === b, s"paths diverged on corpus $texts")
    }
  }

  test("safeBatch: conflicting candidate stops the prefix; ties truncate") {
    // (a,b)=10 then (b,c)=8 conflicts on 'b' → batch = [(a,b)] (10 > 8)
    assert(Bpe.safeBatch(Array(("a","b",10L), ("b","c",8L)), true)
      === Seq(("a","b")))
    // disjoint but TIED with the stop candidate → strict truncation
    // drops it, head survives as the fallback
    assert(Bpe.safeBatch(Array(("a","b",10L), ("c","d",8L), ("b","x",8L)), true)
      === Seq(("a","b")))
    // concat collision: (x, ab) touches the symbol (a,b) creates
    assert(Bpe.safeBatch(Array(("a","b",10L), ("x","ab",6L)), true)
      === Seq(("a","b")))
    // fully disjoint whole table → everything accepted
    assert(Bpe.safeBatch(Array(("a","b",10L), ("c","d",8L), ("e","f",8L)), true)
      === Seq(("a","b"), ("c","d"), ("e","f")))
    // truncated collect: last visible count bounds the unseen tail
    assert(Bpe.safeBatch(Array(("a","b",10L), ("c","d",8L)), false)
      === Seq(("a","b")))
  }

  test("greedyBatch skips conflicts and keeps accepting; exact=false still learns") {
    // unlike safeBatch, a conflict is skipped, not a stop
    assert(Bpe.greedyBatch(Array(("a","b",10L), ("b","c",8L), ("d","e",6L)), 10)
      === Seq(("a","b"), ("d","e")))
    assert(Bpe.greedyBatch(Array(("a","b",10L), ("x","ab",6L), ("c","d",5L)), 10)
      === Seq(("a","b"), ("c","d")))
    assert(Bpe.greedyBatch(Array(("a","b",10L), ("c","d",8L)), 1)
      === Seq(("a","b")))
    // end-to-end: greedy mode learns numMerges well-formed merges and
    // its tokenizer still compresses. (Merge-SET closeness to
    // sequential is a LARGE-vocab property — on a toy corpus greedy
    // grabs breadth where sequential builds chains, so overlap is
    // meaningless here; ScaleProbe's bpe section measures it at 100k
    // vocab: 0.848 at batchK=64.)
    val docs = Seq((1L, "low low lower lowest new newer newest wide wider")).toDF("doc_id", "text")
    val wf = Bpe.wordFrequencies(docs, "text")
    val greedyM = Bpe.trainDistributed(wf, numMerges = 8, exact = false)
    assert(greedyM.size === 8)
    assert(greedyM.map(_.rank) === (0 until 8))
    // every learned merge joins symbols that existed when it was ranked
    val counts = Bpe.tokenCount(docs, "text", greedyM)
      .select("n_words", "n_bpe_tokens").as[(Int, Int)].collect()(0)
    assert(counts._2 < counts._1 * 5, "greedy tokenizer failed to compress")
  }

  test("batched trainDistributed equals sequential train on random tie-heavy corpora") {
    // small alphabet + short words + duplicates = dense ties, overlap
    // runs (aaa), and chained merges — the cases where an unsound batch
    // rule diverges. Byte-identical equality across batch sizes is the
    // strongest evidence safeBatch preserves the sequential order.
    for (seed <- 0 until 10) {
      val rnd = new scala.util.Random(seed)
      val words = Seq.fill(4 + rnd.nextInt(12)) {
        Seq.fill(1 + rnd.nextInt(5))(('a' + rnd.nextInt(3)).toChar).mkString
      }
      val text = Seq.fill(20)(words(rnd.nextInt(words.size))).mkString(" ")
      val docs = Seq((1L, text)).toDF("doc_id", "text")
      val wf = Bpe.wordFrequencies(docs, "text").cache()
      val seqM = Bpe.train(wf, numMerges = 10)
      for (k <- Seq(2, 8, 64)) {
        val batM = Bpe.trainDistributed(wf, numMerges = 10, batchK = k)
        assert(seqM === batM, s"seed=$seed batchK=$k corpus=$text")
      }
      wf.unpersist()
    }
  }

  test("code-point seeding: non-BMP characters stay whole symbols") {
    // UTF-16 "🙂".map(_.toString) would shear the emoji into two lone
    // surrogates; both training paths and encodeWord must keep it whole
    val docs = Seq((1L, "a🙂b a🙂b 🙂🙂")).toDF("doc_id", "text")
    val wf = Bpe.wordFrequencies(docs, "text")
    val m = Bpe.train(wf, numMerges = 2)
    assert(m === Bpe.trainDistributed(wf, numMerges = 2))
    // pair counts: (a,🙂)=2 (🙂,b)=2 (🙂,🙂)=1 → "a"<"🙂" so (a,🙂) first,
    // then (a🙂,b)=2 beats (🙂,🙂)=1
    assert(m === Seq(Merge(0, "a", "🙂"), Merge(1, "a🙂", "b")))
    val ranks = m.map(x => (x.left, x.right) -> x.rank).toMap
    assert(Bpe.encodeWord("a🙂b", ranks) === Seq("a🙂b"))
    assert(Bpe.encodeWord("🙂", ranks) === Seq("🙂"))
    // every emitted symbol is a valid string: a sheared non-BMP char
    // would surface as a code point in the surrogate range D800-DFFF
    val enc = Bpe.encode(docs, "text", m)
      .select("bpe_tokens").as[Seq[String]].collect().flatten
    assert(enc.nonEmpty && enc.forall(
      _.codePoints().toArray.forall(cp => cp < 0xD800 || cp > 0xDFFF)),
      s"lone surrogate half in $enc")
  }

  test("fertilityBySource: hand-computed subword/word ratios per source") {
    // merge (a,b) only → "ab"→1 token, "abab"→2 ("ab","ab" — the pass
    // then priority encode both give 2), "c"→1
    val docs = Seq(
      (1L, "ab ab", "s1"),      // 2 words → 2 bpe tokens
      (2L, "abab c", "s1"),     // 2 words → 3 bpe tokens
      (3L, "", "s2"),           // 0 words
      (4L, null.asInstanceOf[String], "s2")
    ).toDF("doc_id", "text", "source")
    val merges = Seq(Merge(0, "a", "b"))
    val r = Bpe.fertilityBySource(docs, "text", "source", merges)
      .orderBy("source").collect()
    assert(r(0).getAs[String]("source") === "s1")
    assert(r(0).getAs[Long]("n_docs") === 2L)
    assert(r(0).getAs[Long]("n_words") === 4L)
    assert(r(0).getAs[Long]("n_bpe_tokens") === 5L)
    assert(r(0).getAs[Double]("fertility") === 1.25)
    assert(r(1).getAs[String]("source") === "s2")
    assert(r(1).getAs[Long]("n_words") === 0L)
    assert(r(1).isNullAt(r(1).fieldIndex("fertility")))
  }

  test("encodeWord applies merges by rank priority, not left-to-right") {
    val ranks = Map(("l", "o") -> 0, ("lo", "w") -> 1, ("low", "e") -> 2)
    assert(Bpe.encodeWord("lowest", ranks) === Seq("lowe", "s", "t"))
    assert(Bpe.encodeWord("slow", ranks) === Seq("s", "low"))
    assert(Bpe.encodeWord("xyz", ranks) === Seq("x", "y", "z")) // OOV chars
    assert(Bpe.encodeWord("low", ranks) === Seq("low"))
  }

  test("encode/tokenCount: distributed application, nulls safe, compresses") {
    val corpus = Seq(
      (1L, "low low lower lowest"),
      (2L, "slow glow lowly"),
      (3L, null: String)
    ).toDF("doc_id", "text")
    val merges = Bpe.train(Bpe.wordFrequencies(corpus, "text"), numMerges = 3)
    val enc = Bpe.encode(corpus, "text", merges)
      .select("doc_id", "bpe_tokens")
      .as[(Long, Option[Seq[String]])].collect().toMap
    // rank-2 (low,e) fires inside "lower" as well: ["lowe","r"]
    assert(enc(1L).get === Seq("low", "low", "lowe", "r", "lowe", "s", "t"))
    assert(enc(2L).get === Seq("s", "low", "g", "low", "low", "l", "y"))
    assert(enc(3L) === None)
    val tc = Bpe.tokenCount(corpus, "text", merges)
      .select("doc_id", "n_words", "n_bpe_tokens")
      .as[(Long, Int, Int)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(tc(1L) === ((4, 7)))
    assert(tc(2L) === ((3, 7)))
    assert(tc(3L) === ((0, 0)))
    // learned-vocab tokens never undercut word count
    assert(tc.values.forall { case (w, b) => b >= w })
  }
}
