package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),  // near-dup of 1
    (3L, "completely different content about spark engines and parquet"),
    (4L, "the quick brown fox jumps over the lazy dog"))  // exact dup of 1
    .toDF("doc_id", "text")

  test("md5Hash60 native expression equals the composed " +
      "conv(substring(md5)) form it replaced") {
    // the oracle contract: ('0x' || substr(md5(t),1,15))::BIGINT —
    // exercise ascii, unicode (multi-byte UTF8), empty, whitespace-only
    // and null inputs
    val vals = Seq("a", "", " ", "the quick brown fox", "héllo wörld 键盘",
      "0", "\n\t", "x" * 5000, null)
    val df = vals.toDF("s")
    val got = df.select(Dedup.md5Hash60(col("s"))).as[Option[Long]].collect()
    val want = df.select(
      conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long"))
      .as[Option[Long]].collect()
    assert(got.toSeq === want.toSeq)
    assert(got.count(_.isEmpty) === 1) // the null row only
    assert(got.flatten.forall(_ >= 0L)) // top-60-bit values are non-negative
  }

  test("exact dedup groups identical content") {
    val r = Dedup.exact(docs, md5(col("text")), "doc_id")
    val dups = r.filter(col("n_dups") > 1).collect()
    assert(dups.length === 1)
    assert(dups.head.getAs[Long]("n_dups") === 2L)
    assert(dups.head.getAs[Long]("keeper_id") === 1L)
  }

  test("shingles produce distinct word n-grams") {
    val sh = docs.filter(col("doc_id") === 1)
      .select(Dedup.shingles(col("text"), 3).as("sh"))
      .as[Seq[String]].head()
    assert(sh.contains("the quick brown"))
    assert(sh.size === 7) // 9 tokens → 7 trigrams, all distinct
  }

  test("minHashLsh finds planted near-dup and exact dup, not the unrelated doc") {
    val pairs = Dedup.minHashLsh(docs, "doc_id", "text",
      shingleN = 2, numHashes = 16, bands = 8, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L))) // exact dup always survives
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("ngramJaccard computes exact jaccard on blocked pairs") {
    val pairs = Dedup.ngramJaccard(docs, "doc_id", "text", 2, 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs(((1L, 4L))) === 1.0)
    assert(pairs.contains((1L, 2L))) // 8 bigrams, 7 shared → j = 7/9
    assert(math.abs(pairs((1L, 2L)) - 7.0 / 9.0) < 1e-12)
  }

  test("maxShingleDf drops stop-shingle-only pairs from candidates, keeps real dups") {
    // docs 10-13 share ONLY the hot shingle "of the" (df=4 > cap 3);
    // docs 1/4 are exact dups sharing rare shingles (df ≤ 3)
    val hot = docs.unionByName(Seq(
      (10L, "alpha beta of the gamma delta"),
      (11L, "epsilon zeta of the eta theta"),
      (12L, "iota kappa of the lamda mu"),
      (13L, "nu xi of the omicron pi"))
      .toDF("doc_id", "text"))
    val uncapped = Dedup.ngramJaccard(hot, "doc_id", "text", 2, 0.05)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(uncapped.contains((10L, 11L))) // blocked via the hot shingle
    val capped = Dedup.ngramJaccard(hot, "doc_id", "text", 2, 0.05, maxShingleDf = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!capped.exists(p => p._1 >= 10L)) // hot-shingle-only pairs gone
    assert(capped.contains((1L, 4L)))
  }

  test("minHashLsh band-bucket cap drops mega-bucket candidates only") {
    // all-identical docs collapse into one band bucket of size 6 —
    // the cap excludes the whole bucket; unrelated docs unaffected
    val mass = ((0 until 6).map(i => (100L + i, "same viral template text here")) :+
      (1L, "the quick brown fox jumps over the lazy dog") :+
      (4L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val uncapped = Dedup.minHashLsh(mass, "doc_id", "text",
      shingleN = 2, numHashes = 16, bands = 8, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(uncapped.exists(p => p._1 >= 100L)) // template pairs found
    assert(uncapped.contains((1L, 4L)))
    val capped = Dedup.minHashLsh(mass, "doc_id", "text",
      shingleN = 2, numHashes = 16, bands = 8, threshold = 0.5,
      maxBandBucket = 5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!capped.exists(p => p._1 >= 100L)) // mega-bucket skipped
    assert(capped.contains((1L, 4L)))         // small buckets untouched
  }

  test("simHashTable ≡ simHash expression form") {
    val viaExpr = docs.select(col("doc_id"), Dedup.simHash(col("text")).as("fp"))
      .as[(Long, Long)].collect().toMap
    val viaTable = Dedup.simHashTable(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(viaExpr === viaTable)
  }

  test("simhash: identical text → identical fingerprint; hamming(1,3) large") {
    val fp = docs.select(col("doc_id"), Dedup.simHash(col("text")).as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) === fp(4L))
    assert(java.lang.Long.bitCount(fp(1L) ^ fp(3L)) > 10)
    assert(java.lang.Long.bitCount(fp(1L) ^ fp(2L)) <
      java.lang.Long.bitCount(fp(1L) ^ fp(3L)))
  }

  test("dupClusters: chain + clique + reversed pairs → min-id components") {
    // component {1..5} is a pure CHAIN (worst case for plain propagation
    // — pointer jumping must still converge fast), {10,11,12} a clique
    // with reversed/duplicate pairs, {20,21} a pair
    val pairs = Seq(
      (2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L),
      (10L, 11L), (11L, 12L), (12L, 10L), (11L, 10L),
      (21L, 20L))
      .toDF("id_a", "id_b")
    // both regimes must agree: in-core union-find (default) and the
    // distributed rounds (forced via driverEdgeLimit = 0)
    for (limit <- Seq(500000, 0)) {
      val r = Dedup.dupClusters(pairs, driverEdgeLimit = limit)
        .as[(Long, Long)].collect().toMap
      assert((1L to 5L).forall(r(_) === 1L))
      assert(Seq(10L, 11L, 12L).forall(r(_) === 10L))
      assert(Seq(20L, 21L).forall(r(_) === 20L))
      assert(r.size === 10)
    }
  }

  test("dupClusters distributed regime converges on STRING ids (multi-round chain)") {
    // regression: the old convergence check cast labels to decimal —
    // null for strings — so every round summed to ZERO and the loop
    // declared a fixpoint after round 1 with wrong clusters
    val chain = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "f"))
      .toDF("id_a", "id_b")
    val out = Dedup.dupClusters(chain, driverEdgeLimit = 0)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out.keySet === Set("a", "b", "c", "d", "e", "f"))
    assert(out.values.toSet === Set("a"), s"chain not fully labeled: $out")
  }

  test("simHashPairs works at nChunks=1 (full-fingerprint join, no mask wrap)") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "totally different words here")).toDF("doc_id", "text")
    val pairs = Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 0, nChunks = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("minHashCandidates rejects numHashes = 0 (would be one global bucket)") {
    val exploded = Seq((1L, "t")).toDF("id", "tok")
    val e = intercept[IllegalArgumentException] {
      Dedup.minHashCandidates(exploded, numHashes = 0, bands = 1)
    }
    assert(e.getMessage.contains("positive multiple"))
  }

  test("dupClusters on empty pairs is empty; self-pairs ignored") {
    for (limit <- Seq(500000, 0)) {
      val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
      assert(Dedup.dupClusters(empty, driverEdgeLimit = limit).count() === 0)
      val selfOnly = Seq((7L, 7L)).toDF("id_a", "id_b")
      assert(Dedup.dupClusters(selfOnly, driverEdgeLimit = limit).count() === 0)
    }
  }

  test("contaminationFlags: asymmetric overlap vs benchmark set, df cap respected") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),   // contains bench 100's 3-grams
      (2L, "alpha beta gamma other words here"),      // shares only 1 shingle with 100
      (3L, "totally unrelated content entirely now")) // clean
      .toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val r = Dedup.contaminationFlags(corpus, bench, "doc_id", "text",
      shingleN = 3, minOverlap = 2)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(r === Seq((1L, 100L, 4L))) // 6 tokens → 4 trigrams, all shared
    // doc 2 shares exactly 1 trigram (< minOverlap), doc 3 none
  }

  test("dedupKeepList keeps representatives + singletons") {
    val pairs    = Dedup.minHashLsh(docs, "doc_id", "text",
      shingleN = 2, numHashes = 16, bands = 8, threshold = 0.5)
      .select("id_a", "id_b")
    val clusters = Dedup.dupClusters(pairs)
    val kept = Dedup.dedupKeepList(docs, "doc_id", clusters)
      .select("doc_id").as[Long].collect().sorted.toSeq
    // 1,2,4 cluster together (1 kept); 3 is a singleton
    assert(kept === Seq(1L, 3L))
  }

  // ---- Bloom-guarded incremental dedup ---------------------------------

  test("buildBloom/mightContain: no false negatives, low false-positive rate") {
    val keys = (1L to 1000L).toDF("k")
    val bloom = Dedup.buildBloom(keys, col("k"), expectedItems = 1000)
    // every inserted key MUST probe true (Bloom guarantees no FN)
    val hits = keys.filter(Dedup.mightContain(bloom, col("k"))).count()
    assert(hits === 1000L)
    // foreign keys mostly probe false (default fpp ~3%; allow 10%)
    val foreign = (100001L to 101000L).toDF("k")
    val fp = foreign.filter(Dedup.mightContain(bloom, col("k"))).count()
    assert(fp < 100L, s"false-positive rate too high: $fp/1000")
  }

  test("newKeysOnly: exact anti-join semantics through the Bloom pre-filter") {
    val corpus = Seq((1L, "shared one"), (2L, "shared two"), (3L, "archive only"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "shared one"),     // dup of corpus 1
      (11L, "Shared   TWO "),  // whitespace/case variant — still a dup
      (12L, "fresh alpha"),
      (13L, "fresh beta"),
      (14L, "fresh beta")      // intra-batch dup: BOTH kept (vs-corpus op)
    ).toDF("doc_id", "text")
    val key = Dedup.md5Hash60(graft.functions.TextFns.normalizeText(col("text")))
    val kept = Dedup.newKeysOnly(batch, corpus, key, expectedItems = 100)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(12L, 13L, 14L))
    // result must equal the plain (un-pruned) anti-join
    val naive = batch.withColumn("__k", key)
      .join(corpus.select(key.as("__k")), Seq("__k"), "left_anti")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept === naive)
  }

  test("newKeysOnly: empty corpus keeps the whole batch; null keys survive") {
    val key = Dedup.md5Hash60(graft.functions.TextFns.normalizeText(col("text")))
    val batch = Seq((1L, "alpha"), (2L, null: String), (3L, "beta"))
      .toDF("doc_id", "text")
    // bootstrap: empty corpus → a NULL Bloom sketch must mean "all new",
    // not "drop everything"
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val r0 = Dedup.newKeysOnly(batch, empty, key, expectedItems = 10)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(r0 === Seq(1L, 2L, 3L))
    // null-text batch row: null key never equals a corpus key → NEW
    // (the anti-join keeps it; the Bloom probe must not eat it)
    val corpus = Seq((10L, "alpha")).toDF("doc_id", "text")
    val r1 = Dedup.newKeysOnly(batch, corpus, key, expectedItems = 10)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(r1 === Seq(2L, 3L))
  }

  // ---- duplicateSpans ----------------------------------------------------

  private def spans(docs: org.apache.spark.sql.DataFrame,
                    gramSize: Int): Map[Long, Seq[(Int, Int, Int)]] =
    Dedup.duplicateSpans(docs, "doc_id", "text", gramSize)
      .as[(Long, Int, Int, Int)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3, t._4)).sortBy(_._1).toSeq).toMap

  test("duplicateSpans: cross-doc overlapping windows merge into one span") {
    val docs = Seq(
      (1L, "a b c d e"),       // shares "a b c" with doc 2
      (2L, "x y a b c z"),
      (5L, "solo words only never repeated")
    ).toDF("doc_id", "text")
    val r = spans(docs, gramSize = 2)
    // doc 1: dup bigrams "a b"@1, "b c"@2 → one maximal span tokens 1..3
    assert(r(1L) === Seq((1, 3, 3)))
    // doc 2: same grams at 3,4 → span 3..5
    assert(r(2L) === Seq((3, 5, 3)))
    assert(!r.contains(5L)) // nothing duplicated → no rows
  }

  test("duplicateSpans: within-doc repeats count; disjoint spans stay split") {
    // "p q" repeats inside one doc at starts 1 and 4: two spans (gap of
    // one un-duplicated token between them)
    val docs = Seq((3L, "p q r p q")).toDF("doc_id", "text")
    assert(spans(docs, gramSize = 2)(3L) === Seq((1, 2, 2), (4, 5, 2)))
  }

  test("duplicateSpans: touching windows fuse; short/null docs emit nothing") {
    val docs = Seq(
      (4L, "m n m n"),         // "m n"@1 and @3 touch (end 2 + 1 = start 3)
      (6L, null: String),
      (7L, "a")                // shorter than gramSize
    ).toDF("doc_id", "text")
    val r = spans(docs, gramSize = 2)
    assert(r(4L) === Seq((1, 4, 4)))
    assert(!r.contains(6L) && !r.contains(7L))
  }

  test("duplicateSpans: md5 and xxhash64 gram keys agree; guards hold") {
    val docs = Seq(
      (1L, "one two three four five six seven"),
      (2L, "zero one two three four five nine")
    ).toDF("doc_id", "text")
    val xx = Dedup.duplicateSpans(docs, "doc_id", "text", 3)
      .as[(Long, Int, Int, Int)].collect().toSet
    val md = Dedup.duplicateSpans(docs, "doc_id", "text", 3,
        gramKeyOf = Dedup.md5Hash60)
      .as[(Long, Int, Int, Int)].collect().toSet
    assert(xx === md && xx.nonEmpty)
    intercept[IllegalArgumentException] {
      Dedup.duplicateSpans(docs, "doc_id", "text", 0)
    }
    intercept[IllegalArgumentException] {
      Dedup.duplicateSpans(docs, "doc_id", "text", 3, minCount = 1)
    }
  }

  test("paragraphDedup keeps only the globally first occurrence (doc, pos)") {
    val docs = Seq(
      (1L, "aa bb\n\ncc dd"),
      (2L, "cc dd\n\nee ff"),       // "cc dd" first seen in doc 1
      (3L, "aa bb\n\naa bb"),       // both occurrences lose to doc 1
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val r = Dedup.paragraphDedup(docs, "doc_id", "text",
      paragraphsOf = split(_, "\n{2,}"))
      .orderBy("doc_id")
      .as[(Long, Long, Long, Option[String])].collect()
    assert(r(0) === ((1L, 2L, 0L, Some("aa bb cc dd"))))
    assert(r(1) === ((2L, 2L, 1L, Some("ee ff"))))
    assert(r(2) === ((3L, 2L, 2L, Some(""))))
    assert(r(3) === ((4L, 0L, 0L, None)))
  }

  test("paragraphDedup within one doc: first position wins, order preserved") {
    val docs = Seq((7L, "x y\n\nz\n\nx y\n\nw")).toDF("doc_id", "text")
    val r = Dedup.paragraphDedup(docs, "doc_id", "text",
      paragraphsOf = split(_, "\n{2,}"))
      .as[(Long, Long, Long, Option[String])].head()
    assert(r === ((7L, 4L, 1L, Some("x y z w"))))
  }

  test("tokenBlocks matches the boilerplate segmentation convention") {
    val r = Seq(("a b C d e")).toDF("text")
      .select(Dedup.tokenBlocks(col("text"), 2).as("p"))
      .as[Seq[String]].head()
    assert(r === Seq("a b", "c d", "e"))
    val nul = Seq((null.asInstanceOf[String])).toDF("text")
      .select(Dedup.tokenBlocks(col("text"), 2).as("p"))
      .as[Seq[String]].head()
    assert(nul === Seq.empty)
  }

  test("dedupKeepBest keeps the highest-scoring member per cluster, ties by id") {
    val d = Seq(
      (1L, "aaaa"), (2L, "aaaaaa"), (3L, "aaaa"),      // cluster 1: 2 wins (longest)
      (4L, "bb"), (5L, "bb"),                          // cluster 4: tie → 4 wins
      (6L, "solo"))                                    // no cluster: keeps
      .toDF("doc_id", "text")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L))
      .toDF("id", "cluster_id")
    val r = Dedup.dedupKeepBest(d, "doc_id", clusters, length(col("text")))
      .select("doc_id", "is_kept").as[(Long, Boolean)].collect().toMap
    assert(r === Map(1L -> false, 2L -> true, 3L -> false,
      4L -> true, 5L -> false, 6L -> true))
  }

  test("fuzzyDedupPairs: edit-distance verdict over LSH candidates") {
    // docs 1/2 differ by one in-place token edit (the fuzzy-dup shape
    // Jaccard underrates); doc 3 shares shingles but diverges heavily;
    // doc 4 is unrelated (never a candidate)
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),
      (3L, "alpha beta gamma completely different tail of words"),
      (4L, "unrelated content with no shared phrases at all"))
      .toDF("doc_id", "text")
    val r = Dedup.fuzzyDedupPairs(docs, "doc_id", "text",
      shingleN = 3, numHashes = 12, bands = 6, minEditSim = 0.8)
      .as[(Long, Long, Long, Double, Boolean)].collect()
      .map(t => (t._1, t._2) -> t).toMap
    val p12 = r((1L, 2L))
    assert(p12._3 === 3L) // "theta" -> "iota": 3 char edits
    assert(p12._4 === 1.0 - 3.0 / 45 && p12._5)
    r.get((1L, 3L)).foreach(p => assert(!p._5)) // candidate maybe; never a dup
    assert(!r.keySet.exists { case (a, b) => a == 4L || b == 4L })
    // verdicts don't pre-filter: sub-threshold candidates stay visible
    assert(r.values.forall(p => p._4 > 0.8 == p._5))
  }

  test("fuzzyDedupPairs: verification count bounded by candidates, cap respected") {
    val docs = (1L to 30L).map(i => (i, "same viral template text here"))
      .toDF("doc_id", "text")
    // cap 10 < 30 identical docs: every band bucket overflows -> no pairs
    assert(Dedup.fuzzyDedupPairs(docs, "doc_id", "text",
      maxBandBucket = 10).count() === 0L)
    // uncapped: all pairs candidates, all exact dups (edit_dist 0)
    val full = Dedup.fuzzyDedupPairs(docs, "doc_id", "text")
      .as[(Long, Long, Long, Double, Boolean)].collect()
    assert(full.length === 30 * 29 / 2)
    assert(full.forall(p => p._3 == 0L && p._4 == 1.0 && p._5))
  }

  test("paragraphDedup: md5 and xxhash64 keys agree") {
    val docs = Seq(
      (1L, "p q\n\nr s"), (2L, "r s\n\nt u")).toDF("doc_id", "text")
    def run(k: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      Dedup.paragraphDedup(docs, "doc_id", "text",
        paragraphsOf = split(_, "\n{2,}"), keyOf = k)
        .as[(Long, Long, Long, Option[String])].collect().toSet
    assert(run(xxhash64(_)) === run(Dedup.md5Hash60))
  }

  test("contaminatedSpans: hand-computed masks; overlapping hits fuse") {
    val bench = Seq((100L, "a b c d"), (101L, "c d e f")).toDF("doc_id", "text")
    val corpus = Seq(
      // "a b c d" at 3; "b c d e" (its own 4-gram "c d e f" base? no —
      // only grams FROM bench count): positions 3..6 and the separate
      // repeat at 9..12 stay two spans (gap of 2)
      (1L, "x y a b c d z w a b c d"),
      // overlapping bench grams "a b c d"@1 and "c d e f"@3 fuse: 1..6
      (2L, "a b c d e f"),
      (3L, "no overlap here at all"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val r = Dedup.contaminatedSpans(corpus, bench, "doc_id", "text",
      gramSize = 4, gramKeyOf = Dedup.md5Hash60)
      .as[(Long, Int, Int, Int)].collect().sortBy(t => (t._1, t._2))
    assert(r.toSeq === Seq((1L, 3, 6, 4), (1L, 9, 12, 4), (2L, 1, 6, 6)))
  }

  test("contaminatedSpans: empty benchmark masks nothing; key families agree") {
    val bench = spark.emptyDataset[(Long, String)].toDF("doc_id", "text")
    val corpus = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    assert(Dedup.contaminatedSpans(corpus, bench, "doc_id", "text", 4).count() === 0L)
    val b2 = Seq((9L, "b c d e")).toDF("doc_id", "text")
    def run(k: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      Dedup.contaminatedSpans(corpus, b2, "doc_id", "text", 4, k)
        .as[(Long, Int, Int, Int)].collect().toSet
    assert(run(xxhash64(_)) === run(Dedup.md5Hash60))
    assert(run(xxhash64(_)) === Set((1L, 2, 5, 4)))
  }

  test("minHashAccuracyAudit: identical docs agree on every component") {
    val docs = Seq((1L, "a b c d e f"), (2L, "a b c d e f"),
      (3L, "q r s t u v"), (4L, "xx")).toDF("doc_id", "text")
    val r = Dedup.minHashAccuracyAudit(docs, "doc_id", "text",
      shingleN = 3, numHashes = 16)
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(t => ((t._1, t._2), t)).toMap
    // identical shingle sets: every component agrees, both measures 1.0
    assert(r((1L, 2L)) === (1L, 2L, 16L, 1.0, 1.0))
    // disjoint sets: exact Jaccard 0; the estimate shares the signature
    // of the identical twins (same sets → same sigs → same agreements)
    assert(r((1L, 3L))._5 === 0.0)
    assert(r((1L, 3L))._3 === r((2L, 3L))._3)
    // doc 4 has no 3-shingles → excluded from every pair
    assert(!r.keys.exists { case (a, b) => a == 4L || b == 4L })
    assert(r.size === 3)
  }

  test("containmentJoin: quote inside a long doc reads 1.0 where Jaccard ~0") {
    val corpus = Seq(
      (1L, "z1 z2 z3 z4 q w e r t y z5 z6 z7 z8 z9 z10 z11 z12"),
      (2L, "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val quotes = Seq((100L, "q w e r t y"), (200L, "q w e r t x"),
      (300L, "m1 m2 m3 m4")).toDF("quote_id", "text")
    val r = Dedup.containmentJoin(quotes, corpus, "quote_id", "doc_id",
      "text", gramSize = 3, dfCap = 100, minContainment = 0.5)
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    // quote 100: 4 trigrams, all inside doc 1 → containment 1.0
    // quote 200: trigrams {q w e, w e r, e r t, r t x} — 3 of 4 in doc 1
    // quote 300: zero overlap anywhere → below threshold
    assert(r === Set((100L, 1L, 4L, 4L, 1.0), (200L, 1L, 3L, 4L, 0.75)))
  }

  test("containmentJoin: dfCap drops stop-grams from BOTH sides") {
    // the gram "x y z" appears in every corpus doc (df 3 > cap 2) and is
    // the quote's ONLY gram → denominator empties → no rows, rather than
    // a spurious 1.0 against all three docs
    val corpus = Seq((1L, "x y z a b c"), (2L, "x y z d e f"),
      (3L, "x y z g h i")).toDF("doc_id", "text")
    val quotes = Seq((9L, "x y z")).toDF("quote_id", "text")
    val r = Dedup.containmentJoin(quotes, corpus, "quote_id", "doc_id",
      "text", gramSize = 3, dfCap = 2, minContainment = 0.1)
    assert(r.count() === 0L)
    // a quote gram ABSENT from the corpus still counts against the
    // denominator: "x b c" shares nothing; "a b c" hits doc 1 only
    val q2 = Seq((9L, "a b c q q q")).toDF("quote_id", "text")
    val r2 = Dedup.containmentJoin(q2, corpus, "quote_id", "doc_id",
      "text", gramSize = 3, dfCap = 2, minContainment = 0.1)
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    // grams: {a b c, b c q, c q q, q q q} → 1 of 4 in doc 1
    assert(r2 === Set((9L, 1L, 1L, 4L, 0.25)))
  }

  test("winnowFingerprints: hand-computed selection with rightmost-min ties") {
    // grams of "a b a b a b c" (k=3): p1 "a b a", p2 "b a b", p3 "a b a",
    // p4 "b a b", p5 "a b c" — pin their hashes to 1, 2, 1, 2, 0 so the
    // windows are hand-checkable:
    //   w=4, e=4: {1,2,1,2} min=1 at p1 and p3 → rightmost p3 → (3, 1)
    //   w=4, e=5: {2,1,2,0} min=0 at p5 → (5, 0)
    val pin = (g: org.apache.spark.sql.Column) =>
      when(g === "a b a", 1L).when(g === "b a b", 2L).otherwise(0L)
    val docs = Seq((1L, "a b a b a b c")).toDF("doc_id", "text")
    val r = Dedup.winnowFingerprints(docs, "doc_id", "text",
      gramSize = 3, window = 4, gramKeyOf = pin)
      .as[(Long, Int, Long)].collect().toSet
    assert(r === Set((1L, 3, 1L), (1L, 5, 0L)))
  }

  test("winnowFingerprints: the winnowing guarantee and degenerate docs") {
    // Theorem 1 (Schleimer et al. 2003): a shared token run of length
    // >= window + gramSize - 1 = 6 guarantees a shared fingerprint VALUE
    val shared = "q w e r t y"
    val docs = Seq(
      (1L, s"u i o p $shared z x c v"),
      (2L, s"$shared m n b"),
      (3L, "too short"),           // fewer grams than the window → none
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val r = Dedup.winnowFingerprints(docs, "doc_id", "text",
      gramSize = 3, window = 4)
      .as[(Long, Int, Long)].collect()
    val byDoc = r.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    assert(byDoc(1L).intersect(byDoc(2L)).nonEmpty)
    assert(!byDoc.contains(3L) && !byDoc.contains(4L))
    // density sanity: selections per doc are far below the gram count
    val grams1 = 10 + 6 - 2 // doc 1 tokens=14 → 12 grams
    assert(byDoc(1L).size < grams1)
    // the guarantee is hash-family independent (selections differ, the
    // shared-fingerprint property cannot)
    val md5 = Dedup.winnowFingerprints(docs, "doc_id", "text",
      gramSize = 3, window = 4, gramKeyOf = Dedup.md5Hash60)
      .as[(Long, Int, Long)].collect()
    val byDocMd5 = md5.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    assert(byDocMd5(1L).intersect(byDocMd5(2L)).nonEmpty)
  }

  test("ngramNovelty: first doc is fully novel, exact dup fully stale") {
    val d = Seq(
      (1L, "a b c d e"),        // 3 distinct 3-grams, all first here
      (2L, "a b c d e"),        // exact dup → 0 novel
      (3L, "a b c x y"),        // shares "a b c" only → 2 of 3 novel
      (4L, "q r"))              // too short for 3-grams
      .toDF("doc_id", "text")
    val r = Dedup.ngramNovelty(d, "doc_id", "text", 3)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), Option(x.get(3))))).toMap
    assert(r(1L) === ((3L, 3L, Some(1000000L))))
    assert(r(2L) === ((3L, 0L, Some(0L))))
    assert(r(3L) === ((3L, 2L, Some(666666L))))
    assert(r(4L) === ((0L, 0L, None)))
  }

  test("ngramNovelty: repeated gram inside one doc counts once (distinct shingles)") {
    // "a b a b a b" has 3-grams {a b a, b a b} (each appearing twice)
    val d = Seq((1L, "a b a b a b")).toDF("doc_id", "text")
    val r = Dedup.ngramNovelty(d, "doc_id", "text", 3).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((2L, 2L, 1000000L)))
  }

  // ------------------------------------------------------------ prefixJaccard

  private def bruteJaccardPairs(docs: Seq[(Long, String)], n: Int,
                                t: Double): Set[(Long, Long)] = {
    def sh(s: String): Set[String] = {
      val tk = s.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (tk.length < n) Set.empty
      else tk.sliding(n).map(_.mkString(" ")).toSet
    }
    (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      a = sh(ta); b = sh(tb)
      if a.nonEmpty && b.nonEmpty
      j = (a & b).size.toDouble / (a | b).size.toDouble if j >= t
    } yield (ia, ib)).toSet
  }

  test("prefixJaccard: exactly the brute-force threshold join, no misses") {
    val docs = Seq(
      (1L, "the cat sat on the mat today again"),
      (2L, "the cat sat on the mat today against"),   // near-dup of 1
      (3L, "a completely different document entirely here"),
      (4L, "a completely different document entirely there"), // near-dup of 3
      (5L, "the cat walked over a different mat"))
    val got = Dedup.prefixJaccard(docs.toDF("doc_id", "text"), "doc_id",
        "text", shingleN = 3, threshold = 0.4)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === bruteJaccardPairs(docs, 3, 0.4))
    assert(got.nonEmpty)
  }

  test("prefixJaccard: catches pairs whose shared shingles are corpus-frequent") {
    // every doc shares the same frequent core; a df-cap candidate
    // generator (q23 semantics) would drop the shared shingle — the
    // prefix filter must still find all true pairs
    val core = "alpha beta gamma delta epsilon zeta"
    val docs = (1L to 8L).map(i => (i, s"$core tail$i")) :+
      (9L, "unrelated text entirely about other things completely")
    val got = Dedup.prefixJaccard(docs.toDF("doc_id", "text"), "doc_id",
        "text", shingleN = 3, threshold = 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === bruteJaccardPairs(docs, 3, 0.5))
    assert(got.size === 28) // all C(8,2) core-sharing pairs
  }

  test("prefixJaccard: random corpus agrees with brute force") {
    val rnd = new scala.util.Random(5)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val docs = (1L to 40L).map(i =>
      (i, Seq.fill(6 + rnd.nextInt(5))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")))
    val got = Dedup.prefixJaccard(docs.toDF("doc_id", "text"), "doc_id",
        "text", shingleN = 2, threshold = 0.6)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === bruteJaccardPairs(docs, 2, 0.6))
  }

  test("softDedup: canonical always kept, singletons always kept") {
    val dup = Seq((3L, "same text"), (1L, "same text"), (2L, "same text"),
      (4L, "unique one"), (5L, "unique two"))
    val out = Dedup.softDedup(dup.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getBoolean(3), r.getBoolean(4)))).toMap
    assert(out(1L) === ((3L, true, true)))   // min id canonicalizes
    assert(out(2L)._1 === 3L)
    assert(!out(2L)._2 && !out(3L)._2)
    // cluster size 1 → coin·1 < 10⁶ always → kept
    assert(out(4L) === ((1L, true, true)))
    assert(out(5L) === ((1L, true, true)))
  }

  test("softDedup: non-canonical keep matches the md5 coin exactly") {
    val dup = (1L to 10L).map(i => (i, "same text"))
    val out = Dedup.softDedup(dup.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    // replay the coin on the driver: md5 hex top-15 chars as a long
    def coin(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:soft".getBytes("UTF-8"))
      val hex = d.map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 1000000L
    }
    (1L to 10L).foreach { i =>
      val want = i == 1L || coin(i) * 10L < 1000000L
      assert(out(i) === want, s"doc $i: got ${out(i)}, want $want")
    }
    // normalization: whitespace variants land in the same cluster
    val norm = Dedup.softDedup(
      Seq((1L, "a  b"), (2L, "a b "), (3L, " A B")).toDF("doc_id", "text"),
      "doc_id", "text").collect()
    assert(norm.map(_.getLong(2)).toSet === Set(3L))
  }

  test("sortedNeighborhood: only window-adjacent pairs compared") {
    val docsSn = Seq((10L, "aaa x"), (20L, "aaa y"), (30L, "zzz q"))
      .toDF("doc_id", "text")
    // window 1: (10,20) sim 0.8 passes; (20,30) sim 0 fails
    val w1 = Dedup.sortedNeighborhood(docsSn, "doc_id", "text",
        keyLen = 16, windowSize = 1, minEditSim = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getLong(3)))
    assert(w1.toSeq === Seq((10L, 20L, 1, 800000L)))
    // window 2 additionally compares (10,30) — still below 0.5
    val w2 = Dedup.sortedNeighborhood(docsSn, "doc_id", "text",
        keyLen = 16, windowSize = 2, minEditSim = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(w2 === Set((10L, 20L), (20L, 30L), (10L, 30L)))
  }

  test("sortedNeighborhood: thresholded levenshtein ≡ unbounded form " +
      "on boundary pairs (sim exactly at / just below the cut)") {
    // "aaaa x" vs "aaaa y": dist 1, len 6 -> sim_q = 833333
    val docs = Seq((1L, "aaaa x"), (2L, "aaaa y")).toDF("doc_id", "text")
    def simAt(cut: Double): Seq[Long] =
      Dedup.sortedNeighborhood(docs, "doc_id", "text",
        keyLen = 4, windowSize = 1, minEditSim = cut)
        .collect().toSeq.map(_.getLong(3))
    // exactly at the integer cut: floor(0.833333*1e6) = 833333 passes
    assert(simAt(0.833333) === Seq(833333L))
    // one ulp above the cut on the 1e6 grid: drops
    assert(simAt(0.833334) === Seq.empty)
    // the threshold early-exit keeps the SIM VALUE exact, not just the
    // verdict: d=1 <= thr at every passing cut
    assert(simAt(0.5) === Seq(833333L))
    // empty-vs-empty: L=0 path still reports 1e6 (thr 0, d 0)
    val empt = Seq((1L, ""), (2L, "")).toDF("doc_id", "text")
    val e = Dedup.sortedNeighborhood(empt, "doc_id", "text",
      keyLen = 4, windowSize = 1, minEditSim = 1.0).collect()
    assert(e.map(_.getLong(3)).toSeq === Seq(1000000L))
  }

  test("fuzzyDedupPairs: hybrid kernel's fallback path reports the " +
      "EXACT distance for rejected (beyond-threshold) candidates") {
    // long shared shingle prefix (J ≈ 0.57, 12 single-row bands) makes
    // candidacy deterministic-certain; the tails diverge far past the
    // 0.8 bound, forcing the -1 -> unbounded fallback
    val ta = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "one two three"
    val tb = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "zzzzzzzzzz qqqqqqqqqq wwwwwwwwww"
    val docs = Seq((1L, ta), (2L, tb)).toDF("doc_id", "text")
    val r = Dedup.fuzzyDedupPairs(docs, "doc_id", "text",
      shingleN = 3, numHashes = 12, bands = 12, minEditSim = 0.8)
      .as[(Long, Long, Long, Double, Boolean)].collect()
    assert(r.length === 1)
    // the unbounded builtin is the reference the hybrid must match
    val exact = Seq((ta, tb)).toDF("a", "b")
      .select(levenshtein(col("a"), col("b"))).collect().head.getInt(0)
    assert(r.head._3 === exact.toLong && !r.head._5)
  }

  test("sortedNeighborhood: position order is (key, id), not input order") {
    // id 5's text sorts FIRST despite the largest id
    val docsSn = Seq((1L, "bbb"), (2L, "ccc"), (5L, "aaa"))
      .toDF("doc_id", "text")
    val got = Dedup.sortedNeighborhood(docsSn, "doc_id", "text",
        keyLen = 16, windowSize = 1, minEditSim = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((5L, 1L), (1L, 2L)))
  }

  // ---- dedupSavings --------------------------------------------------------

  test("dedupSavings: histogram and reclaimed bytes by hand") {
    // cluster A: sizes (10, 20, 30) -> keep min-id (10), reclaim 50
    // cluster B: sizes (5, 5) -> keep min-id (5), reclaim 5
    // cluster C: singleton (7) -> reclaim 0
    val assign = Seq(
      (1L, "A", 10L), (2L, "A", 20L), (3L, "A", 30L),
      (4L, "B", 5L), (5L, "B", 5L), (6L, "C", 7L))
      .toDF("id", "cl", "sz")
    val out = Dedup.dedupSavings(assign, "id", "cl", "sz")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out === Map(
      3L -> ((1L, 3L, 50L)),
      2L -> ((1L, 2L, 5L)),
      1L -> ((1L, 1L, 0L))))
  }

  test("dedupSavings: the representative is the MIN-ID member's size") {
    // min id (id=9 has size 100, id=2 has size 1): rep is id=2 -> 1
    val assign = Seq((9L, "A", 100L), (2L, "A", 1L)).toDF("id", "cl", "sz")
    val r = Dedup.dedupSavings(assign, "id", "cl", "sz").collect()(0)
    assert(r.getLong(3) === 100L, "reclaim the non-representative's 100")
  }

  // ---- winnowOverlapPairs --------------------------------------------------

  private val run1 = "alpha beta gamma delta epsilon zeta"   // 6 tokens
  private val run2 = "one two three four five six"           // 6 tokens

  test("winnowOverlapPairs: two shared >=6-token runs meet minShared=2") {
    val d = Seq(
      (1L, s"$run1 filler1 stuff $run2"),
      (2L, s"other prefix $run1 middle bits $run2 tail"),
      (3L, "entirely unrelated words nothing here matches at all"))
      .toDF("doc_id", "text")
    val out = Dedup.winnowOverlapPairs(d, "doc_id", "text",
        gramSize = 3, window = 4, minShared = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length === 1)
    val (a, b, n) = out.head
    assert(a === 1L && b === 2L, "id_a < id_b ordering")
    // winnowing guarantee: each 6-token run (window+gram-1 = 6) yields
    // at least one shared fingerprint
    assert(n >= 2L)
  }

  test("winnowOverlapPairs: a single short overlap fails minShared=2") {
    val d = Seq(
      (1L, s"$run1 unique trailing content here"),
      (2L, s"different head words $run1"))
      .toDF("doc_id", "text")
    val strict = Dedup.winnowOverlapPairs(d, "doc_id", "text",
      gramSize = 3, window = 4, minShared = 6L).collect()
    val loose = Dedup.winnowOverlapPairs(d, "doc_id", "text",
      gramSize = 3, window = 4, minShared = 1L).collect()
    assert(strict.isEmpty, "one shared run cannot reach minShared=6")
    assert(loose.nonEmpty)
  }

  test("winnowOverlapPairs: the fp-df cap drops boilerplate fingerprints") {
    // the same run in 5 docs: each fp has df 5 > cap 3 -> no pairs
    val d = (1L to 5L).map(i => (i, s"$run1 tail$i")).toDF("doc_id", "text")
    val capped = Dedup.winnowOverlapPairs(d, "doc_id", "text",
      gramSize = 3, window = 4, minShared = 1L, maxFpDf = 3L).collect()
    assert(capped.isEmpty)
    val uncapped = Dedup.winnowOverlapPairs(d, "doc_id", "text",
      gramSize = 3, window = 4, minShared = 1L, maxFpDf = 200L).collect()
    assert(uncapped.length === 10, "5 docs sharing a run -> C(5,2) pairs")
  }

  test("fellegiSunter: perfectly predictive field gets a positive " +
      "agree weight, anti-predictive gets negative") {
    // 4 matches all agree on f_good; 4 unmatches all disagree
    val pairs = (Seq.fill(4)((true, true, false)) ++
      Seq.fill(4)((false, false, true))).toDF("mt", "f_good", "f_bad")
    val out = Dedup.fellegiSunter(pairs, col("mt"),
      Seq("a_good" -> col("f_good"), "b_bad" -> col("f_bad")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    val (nm, nu, am, au, wA, wD) = out("a_good")
    assert((nm, nu, am, au) === ((4L, 4L, 4L, 0L)))
    // m = 5/6, u = 1/6 -> w_agree = ln 5 > 0; w_disagree = ln(1/5) < 0
    assert(wA === math.floor(1e6 * math.log(5.0)).toLong)
    assert(wD === math.floor(1e6 * math.log(1.0 / 5.0)).toLong)
    val bad = out("b_bad")
    assert(bad._5 < 0 && bad._6 > 0) // mirrored for the inverse field
  }

  test("fellegiSunter: null agreement counts as disagreement") {
    val pairs = Seq((true, Some(true)), (true, None),
      (false, Some(false))).toDF("mt", "f")
    val r = Dedup.fellegiSunter(pairs, col("mt"), Seq("f" -> col("f")))
      .collect().head
    assert((r.getLong(1), r.getLong(2)) === ((2L, 1L)))
    assert(r.getLong(3) === 1L) // only the non-null agree survives
  }
}
