package graft

import org.apache.spark.sql.functions._

import graft.operators.Retrieval

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark shuffle join"),
    (2L, "spark shuffle"),
    (3L, "spark join broadcast"),
    (4L, "unrelated totally different words"),
    (5L, "spark spark spark shuffle shuffle join"))
    .toDF("doc_id", "text")

  test("bm25TopK ranks term-overlapping docs first; self excluded; k respected") {
    val r = Retrieval.bm25TopK(corpus.filter(col("doc_id") === 1), corpus,
      "doc_id", "text", k = 2)
      .as[(Long, Int, Long, Double)].collect().sortBy(_._2)
    assert(r.length === 2)
    assert(r.map(_._2).toSeq === Seq(1, 2)) // dense ranks from 1
    assert(!r.exists(_._3 == 1L)) // no self match
    assert(!r.exists(_._3 == 4L)) // no shared term -> never a candidate
    // all of doc 1's terms hit docs 2/3/5; ranking must be deterministic
    val again = Retrieval.bm25TopK(corpus.filter(col("doc_id") === 1), corpus,
      "doc_id", "text", k = 2)
      .as[(Long, Int, Long, Double)].collect().sortBy(_._2)
    assert(r.toSeq === again.toSeq)
  }

  test("bm25TopK: rarer matched term outscores a commoner one (idf)") {
    // query 3: terms {spark, join, broadcast}; docs 1 and 5 both match
    // {spark, join}, but doc 5 is longer AND tf-saturated — doc 1 (short,
    // same match set) must score at least as high by length normalization
    val r = Retrieval.bm25TopK(corpus.filter(col("doc_id") === 3), corpus,
      "doc_id", "text", k = 4)
      .as[(Long, Int, Long, Double)].collect()
    val score = r.map(t => t._3 -> t._4).toMap
    assert(score(1L) >= score(5L))
    // scores are the quantized longs / 1e6: exact 6-decimal values
    r.foreach(t => assert(t._4 === math.floor(t._4 * 1e6) / 1e6))
  }

  test("bm25TopK: maxTermDf drops stop terms from matching entirely") {
    // "spark" df=4 > cap 3 -> only shuffle/join/broadcast match
    val r = Retrieval.bm25TopK(corpus.filter(col("doc_id") === 2), corpus,
      "doc_id", "text", k = 5, maxTermDf = 3)
      .as[(Long, Int, Long, Double)].collect()
    // doc 2's surviving query term is "shuffle" (df 3): docs 1 and 5 only
    assert(r.map(_._3).toSet === Set(1L, 5L))
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(corpus, corpus, "doc_id", "text", k = 0)
    }
  }

  test("bm25TopK is partition-order free (quantized contributions)") {
    val big = (1L to 200L)
      .map(i => (i, s"term${i % 7} term${i % 11} term${i % 13} filler$i common"))
      .toDF("doc_id", "text")
    val q = big.filter(col("doc_id") <= 5)
    val a = Retrieval.bm25TopK(q, big.coalesce(1), "doc_id", "text", k = 3)
      .orderBy("query_id", "rank").collect().toSeq
    val b = Retrieval.bm25TopK(q, big.repartition(17), "doc_id", "text", k = 3)
      .orderBy("query_id", "rank").collect().toSeq
    assert(a === b)
  }

  // ---- rrfFuse -----------------------------------------------------------

  private def ranks(rows: (Long, Long, Int)*) =
    rows.toDF("query_id", "doc_id", "rank")

  test("rrfFuse: hand-computed fused scores; both-arm doc beats single-arm") {
    // doc 10 ranks 2nd in both arms: 2/(60+2) > 1/(60+1) single-arm top
    val lex = ranks((1L, 11L, 1), (1L, 10L, 2))
    val dense = ranks((1L, 12L, 1), (1L, 10L, 2))
    val r = Retrieval.rrfFuse(Seq(lex, dense), k = 3)
      .as[(Long, Int, Long, Double)].collect().sortBy(_._2)
    assert(r.map(_._3).toSeq === Seq(10L, 11L, 12L))
    // quantized contract: score = sum of (1e9 div (60+rank)) / 1e9
    val c1 = 1000000000L / 61; val c2 = 1000000000L / 62
    assert(r(0)._4 === (c2 + c2) / 1e9)
    assert(r(1)._4 === c1 / 1e9)
    // equal fused score ties break by ascending doc_id
    assert(r(1)._3 < r(2)._3 && r(1)._4 === r(2)._4)
  }

  test("rrfFuse: k caps output per query; arms with disjoint queries keep both") {
    val a = ranks((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
    val b = ranks((2L, 20L, 1))
    val r = Retrieval.rrfFuse(Seq(a, b), k = 2)
      .as[(Long, Int, Long, Double)].collect()
    assert(r.count(_._1 == 1L) === 2)
    assert(r.count(_._1 == 2L) === 1)
    intercept[IllegalArgumentException] { Retrieval.rrfFuse(Seq.empty, k = 1) }
    intercept[IllegalArgumentException] { Retrieval.rrfFuse(Seq(a), k = 0) }
  }

  // ---- recallAtK ---------------------------------------------------------

  private def ranked(rows: (Long, Int, Long)*) =
    rows.toDF("query_id", "rank", "neighbor_id")

  test("recallAtK: per-query hit counts against exact; misses score 0") {
    val exact = ranked((1L, 1, 10L), (1L, 2, 11L), (2L, 1, 20L))
    val approx = ranked((1L, 1, 11L), (1L, 2, 99L), (2L, 1, 21L))
    val r = Retrieval.recallAtK(approx, exact, k = 2)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(r(0) === ((1L, 1L, 2L, 0.5)))  // hit 11, missed 10
    assert(r(1) === ((2L, 0L, 1L, 0.0)))  // 21 != 20
  }

  test("recallAtK: ranks beyond k are ignored on both sides") {
    val exact = ranked((1L, 1, 10L), (1L, 2, 11L), (1L, 3, 12L))
    val approx = ranked((1L, 1, 10L), (1L, 3, 11L)) // 11 at rank 3 > k
    val r = Retrieval.recallAtK(approx, exact, k = 2)
      .as[(Long, Long, Long, Double)].collect()
    assert(r.head === ((1L, 1L, 2L, 0.5)))
  }

  test("qlTopK: self excluded, no-shared-term docs absent, deterministic") {
    val r = Retrieval.qlTopK(corpus.filter(col("doc_id") === 1), corpus,
      "doc_id", "text", k = 4)
      .as[(Long, Int, Long, Double)].collect().sortBy(_._2)
    assert(!r.exists(_._3 == 1L), "self match must be excluded")
    assert(!r.exists(_._3 == 4L), "no shared term -> never ranked")
    assert(r.map(_._2).toSeq === (1 to r.length).toSeq)
    val again = Retrieval.qlTopK(corpus.filter(col("doc_id") === 1), corpus,
      "doc_id", "text", k = 4)
      .as[(Long, Int, Long, Double)].collect().sortBy(_._2)
    assert(r.toSeq === again.toSeq)
  }

  test("qlTopK: hand-computed Dirichlet score on a 2-doc corpus") {
    val tiny = Seq((1L, "a b"), (2L, "a a c"), (3L, "a")).toDF("doc_id", "text")
    // corpus: |C| = 6 tokens; cf: a=4, b=1, c=1; dl: d1=2, d2=3, d3=1
    // query doc 3 = {a}; n_q = 1, mu = 2
    // score(d1) = floor(1e6·ln(1 + 1·6/(2·4))) + 1·floor(1e6·ln(2/(2+2)))
    val mu = 2.0
    def q(x: Double) = math.floor(1e6 * x).toLong
    val exp1 = q(math.log(1 + 1.0 * 6 / (mu * 4))) + q(math.log(mu / (2 + mu)))
    val exp2 = q(math.log(1 + 2.0 * 6 / (mu * 4))) + q(math.log(mu / (3 + mu)))
    val r = Retrieval.qlTopK(tiny.filter(col("doc_id") === 3), tiny,
      "doc_id", "text", k = 2, mu = mu)
      .as[(Long, Int, Long, Double)].collect().sortBy(_._2)
    val scores = r.map(t => t._3 -> math.round(t._4 * 1e6)).toMap
    assert(scores === Map(1L -> exp1, 2L -> exp2))
    // d2 has tf=2 of 'a' but is longer; exact order per the formula
    val want = Seq(1L, 2L).sortBy(id => -(if (id == 1L) exp1 else exp2))
    assert(r.map(_._3).toSeq === want)
  }

  test("qlTopK: maxTermDf drops stop terms from the match set") {
    // 'spark' appears in 4 docs; cap at 3 removes it -> doc 2 ('spark
    // shuffle') still reachable from doc 1 via 'shuffle'/'join' only
    val r = Retrieval.qlTopK(corpus.filter(col("doc_id") === 1), corpus,
      "doc_id", "text", k = 4, maxTermDf = 3)
      .as[(Long, Int, Long, Double)].collect()
    assert(r.nonEmpty)
    assert(r.exists(_._3 == 3L), "doc 3 must still match via 'join'")
    assert(r.exists(_._3 == 5L), "doc 5 must still match via shuffle/join")
  }

  // ----------------------------------------------------- rm3Expansion

  test("rm3Expansion: uniform relevance-model weights are the exact " +
      "(1e12*tf) div dl sums over the feedback docs") {
    val docs = Seq(
      (1L, "apple apple cherry"),
      (2L, "banana durian"),
      (3L, "elephant")).toDF("doc_id", "text")
    val queries = Seq((100L, "apple banana")).toDF("doc_id", "text")
    val out = Retrieval.rm3Expansion(queries, docs, "doc_id", "text",
      fbDocs = 2, fbTerms = 10)
      .orderBy("term_rank")
      .as[(Long, Int, String, Long)].collect().toSeq
    // feedback = docs 1 and 2 (the only BM25 matches); weights:
    //   apple  (2e12 div 3) = 666666666666
    //   banana (1e12 div 2) = 500000000000, durian same (tie -> term asc)
    //   cherry (1e12 div 3) = 333333333333
    assert(out === Seq(
      (100L, 1, "apple", 666666666666L),
      (100L, 2, "banana", 500000000000L),
      (100L, 3, "durian", 500000000000L),
      (100L, 4, "cherry", 333333333333L)))
  }

  test("rm3Expansion: fbTerms caps the expansion per query") {
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a g h")).toDF("doc_id", "text")
    val queries = Seq((100L, "a")).toDF("doc_id", "text")
    val out = Retrieval.rm3Expansion(queries, docs, "doc_id", "text",
      fbDocs = 2, fbTerms = 3).collect()
    assert(out.length === 3)
    // highest-weight term is the shared 'a' (1e12/6 + 1e12/3)
    assert(out.map(r => r.getString(2)).contains("a"))
  }
}
