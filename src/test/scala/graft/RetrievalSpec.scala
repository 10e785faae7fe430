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
}
