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
}
