package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale text/training-data pipelines.
  *
  * Exact dedup mirrors the reference's content-addressed attribute dedup
  * (hash-keyed `ON CONFLICT DO NOTHING` + in-memory seen-cache,
  * `/root/reference/src/main/java/org/openbmp/ConsumerRunnable.java:489-498`);
  * the near-dup family (MinHash/LSH, SimHash, n-gram Jaccard) extends it
  * for 100 TB document corpora. Everything is codegen'd built-ins
  * (split/transform/aggregate/explode/xxhash64/groupBy); candidate
  * generation is always a shuffle-by-key equi-join — never an all-pairs
  * nested loop.
  */
object Dedup {

  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Distinct word n-gram shingles of a text column. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val cnt  = greatest(size(toks) - lit(n - 1), lit(0))
    when(cnt > 0,
      array_distinct(transform(sequence(lit(1), cnt), i => array_join(slice(toks, i, lit(n)), " "))))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact dedup by content hash: one keeper (min of `idCol`) per
    * distinct value of `hashOf`, plus the duplicate count. Map-side
    * partial aggregation makes this a single cheap shuffle at any scale.
    */
  def exact(df: DataFrame, hashOf: Column, idCol: String): DataFrame =
    df.groupBy(hashOf.as("content_hash"))
      .agg(count(lit(1)).as("n_dups"), min(col(idCol)).as("keeper_id"))

  /** MinHash signature: `numHashes` seeded min-hashes over the shingle
    * set. Seeding = hashing the shingle together with the hash index
    * (xxhash64 is deterministic and codegen'd).
    */
  def minHashSignature(sh: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      s => array_min(transform(sh, t => xxhash64(t, s))))

  /** MinHash-LSH near-duplicate pairs with exact-Jaccard verification:
    * shingle → minhash → band → bucket equi-join → verify. Bands become
    * join keys, so candidates shuffle on (band, bandHash) — linear and
    * skew-safe; the exact Jaccard filter removes LSH false positives.
    */
  def minHashLsh(df: DataFrame, idCol: String, textCol: String,
                 shingleN: Int = 3, numHashes: Int = 16, bands: Int = 4,
                 threshold: Double = 0.8): DataFrame = {
    val rowsPerBand = numHashes / bands
    val base = df
      .select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("sh", shingles(col("text"), shingleN))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minHashSignature(col("sh"), numHashes))
    val banded = base.select(
      col("id"), col("sh"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(
          b.as("band"),
          xxhash64(array_join(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), ","), b)
            .as("bh")))).as("b"))
      .select(col("id"), col("sh"), col("b.band").as("band"), col("b.bh").as("bh"))
    val a = banded.select(col("band"), col("bh"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("bh"), col("id").as("id_b"), col("sh").as("sh_b"))
    val cand = a.join(b, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b")
      .dropDuplicates("id_a", "id_b")
    verifyJaccard(cand, threshold)
  }

  /** Exact Jaccard over candidate pairs carrying shingle arrays sh_a/sh_b. */
  def verifyJaccard(pairs: DataFrame, threshold: Double): DataFrame =
    pairs
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("inter").cast("double") / col("uni").cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")

  /** Blocked exact n-gram-Jaccard near-dup: pairs sharing ≥1 shingle
    * (equi-join block on exploded shingles), then exact Jaccard ≥
    * threshold. Deterministic (no hashing) → DuckDB-oracle-friendly.
    */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
                   shingleN: Int, threshold: Double): DataFrame = {
    val base = df
      .select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("sh", shingles(col("text"), shingleN))
      .filter(size(col("sh")) > 0)
    val exploded = base.select(col("id"), col("sh"), explode(col("sh")).as("tok"))
    val cand = exploded.as("x")
      .join(exploded.as("y"), Seq("tok"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        col("x.sh").as("sh_a"), col("y.sh").as("sh_b"))
      .dropDuplicates("id_a", "id_b")
    verifyJaccard(cand, threshold)
  }

  /** 64-bit SimHash fingerprint over the token multiset: per bit, the
    * sign of Σ±1 across token hashes. Expressed as 64 static codegen'd
    * aggregates — correct and branch-free; the production path for 100 TB
    * would fold this into one custom Catalyst Expression (SURVEY §7.3).
    */
  def simHash(text: Column): Column = {
    val hashes = transform(tokens(text), t => xxhash64(t))
    val n      = size(hashes)
    (0 until 64)
      .map { b =>
        val setCnt = aggregate(hashes, lit(0L), (s, v) => s + shiftright(v, b).bitwiseAND(lit(1L)))
        when(setCnt * 2 >= n, lit(1L << b)).otherwise(lit(0L))
      }
      .reduce((x, y) => x.bitwiseOR(y))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hammingDist(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: band the 64-bit fingerprint into 4×16-bit
    * chunks (pigeonhole: hamming ≤ 3 ⇒ some chunk equal), equi-join on
    * chunks, verify by hamming distance.
    */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val base = df.select(col(idCol).as("id"), simHash(col(textCol)).as("fp"))
    val chunkStructs = (0 until 4).map(c =>
      struct(lit(c).as("chunk"),
        shiftrightunsigned(col("fp"), c * 16).bitwiseAND(lit(0xffffL)).as("cv")))
    val banded = base.select(col("id"), col("fp"),
      explode(array(chunkStructs: _*)).as("b"))
      .select(col("id"), col("fp"), col("b.chunk").as("chunk"), col("b.cv").as("cv"))
    val a = banded.select(col("chunk"), col("cv"), col("id").as("id_a"), col("fp").as("fp_a"))
    val b = banded.select(col("chunk"), col("cv"), col("id").as("id_b"), col("fp").as("fp_b"))
    a.join(b, Seq("chunk", "cv"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", hammingDist(col("fp_a"), col("fp_b")))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
