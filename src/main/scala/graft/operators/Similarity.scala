package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`) — the scale path for similarity dedup / retrieval in
  * a training-data pipeline.
  *
  * Baseline: brute-force cosine top-k with a broadcast query side — the
  * corpus (100 TB side) streams through one codegen'd stage, never
  * shuffling. Scale path: LSH bucketing by random-hyperplane signs cuts
  * the candidate set per query to one bucket (equi-join on the
  * signature), trading recall for a ~2^planes fan-in reduction.
  *
  * All dot products run in double via `zip_with`/`aggregate` built-ins
  * (whole-stage codegen; no UDF, no Python).
  */
object Similarity {

  /** Σ a·b in double precision (left-to-right fold — deterministic).
    * Native codegen'd loop ([[graft.plans.ArrayDotProduct]]) — the
    * interpreted `aggregate(zip_with(...))` lambda form it replaces is
    * ~10× slower per pair and breaks whole-stage codegen in the ANN
    * scoring joins. Identical result semantics (incl. null/length
    * behavior), so the DuckDB oracles are unaffected.
    */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.plans.ArrayDotProduct(
        org.apache.spark.sql.GraftColumnBridge.expression(a),
        org.apache.spark.sql.GraftColumnBridge.expression(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Zero-norm guard: a zero vector has no direction, so cosine is
    * undefined → null (NOT NaN: Spark sorts NaN ABOVE every double, so a
    * single zero-norm corpus row would rank #1 in every top-k; nulls
    * sort last under desc).
    */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom > 0, dot(a, b) / denom)
  }

  /** Brute-force cosine top-k: for each row of `queries`, the k nearest
    * corpus rows (excluding self-id matches). Queries must be small
    * (broadcast); corpus arbitrarily large.
    */
  def cosineTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
                 k: Int): DataFrame = {
    val q = broadcast(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** Deterministic pseudo-random hyperplanes: plane p, dim d weight =
    * a fixed LCG-ish hash mapped to [-0.5, 0.5). Generated as literals
    * on the driver — identical on every executor, no shuffle of planes.
    * The arithmetic is overflow-free in 64-bit (≤ 3.3e17), so any
    * engine with BIGINT arithmetic reproduces the weights bit-exactly —
    * the DuckDB oracle recomputes them inline.
    */
  private[graft] def planeWeight(p: Int, d: Int): Double =
    ((p * 1103515L + d * 12347L + 42L) * 2654435761L % 1000003L).toDouble / 1000003.0 - 0.5

  /** Random-hyperplane LSH signature: bit p = sign(v · plane_p). */
  def lshSignature(vec: Column, dim: Int, planes: Int): Column =
    (0 until planes).map { p =>
      val weights = array((0 until dim).map(d => lit(planeWeight(p, d))): _*)
      when(dot(vec, weights) >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** LSH-bucketed ANN: join queries to corpus on equal signature bucket,
    * then exact cosine top-k within the bucket. Recall < 1 by design;
    * at scale the bucket join is a plain shuffled equi-join on the
    * signature (skew-safe via AQE).
    */
  def lshCosineTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
                    k: Int, dim: Int, planes: Int = 8): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      lshSignature(col(vecCol), dim, planes).as("sig")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      lshSignature(col(vecCol), dim, planes).as("sig"))
    val scored = q.join(c, Seq("sig"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** IVF (inverted-file) ANN — the scale path beyond LSH: partition the
    * corpus into k clusters once (index build), then search only the
    * nprobe closest clusters per query. Query cost drops to ~nprobe/k of
    * the corpus; the cluster column doubles as the parquet partition key
    * so cluster pruning happens at the scan.
    *
    * Centroid selection is deterministic (k lowest-id vectors) so
    * results are reproducible; production would run k-means iterations
    * over the same assignment primitive.
    */
  def ivfCentroids(corpus: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame =
    corpus.orderBy(col(idCol).asc).limit(k)
      .select(col(idCol).as("cid"), col(vecCol).as("centroid"))

  /** Assign every corpus row to its nearest centroid (one broadcast
    * cross-product pass; N·k dot products, no shuffle of the corpus).
    */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame, idCol: String,
                vecCol: String): DataFrame =
    corpus
      .crossJoin(broadcast(centroids))
      .withColumn("__cos", cosine(col(vecCol), col("centroid")))
      .groupBy(col(idCol))
      .agg(
        max_by(col("cid"), struct(col("__cos"), -col("cid"))).as("cluster"),
        first(col(vecCol)).as(vecCol))

  /** IVF top-k: probe the `nprobe` nearest clusters per query, exact
    * cosine within them. Recall < 1 by design (vectors near cluster
    * borders); raise nprobe to trade cost for recall.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
              k: Int, nClusters: Int, nprobe: Int): DataFrame = {
    val cents = ivfCentroids(corpus, idCol, vecCol, nClusters)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val indexed = ivfAssign(corpus, cents, idCol, vecCol)
    val wProbe = Window.partitionBy(col("query_id")).orderBy(col("__qcos").desc, col("cid").asc)
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .crossJoin(broadcast(cents))
      .withColumn("__qcos", cosine(col("qv"), col("centroid")))
      .withColumn("__pr", row_number().over(wProbe))
      .filter(col("__pr") <= nprobe)
      .select(col("query_id"), col("qv"), col("cid").as("cluster"))
    val scored = probes
      .join(indexed, Seq("cluster"))
      .filter(col("query_id") =!= col(idCol))
      .withColumn("cos", cosine(col("qv"), col(vecCol)))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col(idCol).asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col(idCol).as("neighbor_id"), col("cos"))
  }

  /** Embedding-cosine near-duplicate pairs via LSH blocking: corpus
    * self-join on signature, exact cosine ≥ threshold verification.
    */
  def cosineNearDup(df: DataFrame, idCol: String, vecCol: String,
                    threshold: Double, dim: Int, planes: Int = 8): DataFrame = {
    val sig = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      lshSignature(col(vecCol), dim, planes).as("sig"))
    val a = sig.select(col("sig"), col("id").as("id_a"), col("v").as("va"))
    val b = sig.select(col("sig"), col("id").as("id_b"), col("v").as("vb"))
    a.join(b, Seq("sig"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }
}
