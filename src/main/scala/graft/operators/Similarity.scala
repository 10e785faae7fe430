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

  /** Σ a·b in double precision (left-to-right fold — deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

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
    * a fixed LCG-ish hash mapped to [-1, 1). Generated as literals on
    * the driver — identical on every executor, no shuffle of planes.
    */
  private def planeWeight(p: Int, d: Int): Double = {
    val h = (p * 1103515245L + d * 12345L + 42L) * 2654435761L
    ((h % 1000003L).toDouble / 1000003.0)
  }

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
