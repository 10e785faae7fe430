package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for embedding-scale ANN: split each
  * d-dim vector into `m` contiguous subvectors, learn a small L2
  * k-means codebook per subspace, and store each vector as `m` small
  * codes — the memory-bound scale path for a 100 TB embedding store
  * (64-dim float = 256 B/vec becomes m bytes at ksub ≤ 256, a 64×
  * compression that turns a cluster-sized index into a RAM-sized one).
  * Query scoring is asymmetric-distance computation (ADC): one
  * per-query lookup table of query-subvector→codeword distances, then
  * every corpus distance is `m` table lookups summed — no original
  * vectors touched at query time.
  *
  * ORACLE-GRADE determinism throughout: codebook means use the
  * `floor(x·10⁶)` long-sum quantization (the kmeansAssign contract —
  * partition-order-free), assignment ties break to the low centroid
  * id, and ADC scores are per-subspace `floor(10⁶·d²)` longs summed
  * exactly; ranking compares the long (ties by ascending id).
  *
  * Plan shape: codebook training is iters × one broadcast N·ksub·m
  * subvector pass + a posexplode hash-aggregate (no corpus shuffle);
  * encoding is one broadcast assignment scan; ADC is a broadcast
  * LUT join against the (id, sub, code) table and one map-side-
  * combined hash aggregate — the corpus streams through once.
  */
object Pq {

  /** Squared L2 distance as three codegen'd dot products:
    * `a·a − 2.0·(a·b) + b·b`, left-associated — the literal IEEE
    * expression the DuckDB oracles mirror.
    */
  private def d2(a: Column, b: Column): Column =
    Similarity.dot(a, a) - lit(2.0) * Similarity.dot(a, b) +
      Similarity.dot(b, b)

  /** Explode a vector column into (sub, subvector) rows: sub s covers
    * positions [s·d/m, (s+1)·d/m). One narrow projection — no shuffle.
    */
  private def subvectors(df: DataFrame, idCol: String, vecCol: String,
                         dim: Int, m: Int, idAs: String, vecAs: String): DataFrame = {
    val subDim = dim / m
    df.select(col(idCol).as(idAs),
      posexplode(array((0 until m).map(s =>
        slice(col(vecCol), s * subDim + 1, subDim)): _*)).as(Seq("sub", vecAs)))
  }

  /** Per-subspace assignment of subvectors to their nearest codeword
    * (squared-L2, ties to the low centroid id). `cents` must be small
    * (broadcast): (sub, cid, cent).
    */
  private def assign(sv: DataFrame, cents: DataFrame): DataFrame =
    sv.join(broadcast(cents), Seq("sub"))
      .withColumn("__d2", d2(col("v"), col("cent")))
      .groupBy(col("id"), col("sub"))
      .agg(min_by(col("cid"), struct(col("__d2"), col("cid"))).as("code"),
        first(col("v")).as("v"))

  /** Train one L2 k-means codebook per subspace: init = the first
    * `ksub` corpus rows by id (their subvectors), then `iters` rounds
    * of assign → quantized exact mean (per-component `floor(x·10⁶)`
    * long sums — partition-order-free). A codeword whose cell empties
    * keeps its previous position. Returns (sub, cid, cent) with cid =
    * the seeding row's id.
    */
  def pqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
                  dim: Int, m: Int, ksub: Int, iters: Int): DataFrame = {
    require(m > 0 && dim % m == 0, s"m ($m) must divide dim ($dim)")
    require(ksub > 0 && iters >= 0,
      s"ksub ($ksub) must be positive, iters ($iters) >= 0")
    val sv = subvectors(corpus, idCol, vecCol, dim, m, "id", "v")
    var cents = Similarity.materializeSmall(
      subvectors(corpus.orderBy(col(idCol).asc).limit(ksub), idCol, vecCol,
        dim, m, "cid", "cv")
        .select(col("sub"), col("cid"),
          transform(col("cv"), x => x.cast("double")).as("cent")))
    for (_ <- 0 until iters) {
      val assigned = assign(sv, cents)
      val means = assigned
        .select(col("sub"), col("code").as("cid"),
          posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("sub"), col("cid"), col("pos"))
        .agg((sum(floor(col("x").cast("double") * 1000000.0).cast("long"))
          .cast("double") / (lit(1000000.0) * count(lit(1)))).as("mc"))
        .groupBy(col("sub"), col("cid"))
        .agg(array_sort(collect_list(struct(col("pos"), col("mc")))).as("pm"))
        .select(col("sub"), col("cid"),
          transform(col("pm"), p => p.getField("mc")).as("__mean"))
      cents = Similarity.materializeSmall(
        cents.join(means, Seq("sub", "cid"), "left")
          .select(col("sub"), col("cid"),
            coalesce(col("__mean"), col("cent")).as("cent")))
    }
    cents
  }

  /** Encode the corpus against a trained codebook table: one broadcast
    * assignment scan → (id, sub, code). The compressed representation
    * a 100 TB store persists in place of the raw vectors.
    */
  def pqEncode(corpus: DataFrame, cents: DataFrame, idCol: String,
               vecCol: String, dim: Int, m: Int): DataFrame =
    assign(subvectors(corpus, idCol, vecCol, dim, m, "id", "v"), cents)
      .select(col("id").as(idCol), col("sub"), col("code"))

  /** ADC top-k: train/encode, build the per-query distance lookup
    * table (|queries|·m·ksub rows — broadcast), then score every
    * corpus row as the exact-long sum of its m looked-up subspace
    * distances. Output (query_id, rank, neighbor_id, adist) with
    * adist the approximate squared L2 (quantized /10⁶), ranked
    * ascending, self excluded.
    */
  def pqAdcTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                vecCol: String, dim: Int, m: Int, ksub: Int, iters: Int,
                k: Int): DataFrame = {
    require(k > 0, s"k ($k) must be positive")
    val cents = Similarity.materializeSmall(
      pqCodebooks(corpus, idCol, vecCol, dim, m, ksub, iters))
    val enc = pqEncode(corpus, cents, idCol, vecCol, dim, m)
      .select(col(idCol).as("neighbor_id"), col("sub"), col("code"))
    val lut = subvectors(queries, idCol, vecCol, dim, m, "query_id", "qv")
      .join(broadcast(cents), Seq("sub"))
      .select(col("query_id"), col("sub"), col("cid"),
        floor(lit(1000000.0) * d2(col("qv"), col("cent"))).cast("long").as("lq"))
    val scored = enc
      .join(broadcast(lut),
        enc("sub") === lut("sub") && enc("code") === lut("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("lq")).as("adist_q"))
      // rank ascending by feeding the shared salted top-k stage the
      // NEGATED exact long (doubles are exact far beyond this range)
      .withColumn("cos", -col("adist_q").cast("double"))
    Similarity.topKPerQuery(scored, k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        (-col("cos") / lit(1000000.0)).as("adist"))
  }

  /** IVF-PQ top-k — the canonical billion-vector index shape (FAISS
    * IVFx,PQy; Jégou et al. 2011): an IVF coarse quantizer routes each
    * query to its `nprobe` nearest clusters (cosine, the
    * [[Similarity.ivfTopK]] routing), and within the probed clusters
    * candidates are ranked by PQ ADC instead of exact distance — the
    * corpus is never touched at query time beyond its m-byte codes.
    * Encoding is on RAW vectors (FAISS `by_residual=false`): residual
    * encoding buys recall at the cost of a per-cluster LUT (nprobe×
    * larger), and raw-vector codes keep the codebook query-independent
    * — one broadcast LUT per query regardless of routing.
    *
    * At 100 TB the two legs separate cleanly: the coarse assignment and
    * PQ codes are the OFFLINE index (persist them `partitionBy(cluster)`
    * as in [[Similarity.writeIvfIndex]] and the probe filter prunes at
    * the directory listing); query time reads nprobe/nClusters of the
    * code files — m bytes a vector — and sums m table lookups each.
    *
    * Determinism matches [[pqAdcTopK]] and [[Similarity.ivfTopK]]
    * exactly: first-k-by-id seeds, quantized means, low-id tie breaks,
    * exact-long ADC ranking. Output (query_id, rank, neighbor_id,
    * adist), adist ascending within each query, self excluded.
    */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                vecCol: String, dim: Int, m: Int, ksub: Int, iters: Int,
                nClusters: Int, nprobe: Int, k: Int): DataFrame = {
    require(k > 0, s"k ($k) must be positive")
    require(nprobe > 0 && nprobe <= nClusters,
      s"nprobe ($nprobe) must be in [1, nClusters=$nClusters]")
    // coarse leg: first-k-by-id centroids, cosine routing (ivfTopK's
    // exact machinery so the q107 oracle CTEs replay it verbatim)
    val coarse = Similarity.materializeSmall(
      Similarity.ivfCentroids(corpus, idCol, vecCol, nClusters))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("__qcos").desc, col("cid").asc)
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .crossJoin(broadcast(coarse))
      .withColumn("__qcos", Similarity.cosine(col("qv"), col("centroid")))
      .withColumn("__pr", row_number().over(wProbe))
      .filter(col("__pr") <= nprobe)
      .select(col("query_id"), col("cid").as("cluster"))
    // PQ leg: codebooks, then the OFFLINE index — codes with the coarse
    // cluster carried through the encode aggregate (cluster is
    // functionally dependent on id, so widening the grouping key is
    // free): (neighbor_id, cluster, sub, code), the table a 100 TB
    // deployment persists partitionBy(cluster). No corpus⋈corpus join.
    val cents = Similarity.materializeSmall(
      pqCodebooks(corpus, idCol, vecCol, dim, m, ksub, iters))
    val subDim = dim / m
    val indexed = Similarity.ivfAssign(corpus, coarse, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col("cluster"),
        posexplode(array((0 until m).map(s =>
          slice(col(vecCol), s * subDim + 1, subDim)): _*)).as(Seq("sub", "v")))
      .join(broadcast(cents), Seq("sub"))
      .withColumn("__d2", d2(col("v"), col("cent")))
      .groupBy(col("neighbor_id"), col("cluster"), col("sub"))
      .agg(min_by(col("cid"), struct(col("__d2"), col("cid"))).as("code"))
    val lut = subvectors(queries, idCol, vecCol, dim, m, "query_id", "qv")
      .join(broadcast(cents), Seq("sub"))
      .select(col("query_id"), col("sub"), col("cid").as("code"),
        floor(lit(1000000.0) * d2(col("qv"), col("cent"))).cast("long").as("lq"))
    // query time: every join is a broadcast against the routed index —
    // probes (|q|·nprobe rows) select the clusters, the LUT scores them;
    // only the probed fraction of code rows flows into the aggregate
    val scored = indexed
      .join(broadcast(probes), Seq("cluster"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .join(broadcast(lut), Seq("query_id", "sub", "code"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("lq")).as("adist_q"))
      .withColumn("cos", -col("adist_q").cast("double"))
    Similarity.topKPerQuery(scored, k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        (-col("cos") / lit(1000000.0)).as("adist"))
  }
}
