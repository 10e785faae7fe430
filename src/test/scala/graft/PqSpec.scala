package graft

import org.apache.spark.sql.functions._

import graft.operators.Pq

class PqSpec extends SparkSpec {
  import spark.implicits._

  // two tight groups per subspace half: codebooks must separate them
  private val vecs = Seq(
    (1L, Seq(1.0f, 0.0f, 5.0f, 5.0f)),
    (2L, Seq(0.0f, 1.0f, -5.0f, -5.0f)),
    (3L, Seq(0.9f, 0.1f, 5.1f, 4.9f)),
    (4L, Seq(0.1f, 0.9f, -4.9f, -5.1f)),
    (5L, Seq(0.95f, 0.05f, 4.8f, 5.2f)),
    (6L, Seq(0.05f, 0.95f, -5.2f, -4.8f)))
    .toDF("vec_id", "embedding")

  test("pqCodebooks: one codebook per subspace; training is partition-order free") {
    val a = Pq.pqCodebooks(vecs, "vec_id", "embedding",
      dim = 4, m = 2, ksub = 2, iters = 2)
      .as[(Int, Long, Seq[Double])].collect().sortBy(t => (t._1, t._2))
    assert(a.map(_._1).distinct.toSeq === Seq(0, 1))
    assert(a.forall(_._3.length == 2))
    val b = Pq.pqCodebooks(vecs.repartition(7), "vec_id", "embedding",
      dim = 4, m = 2, ksub = 2, iters = 2)
      .as[(Int, Long, Seq[Double])].collect().sortBy(t => (t._1, t._2))
    assert(a.toSeq === b.toSeq)
    intercept[IllegalArgumentException] {
      Pq.pqCodebooks(vecs, "vec_id", "embedding", dim = 4, m = 3, ksub = 2, iters = 1)
    }
  }

  test("pqEncode: same-group vectors share codes, cross-group differ") {
    val cents = Pq.pqCodebooks(vecs, "vec_id", "embedding",
      dim = 4, m = 2, ksub = 2, iters = 2)
    val codes = Pq.pqEncode(vecs, cents, "vec_id", "embedding", dim = 4, m = 2)
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).map { case (id, rows) =>
        id -> rows.sortBy(_._2).map(_._3).toSeq }
    // ids 1,3,5 cluster together in BOTH subspaces; 2,4,6 likewise
    assert(codes(1L) === codes(3L) && codes(3L) === codes(5L))
    assert(codes(2L) === codes(4L) && codes(4L) === codes(6L))
    assert(codes(1L) !== codes(2L))
  }

  test("pqAdcTopK: nearest neighbors come from the query's own group; self excluded") {
    val r = Pq.pqAdcTopK(vecs.filter(col("vec_id") === 1), vecs,
      "vec_id", "embedding", dim = 4, m = 2, ksub = 2, iters = 2, k = 2)
      .as[(Long, Int, Long, Double)].collect().sortBy(_._2)
    assert(r.length === 2)
    assert(!r.exists(_._3 == 1L))
    // group of 1 = {3, 5}: both ADC-closer than any cross-group vector
    assert(r.map(_._3).toSet === Set(3L, 5L))
    // distances ranked ascending
    assert(r(0)._4 <= r(1)._4)
    intercept[IllegalArgumentException] {
      Pq.pqAdcTopK(vecs, vecs, "vec_id", "embedding",
        dim = 4, m = 2, ksub = 2, iters = 1, k = 0)
    }
  }

  test("pqAdcTopK is deterministic across partitionings (quantized ADC)") {
    val a = Pq.pqAdcTopK(vecs.filter(col("vec_id") <= 2), vecs,
      "vec_id", "embedding", dim = 4, m = 2, ksub = 2, iters = 1, k = 3)
      .orderBy("query_id", "rank").collect().toSeq
    val b = Pq.pqAdcTopK(vecs.filter(col("vec_id") <= 2), vecs.repartition(5),
      "vec_id", "embedding", dim = 4, m = 2, ksub = 2, iters = 1, k = 3)
      .orderBy("query_id", "rank").collect().toSeq
    assert(a === b)
  }

  test("ivfPqTopK: probing every cluster reproduces full PQ ADC exactly") {
    // nprobe = nClusters ⇒ the coarse leg prunes nothing; the composed
    // operator must equal pqAdcTopK bit-for-bit (same codebooks, same
    // quantized ADC ranking)
    val full = Pq.pqAdcTopK(vecs.filter(col("vec_id") <= 2), vecs,
      "vec_id", "embedding", dim = 4, m = 2, ksub = 2, iters = 1, k = 3)
      .orderBy("query_id", "rank").collect().toSeq
    val composed = Pq.ivfPqTopK(vecs.filter(col("vec_id") <= 2), vecs,
      "vec_id", "embedding", dim = 4, m = 2, ksub = 2, iters = 1,
      nClusters = 2, nprobe = 2, k = 3)
      .orderBy("query_id", "rank").collect().toSeq
    assert(composed === full)
  }

  test("ivfPqTopK: nprobe=1 restricts candidates to the routed cluster") {
    // coarse centroids = vecs 1 and 2, one per group; query 1 routes to
    // its own group's cluster, so only {3, 5} are reachable
    val r = Pq.ivfPqTopK(vecs.filter(col("vec_id") === 1), vecs,
      "vec_id", "embedding", dim = 4, m = 2, ksub = 2, iters = 1,
      nClusters = 2, nprobe = 1, k = 5)
      .as[(Long, Int, Long, Double)].collect().sortBy(_._2)
    assert(r.map(_._3).toSet === Set(3L, 5L))
    assert(r.map(_._4).toSeq === r.map(_._4).sorted.toSeq)
    intercept[IllegalArgumentException] {
      Pq.ivfPqTopK(vecs, vecs, "vec_id", "embedding", dim = 4, m = 2,
        ksub = 2, iters = 1, nClusters = 2, nprobe = 3, k = 1)
    }
  }

  test("ivfPqTopK is deterministic across partitionings") {
    val a = Pq.ivfPqTopK(vecs.filter(col("vec_id") <= 2), vecs,
      "vec_id", "embedding", dim = 4, m = 2, ksub = 2, iters = 1,
      nClusters = 2, nprobe = 1, k = 3)
      .orderBy("query_id", "rank").collect().toSeq
    val b = Pq.ivfPqTopK(vecs.filter(col("vec_id") <= 2), vecs.repartition(5),
      "vec_id", "embedding", dim = 4, m = 2, ksub = 2, iters = 1,
      nClusters = 2, nprobe = 1, k = 3)
      .orderBy("query_id", "rank").collect().toSeq
    assert(a === b)
  }
}
