package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Similarity-graph analytics over kNN frames — the graph layer a
  * curation pipeline builds ON TOP of ANN results: mutual-edge
  * extraction, triangle counting, local clustering coefficients
  * (community density of each item's neighborhood), and bounded-round
  * label propagation for semi-supervised labeling from a small seed
  * set.
  *
  * Everything is expressed over edge frames with degree bounded by the
  * kNN's k, which is what makes the classically-scary ops (triangle
  * join) linear-ish: wedge count is Σ deg² ≤ n·k², never corpus².
  */
object Graph {

  /** Undirected mutual-kNN edges from a directed knn frame
    * `(query_id, neighbor_id)`: an edge survives iff BOTH directions
    * are present (the standard symmetrization that kills hub-induced
    * one-way edges), emitted once with `a < b`.
    */
  def mutualEdges(knn: DataFrame): DataFrame = {
    val d = knn.select(col("query_id").as("a"), col("neighbor_id").as("b"))
      .distinct()
    val rev = d.select(col("b").as("a"), col("a").as("b"))
    d.join(rev, Seq("a", "b"), "left_semi")
      .filter(col("a") < col("b"))
  }

  /** Per-vertex triangle counts and local clustering coefficients over
    * an undirected edge frame (`a < b` canonical form, deduplicated).
    *
    * Triangles enumerate once each as ordered (x < y < z): wedges
    * (x,y)+(x,z) with y < z close on edge (y,z). Per-vertex count =
    * triangles touching the vertex; local clustering coefficient =
    * 2·T_v / (deg_v·(deg_v−1)), quantized ⌊10⁶·⌋, 0 when deg < 2.
    *
    * Scale shape: the wedge build is a self-equi-join on the lower
    * endpoint (Σ deg² rows — bounded by n·k² on a kNN graph), the
    * closing check one more equi-join; per-vertex aggregation is a
    * hash agg over exploded triangle corners. A power-law hub in a
    * GENERAL graph makes Σ deg² quadratic — on symmetrized kNN input
    * degrees are capped at k by construction, which is the documented
    * contract.
    *
    * @return (id, degree, triangles, clustering_q)
    */
  def triangleStats(edges: DataFrame): DataFrame = {
    val e = edges.select(col("a"), col("b"))
    val deg = e.select(col("a").as("id"))
      .unionByName(e.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("degree"))
    val wedges = e.select(col("a").as("x"), col("b").as("y"))
      .join(e.select(col("a").as("x"), col("b").as("z")), Seq("x"))
      .filter(col("y") < col("z"))
    val tri = wedges.join(e.select(col("a").as("y"), col("b").as("z")),
      Seq("y", "z"))
    val perVertex = tri.select(explode(array(col("x"), col("y"), col("z")))
        .as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("triangles"))
    deg.join(perVertex, Seq("id"), "left")
      .na.fill(0L, Seq("triangles"))
      .withColumn("clustering_q",
        when(col("degree") >= 2,
          floor(lit(1000000.0) * (lit(2L) * col("triangles")).cast("double") /
            (col("degree") * (col("degree") - 1)).cast("double"))
            .cast("long"))
          .otherwise(lit(0L)))
  }

  /** Bounded-round label propagation from a seed set: each round,
    * every still-unlabeled vertex adopts the MAJORITY label among its
    * already-labeled kNN neighbors (ties → smallest label); seeds and
    * previously-assigned labels are clamped. Returns one row per
    * labeled vertex with the round it was assigned (0 = seed).
    * Vertices unreached within `rounds` are absent — the caller
    * decides their fate (human review, default bucket).
    *
    * Plan: `rounds` driver-composed iterations, each = one equi-join
    * of the edge frame against the current label table + one hash
    * aggregate + one bounded per-vertex window (≤ distinct labels
    * rows per vertex). Label table grows monotonically; the join is
    * label-table-sized, not corpus-sized, on early rounds.
    */
  def labelPropagate(knn: DataFrame, seeds: DataFrame, idCol: String,
                     labelCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds ($rounds) must be >= 1")
    val edges = knn.select(col("query_id").as("__v"),
      col("neighbor_id").as("__n"))
    val seed = seeds.select(col(idCol).as("__v"),
      col(labelCol).as("label"), lit(0).as("round_assigned"))
    (1 to rounds).foldLeft(seed) { (labels, round) =>
      val votes = edges
        .join(labels.select(col("__v").as("__n"), col("label")), Seq("__n"))
        .join(labels.select(col("__v")), Seq("__v"), "left_anti")
        .groupBy(col("__v"), col("label"))
        .agg(count(lit(1)).as("__c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__v"))
        .orderBy(col("__c").desc, col("label").asc)
      val newly = votes.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("__v"), col("label"), lit(round).as("round_assigned"))
      labels.unionByName(newly)
    }.withColumnRenamed("__v", idCol)
  }
}
