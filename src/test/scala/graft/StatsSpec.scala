package graft

import graft.operators.Stats

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("dimCovariance: identical dims covary, independent dims near zero") {
    // dim1 == dim2 exactly; dim3 constant (zero variance, zero cov)
    val df = Seq(
      (1L, Seq(1f, 1f, 5f)), (2L, Seq(2f, 2f, 5f)), (3L, Seq(3f, 3f, 5f)))
      .toDF("vec_id", "embedding")
    val out = Stats.dimCovariance(df, "embedding", dims = 3)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(3)).toMap
    // var over {1,2,3} = 2/3 → 666666-ish on the 1e-6 grid
    assert(out((1, 1)) === out((1, 2)))
    assert(out((1, 1)) === out((2, 2)))
    assert(math.abs(out((1, 1)) - 666666L) <= 2)
    assert(out((3, 3)) === 0L)
    assert(math.abs(out((1, 3))) <= 1) // constant dim: no covariance
  }

  test("pearson: perfect linear relation gives +-1, constants give null") {
    val rows = Seq(("up", 1L, 10L), ("up", 2L, 20L), ("up", 3L, 30L),
      ("down", 1L, 30L), ("down", 2L, 20L), ("down", 3L, 10L),
      ("flat", 1L, 7L), ("flat", 2L, 7L), ("flat", 3L, 7L))
    val out = Stats.pearson(rows.toDF("g", "x", "y"), "g", "x", "y")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(out("up") === Some(1000000L))
    // exact -1 computes as -1.0000000000000002 in fp (cov and the sqrt
    // product round differently), so the floor lands one grid step low
    // — deterministic on both engines, which is what the gate checks
    assert(out("down") === Some(-1000001L))
    assert(out("flat") === None)
  }

  test("ewmaSmooth: hand-computed truncated chain") {
    val rows = Seq(("g", 1L, 4L), ("g", 2L, 2L), ("g", 3L, 8L))
    val out = Stats.ewmaSmooth(rows.toDF("g", "b", "x"), "g", "b", "x",
        window = 2)
      .orderBy("b").collect().map(_.getLong(3)).toSeq
    // b1: 4/2 = 2.0; b2: 2/2 + 4/4 = 2.0; b3: 8/2 + 2/4 = 4.5
    assert(out === Seq(2000000L, 2000000L, 4500000L))
  }

  test("simpson: uniform mix vs single-category concentration") {
    val rows = Seq(("a", "en"), ("a", "fr"), ("b", "en"), ("b", "en"))
    val out = Stats.simpson(rows.toDF("g", "lang"), "g", "lang")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("a") === ((2L, 2L, 500000L))) // two uniform cats: 1/2
    assert(out("b") === ((2L, 1L, 1000000L))) // one cat: 1
  }
}
