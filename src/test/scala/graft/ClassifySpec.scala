package graft

import org.apache.spark.sql.functions._

import graft.operators.{Classify, Stats}

class ClassifySpec extends SparkSpec {
  import spark.implicits._

  test("decisionStump: perfectly separable data scores 1e12 at the " +
      "boundary value") {
    val df = Seq((1L, true), (2L, true), (3L, false), (4L, false))
      .toDF("x", "y")
    val r = Classify.decisionStump(df, "x", col("y")).collect().head
    assert(r.getLong(0) === 2L)                       // threshold
    assert((r.getLong(1), r.getLong(2)) === ((2L, 2L))) // left: all pos
    assert((r.getLong(3), r.getLong(4)) === ((2L, 0L))) // right: all neg
    assert(r.getLong(5) === 1000000000000L)
  }

  test("decisionStump: uninformative feature ties -> smallest threshold") {
    // every split leaves a 50/50 mix on both sides
    val df = Seq((1L, true), (1L, false), (2L, true), (2L, false),
      (3L, true), (3L, false)).toDF("x", "y")
    val r = Classify.decisionStump(df, "x", col("y")).collect().head
    assert(r.getLong(0) === 1L) // tie-break: lowest candidate value
    assert(r.getLong(5) === 500000000000L) // score = 1/2 for any mix-even split
  }

  test("decisionStump: max value is never a candidate threshold") {
    val df = Seq((5L, true), (5L, false)).toDF("x", "y")
    assert(Classify.decisionStump(df, "x", col("y")).collect().isEmpty)
  }

  test("naiveBayes: class-exclusive vocabulary classifies both ways; " +
      "OOV-only doc falls back to the prior tie-break") {
    val train = Seq((0L, "x x y", "A"), (2L, "z z w", "B"))
      .toDF("doc_id", "text", "cls")
    val test = Seq((1L, "x x"), (3L, "z"), (5L, "qqq qqq"))
      .toDF("doc_id", "text")
    val out = Classify.naiveBayes(train, test, "doc_id", "text", "cls")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "A")
    assert(out(3L) === "B")
    // equal priors, equal T_c + V penalty -> tie on score, name asc
    assert(out(5L) === "A")
  }

  test("naiveBayes: every test doc gets exactly one prediction, " +
      "including the empty-text doc") {
    val train = Seq((0L, "a b c", "A"), (2L, "d e f", "B"))
      .toDF("doc_id", "text", "cls")
    val test = Seq((1L, "a d"), (3L, ""), (5L, "f f"))
      .toDF("doc_id", "text")
    val out = Classify.naiveBayes(train, test, "doc_id", "text", "cls")
    assert(out.count() === 3L)
    assert(out.select("doc_id").distinct().count() === 3L)
  }

  test("distanceCorrelation: identical columns give exactly 1e6, " +
      "constant column gives NULL") {
    val df = (0L to 9L).map(i => (i, i % 5, i % 5)).toDF("id", "x", "y")
    val r = Stats.distanceCorrelation(df, "id", "x", "y", cap = 10)
      .collect().head
    assert(r.getLong(0) === 10L)
    assert(r.getLong(1) === 1000000L)
    val c = (0L to 9L).map(i => (i, i, 7L)).toDF("id", "x", "y")
    val rc = Stats.distanceCorrelation(c, "id", "x", "y", cap = 10)
      .collect().head
    assert(rc.isNullAt(1))
  }

  test("distanceCorrelation: balanced 2x2 design is independent " +
      "(dCor^2 ~ 0) and the cap bounds the sample") {
    val df = Seq((1L, 0L, 0L), (2L, 0L, 1L), (3L, 1L, 0L), (4L, 1L, 1L))
      .toDF("id", "x", "y")
    val r = Stats.distanceCorrelation(df, "id", "x", "y", cap = 4)
      .collect().head
    assert(math.abs(r.getLong(1)) <= 1)
    val capped = Stats.distanceCorrelation(
      (0L to 99L).map(i => (i, i, i * 2)).toDF("id", "x", "y"),
      "id", "x", "y", cap = 16).collect().head
    assert(capped.getLong(0) === 16L)
  }
}
