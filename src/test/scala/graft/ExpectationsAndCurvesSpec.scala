package graft

import org.apache.spark.sql.functions._

import graft.operators.{Expectations, Quantiles, Segments, TimeAgg}
import graft.operators.Expectations._

class ExpectationsAndCurvesSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ validate

  test("validate: every rule type counts its own violations") {
    val df = Seq(
      (Some(1L), Some(10.0), "view"),
      (Some(2L), Some(999.0), "view"),   // in_range violation
      (Some(2L), Some(20.0), "Click"),   // unique + one_of + matches
      (None, Some(30.0), "view"))        // not_null violation
      .toDF("id", "value", "kind")
    val out = Expectations.validate(df, Seq(
        NotNull("id"), Unique("id"), InRange("value", 0.0, 100.0),
        OneOf("kind", Seq("view", "click")), Matches("kind", "^[a-z]+$")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(out("not_null") === ((1L, false)))
    assert(out("unique") === ((1L, false)))   // id=2 twice (null ignored)
    assert(out("in_range") === ((1L, false)))
    assert(out("one_of") === ((1L, false)))
    assert(out("matches") === ((1L, false)))
  }

  test("validate: a clean frame passes everything; empty frame passes too") {
    val clean = Seq((1L, "a"), (2L, "b")).toDF("id", "kind")
    val rules = Seq[Rule](NotNull("id"), Unique("id"),
      Matches("kind", "^[a-z]$"))
    assert(Expectations.validate(clean, rules).collect()
      .forall(_.getBoolean(3)))
    val empty = clean.filter(lit(false))
    val out = Expectations.validate(empty, rules).collect()
    assert(out.length === 3 && out.forall(r =>
      r.getLong(2) === 0L && r.getBoolean(3)))
  }

  // -------------------------------------------------- equiDepthHistogram

  test("equiDepthHistogram: balanced bins with tight integer bounds") {
    val rows = (1L to 12L).map(v => ("g", v, v))
    val out = Quantiles.equiDepthHistogram(rows.toDF("g", "v", "id"),
        "g", "v", bucketWidth = 4L, k = 3, tieCols = Seq("id"))
      .orderBy("bin").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out === Seq((0L, 1L, 4L, 4L), (1L, 5L, 8L, 4L),
      (2L, 9L, 12L, 4L)))
  }

  test("equiDepthHistogram: non-divisible counts spread the remainder") {
    val rows = (1L to 10L).map(v => ("g", v, v))
    val out = Quantiles.equiDepthHistogram(rows.toDF("g", "v", "id"),
        "g", "v", 4L, 3, Seq("id"))
      .orderBy("bin").collect().map(r => r.getLong(4)).toSeq
    assert(out.sum === 10L)
    assert(out.forall(c => c >= 3L && c <= 4L))
  }

  // ---------------------------------------------------- linearAttribution

  test("linearAttribution: equal credit within horizon, boundary inclusive") {
    val events = Seq(
      (1L, 100L, 10L, "view"),     // exactly horizon before conv: counts
      (1L, 600L, 11L, "click"),
      (1L, 1100L, 12L, "purchase"),
      (1L, 99L, 13L, "view"),      // 1 past horizon: excluded
      (2L, 500L, 20L, "purchase")) // no touches: absent
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = TimeAgg.linearAttribution(events, "user_id", "ts",
        "event_id", "event_type", "purchase", Seq("view", "click"),
        horizonMicros = 1000L)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(out === Set((10L, 2L, 500000L), (11L, 2L, 500000L)))
  }

  test("linearAttribution: a touch at the conversion instant is credited") {
    val events = Seq((1L, 500L, 1L, "view"), (1L, 500L, 2L, "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = TimeAgg.linearAttribution(events, "user_id", "ts",
        "event_id", "event_type", "purchase", Seq("view"), 100L)
      .collect()
    assert(out.length === 1 && out.head.getLong(4) === 1000000L)
  }

  // ------------------------------------------------------- vocabDiscovery

  test("vocabDiscovery: tokens count at first batch only, curve accumulates") {
    val docs = Seq(
      (0L, "a b"), (1L, "b c"),      // batch 0: new = {a, b, c}
      (2L, "c d"),                   // batch 1: new = {d}
      (4L, "a b c d"))               // batch 2: nothing new
      .toDF("doc_id", "text")
    val out = Segments.vocabDiscovery(docs, "doc_id", "text", batchSize = 2L)
      .orderBy("batch").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out === Seq((0L, 3L, 3L), (1L, 1L, 4L), (2L, 0L, 4L)))
  }
}
