package graft

import org.apache.spark.sql.functions._

import graft.operators.{Robust, TimeAgg}

class RobustSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------- pareto

  private def frontier(pts: Seq[(Long, Long)]): Set[(Long, Long)] =
    Robust.paretoFrontier(pts.toDF("x", "y"), "x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("paretoFrontier: hand case with interior, tied, and corner points") {
    // (5,1) and (1,5) are corners; (3,3) survives (nothing has both ≥);
    // (2,2) dominated by (3,3); (5,0) dominated by (5,1) (same x, lower y);
    // (0,5) dominated by (1,5)
    assert(frontier(Seq((5L, 1L), (1L, 5L), (3L, 3L), (2L, 2L), (5L, 0L),
      (0L, 5L))) === Set((5L, 1L), (1L, 5L), (3L, 3L)))
  }

  test("paretoFrontier: duplicates of a frontier point are one distinct row") {
    assert(frontier(Seq((4L, 4L), (4L, 4L), (1L, 1L))) === Set((4L, 4L)))
  }

  test("paretoFrontier: a single dominating point collapses the frontier") {
    assert(frontier(Seq((9L, 9L), (9L, 8L), (8L, 9L), (1L, 1L))) ===
      Set((9L, 9L)))
  }

  test("paretoFrontier: totally ordered chain keeps only the top") {
    assert(frontier((1L to 20L).map(i => (i, i))) === Set((20L, 20L)))
  }

  test("paretoFrontier: anti-chain keeps everything") {
    val anti = (1L to 10L).map(i => (i, 11L - i))
    assert(frontier(anti) === anti.toSet)
  }

  test("paretoFrontier: matches the quadratic definition on random data") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val naive = pts.distinct.filter { case (x, y) =>
      !pts.exists { case (x2, y2) =>
        x2 >= x && y2 >= y && (x2 > x || y2 > y) }
    }.toSet
    assert(frontier(pts) === naive)
  }

  // ------------------------------------------------------------------ mad

  test("madOutliers: hand-computed lower medians and fence") {
    // group g: values 1,2,3,4,100 → lower median rank ceil(5/2)=3 → med=3
    // devs |v-3| = 2,1,0,1,97 sorted 0,1,1,2,97 → mad (rank 3) = 1
    // outliers: dev > 3·1 → only 97 → 1
    val df = Seq(("g", 1L), ("g", 2L), ("g", 3L), ("g", 4L), ("g", 100L))
      .toDF("k", "v")
    val r = Robust.madOutliers(df, "k", "v", bucketWidth = 10L).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ===
      ((5L, 3L, 1L, 1L)))
  }

  test("madOutliers: constant group has mad 0 and every deviation flagged") {
    // all devs 0, mad 0, fence 0 → nothing exceeds it strictly
    val df = Seq(("c", 7L), ("c", 7L), ("c", 7L)).toDF("k", "v")
    val row = Robust.madOutliers(df, "k", "v", 10L).collect().head
    assert((row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4))
      === ((3L, 7L, 0L, 0L)))
  }

  test("madOutliers: even count takes the lower median") {
    // values 1,2,3,4: rank ceil(4/2)=2 → med=2; devs 1,0,1,2 sorted
    // 0,1,1,2 → mad rank 2 = 1; outliers dev>3: none
    val df = Seq(("g", 1L), ("g", 2L), ("g", 3L), ("g", 4L)).toDF("k", "v")
    val row = Robust.madOutliers(df, "k", "v", 2L).collect().head
    assert((row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4))
      === ((4L, 2L, 1L, 0L)))
  }

  // --------------------------------------------------------- sessionPaths

  test("sessionPaths: gap splits sessions, k truncates, order is by rank") {
    // user 1: a@0, b@10, c@2000 (gap>1000 splits) → paths "a>b", "c"
    // user 2: b@0, a@1 → "b>a"
    val df = Seq((1L, 0L, "a", 1L), (1L, 10L, "b", 2L), (1L, 2000L, "c", 3L),
      (2L, 0L, "b", 4L), (2L, 1L, "a", 5L))
      .toDF("user_id", "ts_us", "event_type", "event_id")
    val out = TimeAgg.sessionPaths(df, "user_id", "ts_us", "event_type",
      "event_id", gapMicros = 1000L, k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out === Set(("a>b", 1L, 1L), ("c", 1L, 1L), ("b>a", 1L, 1L)))
  }

  test("sessionPaths: identical paths across users aggregate with n_users") {
    val df = Seq((1L, 0L, "x", 1L), (2L, 0L, "x", 2L), (3L, 0L, "x", 3L))
      .toDF("user_id", "ts_us", "event_type", "event_id")
    val out = TimeAgg.sessionPaths(df, "user_id", "ts_us", "event_type",
      "event_id", 1000L, 3).collect()
    assert(out.length === 1)
    assert((out.head.getString(0), out.head.getLong(1), out.head.getLong(2))
      === (("x", 3L, 3L)))
  }

  test("sessionPaths: k truncation keeps the FIRST k events in time order") {
    val df = (1L to 6L).map(i => (1L, i, ('a' + i.toInt - 1).toChar.toString, i))
      .toDF("user_id", "ts_us", "event_type", "event_id")
    val out = TimeAgg.sessionPaths(df, "user_id", "ts_us", "event_type",
      "event_id", 1000L, 3).collect()
    assert(out.head.getString(0) === "a>b>c")
  }
}
