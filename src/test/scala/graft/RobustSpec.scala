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

  // ---------------------------------------------------------------- ksDrift

  private def ks(rows: Seq[(String, Long)]): Map[String, (Long, Long, Long)] =
    Robust.ksDrift(rows.toDF("g", "v"), "g", "v").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("ksDrift: identical distributions show zero drift") {
    val rows = for (g <- Seq("a", "b"); v <- 1L to 10L) yield (g, v)
    assert(ks(rows) === Map("a" -> ((10L, 10L, 0L)), "b" -> ((10L, 10L, 0L))))
  }

  test("ksDrift: disjoint supports reach the maximum statistic") {
    // a: all below, b: all above — D = 1 → ks_q = 1_000_000
    val rows = (1L to 5L).map(v => ("a", v)) ++ (11L to 15L).map(v => ("b", v))
    val out = ks(rows)
    assert(out("a") === ((5L, 5L, 1000000L)))
    assert(out("b") === ((5L, 5L, 1000000L)))
  }

  test("ksDrift: a single group has no complement and reports zero") {
    assert(ks(Seq(("only", 1L), ("only", 2L))) ===
      Map("only" -> ((2L, 0L, 0L))))
  }

  test("ksDrift: hand-computed two-group gap") {
    // a = {1,1,2}, b = {2,3}: at v=1 |cum_a·nb − cum_b·na| = |2·2−0·3| = 4
    //                         at v=2 |3·2 − 1·3| = 3, at v=3 |3·2−2·3| = 0
    // D = 4/(3·2) → ks_q = 666_666
    val out = ks(Seq(("a", 1L), ("a", 1L), ("a", 2L), ("b", 2L), ("b", 3L)))
    assert(out("a") === ((3L, 2L, 666666L)))
  }

  // ------------------------------------------------------------ looInfluence

  test("looInfluence: removal algebra matches the direct recomputation") {
    val rows = Seq(("a", 10L), ("a", 20L), ("b", 40L), ("b", 50L), ("c", 30L))
    val out = Robust.looInfluence(rows.toDF("g", "v"), "g", "v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // mean_all = 150/5 = 30 → 30_000_000
    // without a: 120/3 = 40; without b: 60/3 = 20; without c: 120/4 = 30
    assert(out("a") === ((30000000L, 40000000L, 10000000L)))
    assert(out("b") === ((30000000L, 20000000L, -10000000L)))
    assert(out("c") === ((30000000L, 30000000L, 0L)))
  }

  test("looInfluence: a group covering the whole corpus reports nulls") {
    val out = Robust.looInfluence(Seq(("a", 5L), ("a", 7L)).toDF("g", "v"),
      "g", "v").collect().head
    assert(!out.isNullAt(2) && out.isNullAt(3) && out.isNullAt(4))
  }

  // --------------------------------------------------------------- theilSen

  test("theilSen: median slope ignores a wild outlier point") {
    // y = 2x on x=0..2 plus an outlier (3, 100): 4 of 6 pair slopes
    // are exactly 2 → the median stays 2 on the 1e-6 grid
    val rows = Seq(("g", 0L, 0L), ("g", 1L, 2L), ("g", 2L, 4L),
      ("g", 3L, 100L), ("solo", 9L, 9L))
    val out = Robust.theilSen(rows.toDF("g", "x", "y"), "g", "x", "y")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out("g") === ((6L, 2000000L)))
    assert(!out.contains("solo")) // < 2 points: no slope
  }

  test("theilSen: negative slopes floor correctly on the grid") {
    // two points, dy=-1 over dx=3: floor(-1e6/3) = -333334 (floor, not
    // truncation — the DuckDB // twin agrees)
    val out = Robust.theilSen(Seq(("g", 0L, 1L), ("g", 3L, 0L))
      .toDF("g", "x", "y"), "g", "x", "y").collect().head
    assert(out.getLong(1) === 1L)
    assert(out.getLong(2) === -333334L)
  }

  // -------------------------------------------------------------- hillTail

  test("hillTail: exact Pareto tail recovers the exponent") {
    // X_(i) = 2^(10-i): ln(X_(i)/X_(k+1)) = (k+1-i)·ln2 — H = ln2·(k+1)/2k
    val vals = (0 to 9).map(i => ("g", 1L << i))
    val out = Robust.hillTail(vals.toDF("g", "v"), "g", "v", k = 4)
      .collect().head
    assert(out.getLong(1) === 4L)          // n_tail = k
    assert(out.getLong(2) === (1L << 5))   // x_ref = the 5th largest
    // terms: ln16, ln8, ln4, ln2 → H = (4+3+2+1)/4 · ln2 = 2.5·ln2
    val want = (1 to 4).map(j =>
      math.floor(1.0e12 * math.log((1L << j).toDouble / 1.0)).toLong).sum / 4
    assert(out.getLong(3) === want)
  }

  test("hillTail: non-positive values excluded; tiny groups dropped") {
    val rows = Seq(("a", 8L), ("a", 4L), ("a", 0L), ("a", -2L),
      ("b", 5L))
    val out = Robust.hillTail(rows.toDF("g", "v"), "g", "v", k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // group a: two positives → one tail sample ln(8/4)
    assert(out("a") === math.floor(1.0e12 * math.log(2.0)).toLong)
    assert(!out.contains("b")) // a single value has no tail
  }

  // ---------------------------------------------------------- binsegSplit

  test("binsegSplit: finds the level shift, means exact") {
    // series 1,1,1,9,9 — split after position 3
    val rows = (1 to 5).map(t => ("g", t.toLong, if (t <= 3) 1L else 9L))
    val out = TimeAgg.binsegSplit(rows.toDF("g", "b", "x"),
      "g", "b", "x").collect().head
    assert(out.getLong(1) === 5L)          // n_buckets
    assert(out.getLong(2) === 3L)          // split_after bucket 3
    assert(out.getLong(3) === 3L)          // n_left
    assert(out.getLong(5) === 1000000L)    // mean_left = 1
    assert(out.getLong(6) === 9000000L)    // mean_right = 9
  }

  test("binsegSplit: flat series ties break to the earliest split") {
    val rows = (1 to 4).map(t => ("g", t.toLong, 5L))
    val out = TimeAgg.binsegSplit(rows.toDF("g", "b", "x"),
      "g", "b", "x").collect().head
    assert(out.getLong(4) === 0L) // zero variance reduction everywhere
    assert(out.getLong(2) === 1L) // t ASC tie-break
  }

  // ------------------------------------------------------------------ rfm

  test("rfmSegments: exact-rank bins, monetary in exact cents") {
    // 4 users, k=2: bins split 2/2 on each metric
    val rows = Seq(
      (1L, 100L, 1.50), (1L, 200L, 1.50), // u1: last 200, freq 2, 3.00
      (2L, 400L, 0.25),                   // u2: last 400, freq 1, 0.25
      (3L, 300L, 9.99), (3L, 50L, 0.01),  // u3: last 300, freq 2, 10.00
      (4L, 150L, 2.00))                   // u4: last 150, freq 1, 2.00
    val out = TimeAgg.rfmSegments(rows.toDF("u", "ts_us", "v"),
        "u", "ts_us", "v", k = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getLong(7)))).toMap
    // recency asc: u4(150) u1(200) u3(300) u2(400) → bins 1,1,2,2
    // freq asc (ties by user): u2(1) u4(1) u1(2) u3(2) → 1,1,2,2
    // monetary asc: u2(25) u4(200) u1(300) u3(1000) → 1,1,2,2
    assert(out(1L) === ((300L, 1L, 2L, 2L, 122L)))
    assert(out(2L) === ((25L, 2L, 1L, 1L, 211L)))
    assert(out(3L) === ((1000L, 2L, 2L, 2L, 222L)))
    assert(out(4L) === ((200L, 1L, 1L, 1L, 111L)))
  }

  test("hodgesLehmann: hand case {1,2,3} -> HL = 2; robust to the " +
      "outlier in {0,0,10}") {
    val df = Seq(("g", 1L), ("g", 2L), ("g", 3L)).toDF("grp", "x")
    val r = Robust.hodgesLehmann(df, "grp", "x").collect().head
    // 6 Walsh pairs; lower median of doubled sums {2,3,4,4,5,6} is 4
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((6L, 4L, 2000000L)))
    val sk = Seq(("g", 0L), ("g", 0L), ("g", 10L)).toDF("grp", "x")
    val rs = Robust.hodgesLehmann(sk, "grp", "x").collect().head
    assert(rs.getLong(2) === 0L) // HL stays at 0, mean would be 3.33
  }

  test("gpdMomFit: exponential-ish exceedances give xi near 0, " +
      "degenerate spread gives NULL") {
    // group g: values 1..100 -> p90 rank 90 -> u = 90, exceedances
    // {1..10}: m = 5.5, var = 8.25, r = 3.666.. -> xi = (1-r)/2 < 0
    val df = (1L to 100L).map(v => ("g", v)).toDF("grp", "x")
    val r = Robust.gpdMomFit(df, "grp", "x", bucketWidth = 10L)
      .collect().head
    assert(r.getLong(1) === 90L && r.getLong(2) === 10L)
    val m = 5.5; val va = 38.5 - m * m; val rr = m * m / va
    assert(r.getLong(3) ===
      math.floor(1e6 * (1.0 - rr) / 2.0).toLong)
    assert(r.getLong(4) ===
      math.floor(1e6 * m * (1.0 + rr) / 2.0).toLong)
    // constant exceedances: var 0 -> NULLs (u = rank-18 value = 18,
    // the two 50s exceed it with zero spread)
    val c = ((1L to 18L).map(v => ("h", v)) ++ Seq.fill(2)(("h", 50L)))
      .toDF("grp", "x")
    val rc = Robust.gpdMomFit(c, "grp", "x", bucketWidth = 10L)
      .collect().head
    assert(rc.isNullAt(3) && rc.isNullAt(4))
  }

  test("tukeyFences: integer-rank quartiles and doubled fence " +
      "comparisons flag exactly the planted outlier") {
    val clean = (1L to 8L).map(v => ("g", v)).toDF("g", "v")
    val rc = Robust.tukeyFences(clean, "g", "v").collect().head
    assert((rc.getLong(1), rc.getLong(2), rc.getLong(3), rc.getLong(4))
      === ((8L, 2L, 4L, 6L)))
    assert((rc.getLong(5), rc.getLong(6)) === ((0L, 0L)))
    val dirty = ((1L to 7L).map(v => ("g", v)) :+ (("g", 100L)))
      .toDF("g", "v")
    val rd = Robust.tukeyFences(dirty, "g", "v").collect().head
    assert((rd.getLong(2), rd.getLong(4)) === ((2L, 6L)))
    assert((rd.getLong(5), rd.getLong(6)) === ((0L, 1L)))
  }

  test("siegelSlope: exact on a clean line and immune to one wild " +
      "point (repeated medians)") {
    val clean = (0L to 4L).map(t => ("g", t, 2 * t)).toDF("g", "t", "y")
    val rc = Robust.siegelSlope(clean, "g", "t", "y").collect().head
    assert(rc.getLong(2) === 2000000L)
    val dirty = Seq(("g", 0L, 0L), ("g", 1L, 2L), ("g", 2L, 4L),
      ("g", 3L, 100L), ("g", 4L, 8L)).toDF("g", "t", "y")
    val rd = Robust.siegelSlope(dirty, "g", "t", "y").collect().head
    assert(rd.getLong(2) === 2000000L) // the outlier's row is outvoted
  }

  test("hodgesLehmann: even run picks the LOWER median pair") {
    // {1,3}: walsh doubled {2,4,6}, T=3, k=2 -> s2=4 -> HL=2
    val df = Seq(("g", 1L), ("g", 3L)).toDF("grp", "x")
    val r = Robust.hodgesLehmann(df, "grp", "x").collect().head
    assert((r.getLong(1), r.getLong(2)) === ((3L, 4L)))
  }

  test("wasserstein1: interleaved pair hand-checked; identical " +
      "distributions score 0; a pure shift scores the shift") {
    val d = Seq(("a", 1L), ("a", 3L), ("b", 2L), ("b", 4L)).toDF("g", "x")
    val r = Robust.wasserstein1(d, "g", "x", "a", "b").collect().head
    assert((r.getLong(0), r.getLong(1)) === ((2L, 2L)))
    assert(r.getDecimal(2).longValue === 4L && r.getLong(3) === 1000000L)
    val same = Seq(("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L))
      .toDF("g", "x")
    assert(Robust.wasserstein1(same, "g", "x", "a", "b")
      .collect().head.getLong(3) === 0L)
    // b = a + 5 exactly: W1 = 5
    val shift = Seq(("a", 1L), ("a", 2L), ("b", 6L), ("b", 7L))
      .toDF("g", "x")
    assert(Robust.wasserstein1(shift, "g", "x", "a", "b")
      .collect().head.getLong(3) === 5000000L)
  }

  test("cramerVonMises: interleaved pair hand-checked; identical " +
      "distributions score 0") {
    val d = Seq(("a", 1L), ("a", 3L), ("b", 2L), ("b", 4L)).toDF("g", "x")
    val r = Robust.cramerVonMises(d, "g", "x", "a", "b").collect().head
    // T = nm/N^2 * sum (F_A - F_B)^2 = 4/16 * 0.5 = 0.125
    assert(r.getDecimal(2).longValue === 8L && r.getLong(3) === 125000L)
    val same = Seq(("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L))
      .toDF("g", "x")
    assert(Robust.cramerVonMises(same, "g", "x", "a", "b")
      .collect().head.getLong(3) === 0L)
  }

  test("energyDistance: hand-checked vs the pairwise definition; " +
      "identical distributions score 0") {
    // A={0,2}, B={1,3}: 2E|X-Y| - E|X-X'| - E|Y-Y'| = 3 - 1 - 1 = 1
    val d = Seq(("a", 0L), ("a", 2L), ("b", 1L), ("b", 3L)).toDF("g", "x")
    val r = Robust.energyDistance(d, "g", "x", "a", "b").collect().head
    assert((r.getLong(0), r.getLong(1)) === ((2L, 2L)))
    assert((r.getDecimal(2).longValue, r.getDecimal(3).longValue,
      r.getDecimal(4).longValue) === ((6L, 4L, 4L)))
    assert(r.getLong(5) === 1000000L)
    val same = Seq(("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L))
      .toDF("g", "x")
    assert(Robust.energyDistance(same, "g", "x", "a", "b")
      .collect().head.getLong(5) === 0L)
  }

  test("yuenTrimmed: hand-checked 20% trim on 1..10 vs 2..11; outlier " +
      "immunity the plain mean lacks") {
    import spark.implicits._
    val a = (1L to 10L).map(("a", _)); val b = (2L to 11L).map(("b", _))
    val r = Robust.yuenTrimmed((a ++ b).toDF("g", "v"), "g", "v",
      "a", "b").collect().head
    // g=2, h=6, trimmed sums 33/39; SSW·n = 10·345 − 55² = 425 each
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((10L, 10L, 6L, 6L)))
    assert((r.getLong(4), r.getLong(5)) === ((33L, 39L)))
    val d = 425.0 / (10.0 * 6.0 * 5.0)
    assert(r.getLong(6) === math.floor(1.0e6 *
      (33.0 / 6.0 - 39.0 / 6.0) / math.sqrt(d + d)).toLong)
    // a 1e6 outlier replacing 11 lands in the trimmed/clamped tail:
    // every reported number is IDENTICAL — the robustness contract
    val bo = b.dropRight(1) :+ (("b", 1000000L))
    val ro = Robust.yuenTrimmed((a ++ bo).toDF("g", "v"), "g", "v",
      "a", "b").collect().head
    assert(ro.getLong(5) === 39L && ro.getLong(6) === r.getLong(6))
    // degenerate: h < 2 yields no statistic
    val tiny = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("g", "v")
    assert(Robust.yuenTrimmed(tiny, "g", "v", "a", "b")
      .collect().head.isNullAt(6))
  }

  test("qqDrift: uniform +10 shift gaps every vigintile by -10; a " +
      "pure max-tail outlier moves NO vigintile") {
    import spark.implicits._
    val a = (1L to 20L).map(("a", _)); val b = (11L to 30L).map(("b", _))
    val out = Robust.qqDrift((a ++ b).toDF("g", "v"), "g", "v", "a", "b")
      .collect()
    assert(out.length === 19)
    out.foreach { r =>
      assert(r.getLong(1) === r.getLong(0))        // q_a(p) = p
      assert(r.getLong(3) === -10L)
    }
    // same body, one huge outlier: the profile is flat zero — the
    // tail story ksDrift/max-gap would shout about isn't HERE
    val bo = (1L to 19L).map(("b", _)) :+ (("b", 1000L))
    val oo = Robust.qqDrift((a ++ bo).toDF("g", "v"), "g", "v", "a", "b")
      .collect()
    assert(oo.forall(_.getLong(3) === 0L))
  }
}
