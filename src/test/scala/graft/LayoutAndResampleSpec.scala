package graft

import org.apache.spark.sql.functions._

import graft.operators.{Layout, TimeAgg}

class LayoutAndResampleSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ gridResample

  private def grid(rows: Seq[(Long, Long, Long, Long)], step: Long):
      Seq[(Long, Long, Long, Long)] =
    TimeAgg.gridResample(rows.toDF("k", "ts", "v", "tie"), "k", "ts", "v",
        step, "tie")
      .orderBy("k", "grid_ts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq

  test("gridResample: locf carries, linear interpolates between neighbors") {
    // obs at t=0 (v=100) and t=10 (v=200), grid step 5 → points 0,5,10
    val out = grid(Seq((1L, 0L, 100L, 1L), (1L, 10L, 200L, 2L)), 5L)
    assert(out === Seq(
      (1L, 0L, 100L, 100L),   // on-observation point: both rules = v0
      (1L, 5L, 100L, 150L),   // midpoint: locf holds 100, lin = 150
      (1L, 10L, 200L, 200L)))
  }

  test("gridResample: interpolation floors toward -inf on uneven spans") {
    // t=0 v=0, t=3 v=10, grid 1 → lin at t=1 is 10/3 = 3.33 → 3
    val out = grid(Seq((1L, 0L, 0L, 1L), (1L, 3L, 10L, 2L)), 1L)
    assert(out.map(_._4) === Seq(0L, 3L, 6L, 10L))
  }

  test("gridResample: grid past the last observation carries forward") {
    // obs at 0 and 4; grid step 3 → points 0, 3; at 3: t0=0,t1=4 interp;
    // then single obs key: grid collapses to the obs itself
    val out = grid(Seq((1L, 0L, 100L, 1L), (1L, 4L, 180L, 2L)), 3L)
    assert(out === Seq((1L, 0L, 100L, 100L), (1L, 3L, 100L, 160L)))
    val single = grid(Seq((2L, 6L, 50L, 1L)), 3L)
    assert(single === Seq((2L, 6L, 50L, 50L)))
  }

  test("gridResample: same-ts duplicates resolve to the highest tie value") {
    val out = grid(Seq((1L, 0L, 1L, 1L), (1L, 0L, 9L, 2L), (1L, 6L, 9L, 3L)),
      3L)
    assert(out.head === ((1L, 0L, 9L, 9L)))
  }

  test("gridResample: a key whose span contains no grid multiple is empty") {
    assert(grid(Seq((1L, 7L, 1L, 1L), (1L, 8L, 2L, 2L)), 100L) === Seq.empty)
  }

  // -------------------------------------------------------------- cusumShift

  private def cusum(xs: Seq[Long], k: Long, h: Long): Seq[(Long, Boolean)] =
    TimeAgg.cusumShift(
        xs.zipWithIndex.map { case (x, i) => ("g", i.toLong, x) }
          .toDF("g", "bucket", "x"), "g", "bucket", "x", k, h)
      .orderBy("bucket")
      .collect().map(r => (r.getLong(3), r.getBoolean(4))).toSeq

  test("cusumShift: matches the sequential recurrence on a hand series") {
    // k=2: x=5→S=3; x=1→S=2; x=0→S=0; x=6→S=4; x=6→S=8 (alarm at h=8)
    val out = cusum(Seq(5L, 1L, 0L, 6L, 6L), k = 2L, h = 8L)
    assert(out === Seq((3L, false), (2L, false), (0L, false), (4L, false),
      (8L, true)))
  }

  test("cusumShift: the statistic clamps at zero under sustained quiet") {
    val out = cusum(Seq(0L, 0L, 0L, 10L), k = 3L, h = 5L)
    // P = -3,-6,-9,-2; min-prefix = -3,-6,-9,-9 → S = 0,0,0,7
    assert(out === Seq((0L, false), (0L, false), (0L, false), (7L, true)))
  }

  test("cusumShift: agrees with a reference fold on random series") {
    val rnd = new scala.util.Random(11)
    val xs = Seq.fill(200)(rnd.nextInt(10).toLong)
    val expected = xs.scanLeft(0L)((s, x) => math.max(0L, s + x - 4L)).tail
    assert(cusum(xs, k = 4L, h = 15L).map(_._1) === expected)
  }

  // ---------------------------------------------------------------- zOrder

  test("zOrderKey: interleaves bits (hand-checked Morton values)") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L))
      .toDF("a", "b")
    val out = df.select(Layout.zOrderKey(Seq(col("a"), col("b")), 4)
      .as("z")).collect().map(_.getLong(0)).toSeq
    // morton(3=0b011, 5=0b101) = b2 a2 b1 a1 b0 a0 = 1 0 0 1 1 1 = 0b100111
    assert(out === Seq(0L, 1L, 2L, 3L, 39L))
  }

  test("zOrderKey: values beyond the bit budget truncate to low bits") {
    val out = Seq((256L + 3L, 0L)).toDF("a", "b")
      .select(Layout.zOrderKey(Seq(col("a"), col("b")), 8).as("z"))
      .collect().head.getLong(0)
    assert(out === Seq((3L, 0L)).toDF("a", "b")
      .select(Layout.zOrderKey(Seq(col("a"), col("b")), 8).as("z"))
      .collect().head.getLong(0))
  }

  test("zOrderKey: three-dimension interleave places bit i of col c at 3i+c") {
    val out = Seq((1L, 1L, 1L)).toDF("a", "b", "c")
      .select(Layout.zOrderKey(Seq(col("a"), col("b"), col("c")), 2).as("z"))
      .collect().head.getLong(0)
    assert(out === 7L) // bits 0,1,2 set
  }

  test("zOrdered: range partitioning yields disjoint zkey ranges per file") {
    val df = (0L until 1000L).map(i => (i, i % 16, (i / 16) % 16))
      .toDF("id", "u", "d")
      .withColumn("zkey", Layout.zOrderKey(Seq(col("u"), col("d")), 4))
    val parts = Layout.zOrdered(df, "zkey", numFiles = 8)
      .select("zkey").rdd
      .mapPartitions(it => {
        val v = it.map(_.getLong(0)).toSeq
        if (v.isEmpty) Iterator.empty
        else Iterator.single((v.min, v.max, v.zip(v.tail).forall(p => p._1 <= p._2)))
      }).collect().toSeq
    assert(parts.nonEmpty)
    assert(parts.forall(_._3), "zkey must be sorted within each partition")
    val sorted = parts.sortBy(_._1)
    sorted.zip(sorted.tail).foreach { case ((_, hi, _), (lo2, _, _)) =>
      assert(hi <= lo2, "partition zkey ranges must be disjoint")
    }
  }

  // ------------------------------------------------------------ hilbertKey

  test("hilbertKey: bits=1 visits the base quadrant order 00,01,11,10") {
    val out = Seq((0L, 0L), (0L, 1L), (1L, 1L), (1L, 0L)).toDF("x", "y")
      .select(Layout.hilbertKey(col("x"), col("y"), 1).as("h"))
      .collect().map(_.getLong(0)).toSeq
    assert(out === Seq(0L, 1L, 2L, 3L))
  }

  test("hilbertKey: bits=3 is a bijection onto 0..63 with unit-step adjacency") {
    val cells = for (x <- 0L until 8L; y <- 0L until 8L) yield (x, y)
    val d2xy = cells.toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.hilbertKey(col("x"), col("y"), 3).as("h"))
      .collect().map(r => r.getLong(2) -> ((r.getLong(0), r.getLong(1))))
      .toMap
    assert(d2xy.keySet === (0L until 64L).toSet, "must be a bijection")
    (0L until 63L).foreach { d =>
      val (x1, y1) = d2xy(d); val (x2, y2) = d2xy(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1,
        s"curve steps d=$d -> ${d + 1} must be grid-adjacent")
    }
  }

  test("hilbertKey: codegen column matches the interpreted static walk") {
    val cells = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val rows = cells.toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.hilbertKey(col("x"), col("y"), 4).as("h"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(2) ===
        graft.plans.HilbertIndex.index(r.getLong(0), r.getLong(1), 4))
    }
  }

  test("hilbertKey: values beyond the bit budget truncate to low bits") {
    val h = Seq((256L + 3L, 512L + 5L)).toDF("x", "y")
      .select(Layout.hilbertKey(col("x"), col("y"), 8).as("h"))
      .collect().head.getLong(0)
    assert(h === graft.plans.HilbertIndex.index(3L, 5L, 8))
  }

  // ----------------------------------------------------------- pageHinkley

  private def ph(xs: Seq[Long], deltaQ: Long,
                 lambdaQ: Long): Seq[(Long, Boolean)] =
    TimeAgg.pageHinkley(
        xs.zipWithIndex.map { case (x, i) => ("g", i.toLong, x) }
          .toDF("g", "bucket", "x"), "g", "bucket", "x", deltaQ, lambdaQ)
      .orderBy("bucket")
      .collect().map(r => (r.getLong(3), r.getBoolean(4))).toSeq

  test("pageHinkley: agrees with a sequential integer fold") {
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(300)(rnd.nextInt(8).toLong) ++
      Seq.fill(50)(20L + rnd.nextInt(5).toLong) // sustained level shift
    val (dq, lq) = (500000L, 20000000L)
    var p = 0L; var t = 0L; var u = 0L; var minU = 0L
    val expected = xs.map { x =>
      t += 1; p += x
      u += (1000000L * (t * x - p)) / t - dq
      minU = math.min(minU, u)
      u - minU
    }
    val got = ph(xs, dq, lq)
    assert(got.map(_._1) === expected)
    assert(got.last._2, "the shifted tail must alarm")
    assert(!got(250)._2, "the stationary head must not alarm")
  }

  test("pageHinkley: a constant series never drifts") {
    val out = ph(Seq.fill(20)(5L), deltaQ = 0L, lambdaQ = 1L)
    // x == running mean everywhere -> every deviation is exactly 0
    assert(out.forall(_._1 == 0L))
  }

  // ---------------------------------------------------------- maseBacktest

  test("maseBacktest: exact integer MASE on a hand series") {
    // season 2, trainPct 50 over 8 buckets -> n_train 4, test t=5..8
    val xs = Seq(10L, 2L, 10L, 2L, 11L, 3L, 9L, 2L)
    val df = xs.zipWithIndex.map { case (x, i) => ("g", i.toLong, x) }
      .toDF("g", "bucket", "x")
    val r = TimeAgg.maseBacktest(df, "g", "bucket", "x",
      season = 2, trainPct = 50).collect().head
    // in-sample naive (t=2..4): |2-10|+|10-2|+|2-10| = 24
    // seasonal test errors: |11-10|+|3-2|+|9-11|+|2-3| = 5, n_scored 4
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((4L, 4L, 4L)))
    assert((r.getLong(4), r.getLong(5)) === ((24L, 5L)))
    // mase = (5/4) / (24/3) = 0.15625 exactly
    assert(r.getLong(6) === (1000000L * 5L * 3L) / (4L * 24L))
    assert(r.getLong(6) === 156250L)
  }

  test("pinballBacktest: tau=0.9 losses are exact integer maxes") {
    // same frame as the MASE spec; test errors e = 1, 1, -2, -1
    // losses x10: 9, 9, 2, 1 -> sum 21, mean_q = 21e6 // 40
    val xs = Seq(10L, 2L, 10L, 2L, 11L, 3L, 9L, 2L)
    val df = xs.zipWithIndex.map { case (x, i) => ("g", i.toLong, x) }
      .toDF("g", "bucket", "x")
    val r = TimeAgg.pinballBacktest(df, "g", "bucket", "x",
      season = 2, trainPct = 50, tauNum = 9, tauDen = 10).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((4L, 21L, 525000L)))
  }

  test("maseBacktest: constant training series yields NULL mase") {
    val xs = Seq(5L, 5L, 5L, 5L, 9L, 1L)
    val df = xs.zipWithIndex.map { case (x, i) => ("g", i.toLong, x) }
      .toDF("g", "bucket", "x")
    val r = TimeAgg.maseBacktest(df, "g", "bucket", "x",
      season = 1, trainPct = 60).collect().head
    assert(r.getLong(4) === 0L) // naive MAE numerator
    assert(r.isNullAt(6))
  }

  // ----------------------------------------------------------------- rmst

  test("rmst: hand KM curve — area of the survival steps") {
    // 4 subjects: events at t=1 (2 of them), t=3 (1), censor at t=3
    // S(1) = 1/2, S(3) = 1/4 (then curve ends at horizon 3)
    val df = Seq((1L, true), (1L, true), (3L, true), (3L, false))
      .toDF("t", "obs")
    val r = TimeAgg.rmst(df, "t", "obs").collect().head
    assert(r.getLong(0) === 3L && r.getLong(1) === 2L)
    // area: [0,1)·1e6 + [1,3)·S(1); the KM gate's quantized-ln chain
    // puts S(1) at 499999 (floor(1e6·exp(qln(1/2)))), so the exact
    // integer area is 1e6 + 2·499999
    assert(r.getLong(2) === 1999998L)
  }

  test("rmst: no events at all — flat curve, full area") {
    val df = Seq((5L, false), (5L, false)).toDF("t", "obs")
    val r = TimeAgg.rmst(df, "t", "obs").collect().head
    assert(r.getLong(2) === 5000000L) // S = 1 across [0, 5)
  }

  // -------------------------------------------------- overdispersion

  test("overdispersion: constant series has Fano 0, a bursty series " +
      "exceeds the Poisson line") {
    val flat = (1 to 10).map(i => ("g", 5L)).toDF("g", "x")
    val rf = TimeAgg.overdispersion(flat, "g", "x").collect().head
    assert(rf.getLong(2) === 5000000L && rf.getLong(3) === 0L)
    // 9 zeros and one 10: mean 1, var 9 -> fano 9
    val burst = (("g", 10L) +: Seq.fill(9)(("g", 0L))).toDF("g", "x")
    val rb = TimeAgg.overdispersion(burst, "g", "x").collect().head
    assert(rb.getLong(2) === 1000000L)
    assert(rb.getLong(3) === 9000000L)
    assert(rb.getLong(4) === 90000000L) // chi = n * fano here
  }

  // -------------------------------------------------------- runsTest

  test("runsTest: alternating signs give the hand z; trending run " +
      "flips its sign") {
    // values 1,3 alternate; median 1 drops the 1s?? no: median of
    // {1,2,3,1,2,3} is 2, the 2s drop, signs alternate -+-+
    val alt = Seq(1L, 2L, 3L, 1L, 2L, 3L).zipWithIndex
      .map { case (x, i) => (i.toLong, x) }.toDF("bucket", "x")
    val r = TimeAgg.runsTest(alt, "bucket", "x").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((4L, 2L, 2L, 4L)))
    val z = 1000000.0 * (4.0 - 3.0) / math.sqrt(8.0 * 4.0 / (16.0 * 3.0))
    assert(r.getLong(4) === math.floor(z).toLong)
    val trend = Seq(1L, 1L, 2L, 3L, 3L).zipWithIndex
      .map { case (x, i) => (i.toLong, x) }.toDF("bucket", "x")
    val rt = TimeAgg.runsTest(trend, "bucket", "x").collect().head
    assert(rt.getLong(3) === 2L)
    assert(rt.getLong(4) < 0L) // too few runs: clustered/trending
  }

  test("runsTest: one-sided series (all above or ties) yields NULL z") {
    val df = Seq((1L, 5L), (2L, 5L), (3L, 9L)).toDF("bucket", "x")
    val r = TimeAgg.runsTest(df, "bucket", "x").collect().head
    assert(r.getLong(2) === 0L && r.isNullAt(4))
  }

  // ---------------------------------------------------- coxStuart

  test("coxStuart: monotone rise is all-plus (z = √n'), odd length " +
      "drops the middle, ties drop") {
    // n=6, m=3: pairs (1,4),(2,5),(3,6) over 1..6 — all rising
    val rise = (1L to 6L).zipWithIndex
      .map { case (x, i) => (i.toLong, x) }.toDF("bucket", "x")
    val r = TimeAgg.coxStuart(rise, "bucket", "x").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((6L, 3L, 3L, 0L)))
    assert(r.getLong(4) === math.floor(1000000.0 * 3.0 / math.sqrt(3.0)).toLong)
    // n=5 (odd): middle x_3 dropped; pairs (1,4),(2,5); one tie drops
    val odd = Seq(1L, 7L, 100L, 1L, 3L).zipWithIndex
      .map { case (x, i) => (i.toLong, x) }.toDF("bucket", "x")
    val ro = TimeAgg.coxStuart(odd, "bucket", "x").collect().head
    // (1,1) ties out; (7,3) falls
    assert((ro.getLong(0), ro.getLong(1), ro.getLong(2), ro.getLong(3)) ===
      ((5L, 1L, 0L, 1L)))
    assert(ro.getLong(4) === math.floor(1000000.0 * -1.0 / 1.0).toLong)
    // constant series: every pair ties -> no pairs, NULL z
    val flat = Seq.fill(4)(5L).zipWithIndex
      .map { case (x, i) => (i.toLong, x) }.toDF("bucket", "x")
    val rf = TimeAgg.coxStuart(flat, "bucket", "x").collect().head
    assert(rf.getLong(1) === 0L && rf.isNullAt(4))
  }

  // ----------------------------------------------------- theilU2

  test("theilU2: hand sums; constant series scores 0; zero history " +
      "is NULL") {
    val s = Seq(1L, 2L, 3L).zipWithIndex
      .map { case (x, i) => (i.toLong, x) }.toDF("bucket", "x")
    val r = TimeAgg.theilU2(s, "bucket", "x").collect().head
    // diffs [1,1] -> sse 2; prev² [1,4] -> 5
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((2L, 2L, 5L)))
    assert(r.getLong(3) ===
      math.floor(1000000.0 * math.sqrt(2.0) / math.sqrt(5.0)).toLong)
    val flat = Seq.fill(3)(5L).zipWithIndex
      .map { case (x, i) => (i.toLong, x) }.toDF("bucket", "x")
    assert(TimeAgg.theilU2(flat, "bucket", "x").collect().head.getLong(3) === 0L)
    val zeros = Seq(0L, 0L, 7L).zipWithIndex
      .map { case (x, i) => (i.toLong, x) }.toDF("bucket", "x")
    // prev values all zero -> ss_prev 0 -> U2 undefined
    assert(TimeAgg.theilU2(zeros, "bucket", "x").collect().head.isNullAt(3))
  }

  // ------------------------------------------------- markovStationary

  test("markovStationary: two-state flip-flop converges to the " +
      "uniform split; absorbing sink collects mass") {
    // user 1: a b a b a  — pure alternation
    val ev = Seq((1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"),
      (1L, 4L, "b"), (1L, 5L, "a"))
      .toDF("user_id", "event_id", "event_type")
      .withColumn("ts_us", col("event_id") * 1000000L)
    val out = TimeAgg.markovStationary(ev, "user_id", "ts_us",
      "event_type", "event_id", rounds = 4).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    // P(a->b)=1, P(b->a)=1: mass oscillates back to the start split
    assert(out("a") === 500000000000L)
    assert(out("b") === 500000000000L)
    // sink: a -> z only, z emits nothing -> all mass ends in z
    val ev2 = Seq((1L, 1L, "a"), (1L, 2L, "z"))
      .toDF("user_id", "event_id", "event_type")
      .withColumn("ts_us", col("event_id") * 1000000L)
    val out2 = TimeAgg.markovStationary(ev2, "user_id", "ts_us",
      "event_type", "event_id", rounds = 3).collect()
      .map(r => r.getString(0) -> (Option(r.get(1)), r.getLong(2)))
      .toMap
    assert(out2("a")._2 === 0L)
    assert(out2("z") === ((None, 1000000000000L)))
  }

  test("markovStationary: >4096 states falls back to the distributed " +
      "iteration and reproduces the integer recurrence") {
    // one user walking a 4100-state chain s0000 -> s0001 -> ... ->
    // s4099 (absorbing): every transition has n = r = 1, so after
    // 3 rounds mass has shifted 3 steps and the sink holds 4 shares
    val n = 4100
    val ev = (0 until n).map(i => (1L, i.toLong, f"s$i%04d"))
      .toDF("user_id", "event_id", "event_type")
      .withColumn("ts_us", col("event_id") * 1000000L)
    val df = TimeAgg.markovStationary(ev, "user_id", "ts_us",
      "event_type", "event_id", rounds = 3)
    // the driver fast path would return a collected LocalRelation;
    // above the state cap the plan must stay distributed (joins over
    // checkpointed frames)
    assert(df.queryExecution.optimizedPlan.collectLeaves()
      .exists(l => !l.isInstanceOf[
        org.apache.spark.sql.catalyst.plans.logical.LocalRelation]),
      "expected the distributed fallback plan, got a collected grid")
    val out = df.collect()
      .map(r => r.getString(0) -> (Option(r.get(1)), r.getLong(2))).toMap
    assert(out.size === n)
    val x0 = 1000000000000L / n
    // emitting states: mass 0 for the first `rounds`, x0 behind the wave
    assert(out("s0000") === ((Some(1L), 0L)))
    assert(out("s0002") === ((Some(1L), 0L)))
    assert(out("s0003") === ((Some(1L), x0)))
    assert(out("s2050") === ((Some(1L), x0)))
    assert(out("s4098") === ((Some(1L), x0)))
    // absorbing sink: its own share plus one inflow per round
    assert(out("s4099") === ((None, 4L * x0)))
  }

  // ---------------------------------------------------------- periodogram

  test("periodogram: a pure cycle concentrates power at its period") {
    // period-4 square-ish wave over 32 buckets
    val df = (1 to 32).map(t => (t.toLong * 60L,
      if (t % 4 == 0) 100L else 0L)).toDF("bucket", "x")
    val out = TimeAgg.periodogram(df, "bucket", "x", Seq(3, 4, 5, 8))
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(out(4L) > out(3L) * 10)
    assert(out(4L) > out(5L) * 10)
    assert(out(4L) === 640000L) // (8 spikes · 100)² exactly, sin ~ 0
    // the period-8 harmonic carries the same fundamental energy
    assert(out(4L) > 0L)
  }

  test("periodogram: constant series has (near-)zero power off DC") {
    val df = (1 to 24).map(t => (t.toLong, 50L)).toDF("bucket", "x")
    val out = TimeAgg.periodogram(df, "bucket", "x", Seq(2, 3, 4, 6, 8, 12))
      .collect()
    assert(out.forall(_.getLong(1) === 24L))
    // full cycles of a constant sum to ~0 (quantization leaves crumbs)
    assert(out.forall(r => r.getLong(4) < 100L))
  }

  test("spectralEntropy: one dominant cycle scores far below uniform") {
    val cyc = (1 to 32).map(t => (t.toLong * 60L,
      if (t % 4 == 0) 100L else 0L)).toDF("bucket", "x")
    val r = TimeAgg.spectralEntropy(cyc, "bucket", "x", Seq(3, 4, 5, 8))
      .collect().head
    // near-total concentration at period 4 -> entropy near 0
    assert(r.getLong(2) < 400000000L) // << ln(4) = 1.386e9 on the grid
    // exact value matches the entropy kernel applied to the
    // periodogram's own power table
    val pw = TimeAgg.periodogram(cyc, "bucket", "x", Seq(3, 4, 5, 8))
      .collect().map(_.getLong(4)).filter(_ > 0)
    val t = pw.sum
    val want = pw.map(p => math.floor(1.0e9 * p.toDouble *
      math.log(t.toDouble / p.toDouble) / t.toDouble).toLong).sum
    assert(r.getLong(2) === want && r.getLong(1) === t)
  }

  test("ewmaDyadic: exact integer recurrence, hand-unrolled") {
    val df = Seq(("k", 1L, 8L), ("k", 2L, 0L), ("k", 3L, 16L))
      .toDF("key", "bucket", "x")
    val out = TimeAgg.ewmaDyadic(df, "key", "bucket", "x", kShift = 3)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    val q = 1L << 20
    val s1 = 8 * q
    val s2 = s1 + Math.floorDiv(0 * q - s1, 8)   // negative delta floors
    val s3 = s2 + Math.floorDiv(16 * q - s2, 8)
    assert(out(1L) === s1 && out(2L) === s2 && out(3L) === s3)
    // constant series is a fixed point
    val const = (1 to 5).map(i => ("c", i.toLong, 7L))
      .toDF("key", "bucket", "x")
    assert(TimeAgg.ewmaDyadic(const, "key", "bucket", "x", 3)
      .collect().forall(_.getLong(3) === 7 * q))
  }

  // ------------------------------------------------------ ljungBox

  test("ljungBox: alternating series hand-checked per lag, cumulative " +
      "Q is the running sum") {
    // x = 1,2,1,2: xc = 4x-6 = -2,2,-2,2; num0 = 16
    // lag1: -12 -> r=-0.75; lag2: 8 -> r=0.5; lag3: -4 -> r=-0.25
    val s = Seq(1L, 2L, 1L, 2L).zipWithIndex
      .map { case (x, i) => (i.toLong, x) }.toDF("bucket", "x")
    val out = TimeAgg.ljungBox(s, "bucket", "x", maxLag = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) === ((-750000000L, 4500000000000L, 4500000000000L)))
    assert(out(2L) === ((500000000L, 3000000000000L, 7500000000000L)))
    assert(out(3L) === ((-250000000L, 1500000000000L, 9000000000000L)))
    // lags beyond n-1 drop (the n-k divisor would hit zero)
    assert(TimeAgg.ljungBox(s, "bucket", "x", maxLag = 8).count() === 3L)
  }

  // ------------------------------------------------- varianceRatio

  test("varianceRatio: oscillating series hand-checked; perfect " +
      "trend has zero 1-period variance -> NULL") {
    // x = 1,2,1,2,1,2 with q=2: numB = 120, numA = 16,
    // VR = 16/240, z = (VR-1)/sqrt(0.2)
    val s = Seq(1L, 2L, 1L, 2L, 1L, 2L).zipWithIndex
      .map { case (x, i) => (i.toLong, x) }.toDF("bucket", "x")
    val r = TimeAgg.varianceRatio(s, "bucket", "x", q = 2).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((6L, 2L, 1L)))
    assert((r.getLong(3), r.getLong(4)) === ((120L, 16L)))
    assert(r.getLong(5) === math.floor(1.0e6 * 16.0 / (2.0 * 120.0)).toLong)
    val vr = 16.0 / (2.0 * 120.0)
    val phi = 2.0 * 3 * 1 / (3.0 * 2) / 5.0
    assert(r.getLong(6) ===
      math.floor(1.0e6 * (vr - 1.0) / math.sqrt(phi)).toLong)
    // x = 1..10: every 1-period diff equals the drift -> numB = 0
    val trend = (1L to 10L).zipWithIndex
      .map { case (x, i) => (i.toLong, x) }.toDF("bucket", "x")
    val rt = TimeAgg.varianceRatio(trend, "bucket", "x", q = 2)
      .collect().head
    assert(rt.getLong(3) === 0L && rt.isNullAt(5) && rt.isNullAt(6))
  }

  // ------------------------------------------------------- hurstRS

  test("hurstRS: replays the documented chain against a scala " +
      "reimplementation; block bookkeeping correct") {
    val xs = Seq(3L, 7L, 2L, 9L, 4L, 8L, 1L, 6L, 5L, 2L, 9L, 3L,
      7L, 4L, 8L, 2L, 6L, 1L)
    val s = xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }
      .toDF("bucket", "x")
    val out = TimeAgg.hurstRS(s, "bucket", "x", sizes = Seq(4, 8))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // 18 points: four complete 4-blocks, two complete 8-blocks
    assert(out(4L)._1 === 4L && out(8L)._1 === 2L)
    // scala replay of the per-block chain
    def rs2q(block: Seq[Long]): Long = {
      val nb = block.length.toLong
      val sb = block.sum
      val cums = block.scanLeft(0L)(_ + _).tail.zipWithIndex
        .map { case (p, i) => nb * p - (i + 1) * sb }
      val rn = BigDecimal(cums.max - cums.min)
      val num0 = block.map(x => BigDecimal(nb * x - sb).pow(2)).sum
      math.floor(1.0e6 * (rn * rn * nb).toDouble / num0.toDouble).toLong
    }
    def sizeRow(nb: Int): (Long, Long) = {
      val qs = xs.grouped(nb).filter(_.length == nb).map(rs2q).toSeq
      val sum = qs.sum
      (sum, math.floor(5.0e8 *
        math.log(sum.toDouble / (1.0e6 * qs.length))).toLong)
    }
    assert((out(4L)._2, out(4L)._3) === sizeRow(4))
    assert((out(8L)._2, out(8L)._3) === sizeRow(8))
    // slope replay on the quantized grid
    val pts = Seq(4, 8).map { nb =>
      (math.floor(1.0e9 * math.log(nb.toDouble)).toLong, sizeRow(nb)._2)
    }
    val p = pts.length.toLong
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map { case (x, y) => BigInt(x) * y }.sum
    val sxx = pts.map { case (x, _) => BigInt(x) * x }.sum
    val want = math.floor(1.0e6 * (BigInt(p) * sxy - BigInt(sx) * sy).toDouble /
      (BigInt(p) * sxx - BigInt(sx) * sx).toDouble).toLong
    assert(out(4L)._4 === want && out(8L)._4 === want)
  }

  // --------------------------------------------------- mannKendall

  test("mannKendall: hand-checked S with and without ties; constant " +
      "series has zero variance -> NULL z") {
    def series(xs: Seq[Long]) = xs.zipWithIndex
      .map { case (x, i) => (i.toLong, x) }.toDF("bucket", "x")
    // 1,3,2,4: S = 4 (5 concordant, 1 discordant), no ties
    val r = TimeAgg.mannKendall(series(Seq(1L, 3L, 2L, 4L)),
      "bucket", "x").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((4L, 4L, 156L)))
    assert(r.getLong(3) ===
      math.floor(1.0e6 * 3.0 / math.sqrt(156.0 / 18.0)).toLong)
    // 1,2,2,3: tie group of 2 subtracts 2*1*9 = 18
    val rt = TimeAgg.mannKendall(series(Seq(1L, 2L, 2L, 3L)),
      "bucket", "x").collect().head
    assert((rt.getLong(1), rt.getLong(2)) === ((5L, 138L)))
    assert(rt.getLong(3) ===
      math.floor(1.0e6 * 4.0 / math.sqrt(138.0 / 18.0)).toLong)
    // falling series: continuity correction adds 1
    val rf = TimeAgg.mannKendall(series(Seq(3L, 2L, 1L)),
      "bucket", "x").collect().head
    assert(rf.getLong(1) === -3L)
    assert(rf.getLong(3) ===
      math.floor(1.0e6 * -2.0 / math.sqrt(66.0 / 18.0)).toLong)
    // constant: S = 0 and the tie correction zeroes the variance
    val rc = TimeAgg.mannKendall(series(Seq(2L, 2L, 2L)),
      "bucket", "x").collect().head
    assert(rc.getLong(1) === 0L && rc.getLong(2) === 0L && rc.isNullAt(3))
  }

  // ------------------------------------------------- turningPoints

  test("turningPoints: zigzag counts every interior point, monotone " +
      "counts none") {
    def series(xs: Seq[Long]) = xs.zipWithIndex
      .map { case (x, i) => (i.toLong, x) }.toDF("bucket", "x")
    val r = TimeAgg.turningPoints(series(Seq(1L, 3L, 2L, 4L, 3L)),
      "bucket", "x").collect().head
    assert((r.getLong(0), r.getLong(1)) === ((5L, 3L)))
    assert(r.getLong(2) === math.floor(1.0e6 * 3.0 /
      (3.0 * math.sqrt(51.0 / 90.0))).toLong)
    val rm = TimeAgg.turningPoints(series((1L to 5L)),
      "bucket", "x").collect().head
    assert(rm.getLong(1) === 0L)
    assert(rm.getLong(2) === math.floor(1.0e6 * -6.0 /
      (3.0 * math.sqrt(51.0 / 90.0))).toLong)
  }

  // --------------------------------------------------- bartelsRank

  test("bartelsRank: monotone series hand-checked; tied zigzag sits " +
      "exactly at the null RVN = 2") {
    def series(xs: Seq[Long]) = xs.zipWithIndex
      .map { case (x, i) => (i.toLong, x) }.toDF("bucket", "x")
    // 1,2,3,4: 2R = 2,4,6,8; num4 = 12, den4 = 20, RVN = 0.6
    val r = TimeAgg.bartelsRank(series(Seq(1L, 2L, 3L, 4L)),
      "bucket", "x").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((4L, 12L, 20L)))
    assert(r.getLong(3) === 600000L)
    val varr = (4.0 * 2 * (5 * 16 - 8 - 9)) / (5.0 * 4 * 5 * 9)
    assert(r.getLong(4) ===
      math.floor(1.0e6 * (0.6 - 2.0) / math.sqrt(varr)).toLong)
    // 1,2,2,1 with doubled midranks 3,7,7,3: num4 = 32, den4 = 16
    val rt = TimeAgg.bartelsRank(series(Seq(1L, 2L, 2L, 1L)),
      "bucket", "x").collect().head
    assert((rt.getLong(1), rt.getLong(2)) === ((32L, 16L)))
    assert(rt.getLong(3) === 2000000L && rt.getLong(4) === 0L)
  }

  // ------------------------------------------- seasonalMannKendall

  test("seasonalMannKendall: opposing seasonal trends cancel to S=0; " +
      "aligned trends sum; no cross-season pairs form") {
    def df(rows: Seq[(Long, Long, Long)]) =
      rows.toDF("bucket", "x", "s")
    // season 0 rises (+3), season 1 falls (-3): total S = 0, z = 0
    val opp = df(Seq((0L, 1L, 0L), (1L, 2L, 0L), (2L, 3L, 0L),
      (3L, 3L, 1L), (4L, 2L, 1L), (5L, 1L, 1L)))
    val r = TimeAgg.seasonalMannKendall(opp, "bucket", "x", col("s"))
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((6L, 2L, 0L, 132L)))
    assert(r.getLong(4) === 0L)
    // both rise: S = 6 with continuity correction
    val up = df(Seq((0L, 1L, 0L), (1L, 2L, 0L), (2L, 3L, 0L),
      (3L, 4L, 1L), (4L, 5L, 1L), (5L, 6L, 1L)))
    val ru = TimeAgg.seasonalMannKendall(up, "bucket", "x", col("s"))
      .collect().head
    assert(ru.getLong(2) === 6L)
    assert(ru.getLong(4) ===
      math.floor(1.0e6 * 5.0 / math.sqrt(132.0 / 18.0)).toLong)
    // contrast with unrestricted MK on the same rows: pooled n=6
    // variance 510 minus pooled ties (three values twice: 3 x 18),
    // vs the seasonal tie-free per-season sum of 132 above
    assert(TimeAgg.mannKendall(opp, "bucket", "x")
      .collect().head.getLong(2) === (510L - 3 * 18L))
  }
}
