package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.TimeAgg

/** §2.8 streaming semantics: event-time tumbling window + watermark in
  * append mode — windows seal once the watermark passes, late-but-
  * within-watermark data still counts.
  */
class StreamingAggSpec extends SparkSpec {
  import spark.implicits._

  test("windowed change stats with watermark across micro-batches") {
    val in = Files.createTempDirectory("graft_sagg_in").toString
    def write(name: String, rows: Seq[(Timestamp, Long, Boolean)]): Unit =
      rows.toDF("ts", "user_id", "wd").write.parquet(s"$in/$name")
    def ts(s: String) = Timestamp.valueOf(s)

    write("b1", Seq(
      (ts("2024-01-01 00:00:10"), 1L, false),
      (ts("2024-01-01 00:00:40"), 1L, true),
      (ts("2024-01-01 00:01:10"), 1L, false)))

    val stream = spark.readStream
      .schema("ts timestamp, user_id bigint, wd boolean")
      .option("recursiveFileLookup", "true")
      .parquet(in)
    val agg = TimeAgg.streamingChgStats(stream, "ts", "1 minute", "30 seconds",
      col("wd"), Seq("user_id"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("chg_stats_stream")
      .trigger(Trigger.ProcessingTime(50)).start()
    q.processAllAvailable()

    // late event for the 00:00 window, within watermark horizon relative
    // to max seen (00:01:10 → watermark 00:00:40): 00:00 window not yet
    // sealed, so this still counts; then an event far ahead seals all.
    write("b2", Seq((ts("2024-01-01 00:00:50"), 1L, false)))
    q.processAllAvailable()
    write("b3", Seq((ts("2024-01-01 00:10:00"), 1L, false)))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("chg_stats_stream")
      .select(col("bucket_start").cast("string"), col("user_id"),
        col("withdraws"), col("updates"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(out.contains(("2024-01-01 00:00:00", 1L, 1L, 2L))) // incl. late event
    assert(out.contains(("2024-01-01 00:01:00", 1L, 0L, 1L)))
  }

  test("streaming SPRT monitor: complete-mode LLR updates per batch, " +
      "batch/stream parity") {
    import graft.operators.Stats
    val in = Files.createTempDirectory("graft_sprt_in").toString
    def write(name: String, rows: Seq[(Long, Boolean)]): Unit =
      rows.toDF("id", "y").write.parquet(s"$in/$name")

    write("b1", Seq((1L, true), (2L, false), (3L, false)))
    val stream = spark.readStream
      .schema("id bigint, y boolean")
      .option("recursiveFileLookup", "true")
      .parquet(in)
    val mon = Stats.sprtTotals(stream, col("y"), 180000L, 220000L)
    val q = mon.writeStream.outputMode("complete")
      .format("memory").queryName("sprt_stream")
      .trigger(Trigger.ProcessingTime(50)).start()
    q.processAllAvailable()
    def current: (Long, Long, Long) = spark.table("sprt_stream")
      .as[(Long, Long, Long)].collect().head
    def batchAt(rows: Seq[(Long, Boolean)]): (Long, Long, Long) =
      Stats.sprtTotals(rows.toDF("id", "y"), col("y"), 180000L, 220000L)
        .as[(Long, Long, Long)].collect().head
    val snap1 = current
    assert(snap1._1 === 3L && snap1._2 === 1L)
    assert(snap1 === batchAt(Seq((1L, true), (2L, false), (3L, false))),
      "streaming LLR must equal the batch computation on the same rows")

    write("b2", Seq((4L, true), (5L, true)))
    q.processAllAvailable()
    q.stop()
    val snap2 = current
    assert(snap2._1 === 5L && snap2._2 === 3L)
    assert(snap2 === batchAt(Seq((1L, true), (2L, false), (3L, false),
      (4L, true), (5L, true))))
    assert(snap2._3 > snap1._3, "two successes must push the LLR up")
  }

  test("streaming session windows: gap splits sessions, watermark seals them") {
    val in = Files.createTempDirectory("graft_ssw_in").toString
    def write(name: String, rows: Seq[(Timestamp, Long)]): Unit =
      rows.toDF("ts", "user_id").write.parquet(s"$in/$name")
    def ts(s: String) = Timestamp.valueOf(s)

    // user 1: two bursts separated by > 1 min gap; user 2: one event
    write("b1", Seq(
      (ts("2024-01-01 00:00:00"), 1L),
      (ts("2024-01-01 00:00:30"), 1L),
      (ts("2024-01-01 00:05:00"), 1L),
      (ts("2024-01-01 00:05:10"), 2L)))

    val stream = spark.readStream
      .schema("ts timestamp, user_id bigint")
      .option("recursiveFileLookup", "true")
      .parquet(in)
    val agg = TimeAgg.streamingSessionAgg(stream, "ts", "1 minute",
      "30 seconds", Seq("user_id"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("session_stream")
      .trigger(Trigger.ProcessingTime(50)).start()
    q.processAllAvailable()
    // advance the watermark far enough to seal every open session
    write("b2", Seq((ts("2024-01-01 01:00:00"), 9L)))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("session_stream")
      .select(col("session_start").cast("string"),
        col("session_end").cast("string"), col("user_id"), col("n_events"))
      .as[(String, String, Long, Long)].collect().toSet
    // session end = last event + gap
    assert(out.contains(("2024-01-01 00:00:00", "2024-01-01 00:01:30", 1L, 2L)))
    assert(out.contains(("2024-01-01 00:05:00", "2024-01-01 00:06:00", 1L, 1L)))
    assert(out.contains(("2024-01-01 00:05:10", "2024-01-01 00:06:10", 2L, 1L)))
  }

  test("stream-stream interval join: errors pair with purchases in-window, " +
    "state bounded by watermark") {
    val in1 = Files.createTempDirectory("graft_ssj_p").toString
    val in2 = Files.createTempDirectory("graft_ssj_e").toString
    def ts(s: String) = Timestamp.valueOf(s)
    Seq((ts("2024-01-01 00:10:00"), 1L, 100L)).toDF("pts", "user_id", "pid")
      .write.parquet(s"$in1/b1")
    Seq(
      (ts("2024-01-01 00:20:00"), 1L, 200L),  // within 30 min of purchase
      (ts("2024-01-01 02:00:00"), 1L, 201L),  // far outside the window
      (ts("2024-01-01 00:15:00"), 2L, 202L))  // other user: no pair
      .toDF("ets", "user_id", "eid").write.parquet(s"$in2/b1")

    val purchases = spark.readStream
      .schema("pts timestamp, user_id bigint, pid bigint")
      .option("recursiveFileLookup", "true").parquet(in1)
      .withWatermark("pts", "10 minutes")
    val errors = spark.readStream
      .schema("ets timestamp, user_id bigint, eid bigint")
      .option("recursiveFileLookup", "true").parquet(in2)
      .withWatermark("ets", "10 minutes")
    // event-time range join: error within [purchase, purchase + 30 min];
    // the two-sided time bound + watermarks is what lets Spark evict
    // join state instead of buffering both streams forever
    val joined = purchases.alias("p").join(errors.alias("e"),
      expr("p.user_id = e.user_id AND e.ets >= p.pts AND " +
        "e.ets <= p.pts + interval 30 minutes"))
      .select(col("p.pid"), col("e.eid"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_stream")
      .trigger(Trigger.ProcessingTime(50)).start()
    q.processAllAvailable()
    q.stop()
    val out = spark.table("ssj_stream")
      .as[(Long, Long)].collect().toSet
    assert(out === Set((100L, 200L)))
  }

  test("sessionize: gap splits sessions per key; ties break by tieBreak col") {
    import graft.operators.TimeAgg
    // user 1: events at 0s, 10s, 100s with gap 60s → sessions (0,10) (100)
    // user 2: single event → one session
    val ev = Seq(
      (1L, 0L, 10L), (1L, 10000000L, 11L), (1L, 100000000L, 12L),
      (2L, 5000000L, 20L)
    ).toDF("user_id", "ts_us", "event_id")
    val r = TimeAgg.sessionize(ev, Seq("user_id"), "ts_us",
      gapMicros = 60000000L, tieBreak = Seq("event_id"))
      .select("event_id", "session_idx").as[(Long, Long)].collect().toMap
    assert(r === Map(10L -> 1L, 11L -> 1L, 12L -> 2L, 20L -> 1L))
    // boundary: a gap EXACTLY equal to gapMicros does NOT split
    val edge = Seq((1L, 0L, 1L), (1L, 60000000L, 2L), (1L, 120000001L, 3L))
      .toDF("user_id", "ts_us", "event_id")
    val r2 = TimeAgg.sessionize(edge, Seq("user_id"), "ts_us", 60000000L,
      Seq("event_id"))
      .select("event_id", "session_idx").as[(Long, Long)].collect().toMap
    assert(r2 === Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
  }

  test("sessionize: null timestamps form ONE trailing untimed session per key") {
    import graft.operators.TimeAgg
    val ev = Seq(
      (1L, Some(0L), 1L), (1L, Some(10000000L), 2L),
      (1L, None, 3L), (1L, None, 4L),      // two untimed rows, one session
      (2L, None, 5L)                       // key with ONLY untimed rows
    ).toDF("user_id", "ts_us", "event_id")
    val r = TimeAgg.sessionize(ev, Seq("user_id"), "ts_us",
      gapMicros = 60000000L, tieBreak = Seq("event_id"))
      .select("event_id", "session_idx").as[(Long, Long)].collect().toMap
    assert(r === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L))
  }

  test("userActivityFeatures: hand-computed feature row per user") {
    // user 1: events at t=0, 30s, 120s (gap 60s → 2 sessions),
    //         types a,a,b; values 1.50, 2.50, 6.00
    // user 2: one event, one session
    val ev = Seq(
      (1L, 0L, "a", 1.50, 10L),
      (1L, 30000000L, "a", 2.50, 11L),
      (1L, 120000000L, "b", 6.00, 12L),
      (2L, 0L, "c", 0.25, 20L)
    ).toDF("user_id", "ts_us", "event_type", "value", "event_id")
    val r = TimeAgg.userActivityFeatures(ev, "user_id", "ts_us",
      "event_type", "value", gapMicros = 60000000L,
      tieBreak = Seq("event_id"))
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(t => t._1 -> t).toMap
    // u1: 3 events, 2 types, 2 sessions, span [0, 120s],
    //     cents 150+250+600=1000, mean_q = floor(1e4*1000/3) = 3333333
    assert(r(1L) === ((1L, 3L, 2L, 2L, 0L, 120000000L, 1000L, 3333333L)))
    assert(r(2L) === ((2L, 1L, 1L, 1L, 0L, 0L, 25L, 250000L)))
  }

  test("rateAnomaly: densified buckets, hand-computed trailing z") {
    // per-minute counts: b0=1, b60=3, b120=1, b180=9, b240=GAP(0), b300=1
    def events(bucketSec: Long, n: Int) =
      (1 to n).map(i => ("k", bucketSec * 1000000L + i))
    val ev = (events(0, 1) ++ events(60, 3) ++ events(120, 1) ++
      events(180, 9) ++ events(300, 1)).toDF("key", "ts_us")
    val r = TimeAgg.rateAnomaly(ev, "key", "ts_us", bucketSec = 60L,
      window = 2)
      .collect().map(x => x.getLong(1) -> Option(x.get(3))).toMap
    assert(r.size === 6, "gap bucket 240 must be densified")
    assert(r(0L).isEmpty && r(60L).isEmpty, "partial windows stay null")
    assert(r(120L) === Some(-100L)) // prior [1,3]: mean 2 sd 1 → -100
    assert(r(180L) === Some(700L))  // prior [3,1]: (9-2)/1 → 700
    assert(r(240L) === Some(-125L)) // prior [1,9]: (0-5)/4 → -125
    assert(r(300L) === Some(-78L))  // prior [9,0]: floor(100·(1-4.5)/4.5)
  }

  test("funnel: earliest-completion semantics with per-step horizon") {
    val ev = Seq(
      (1L, "view", 1L), (1L, "click", 2L), (1L, "purchase", 3L),
      (2L, "click", 0L), (2L, "view", 5L),            // click precedes view
      (3L, "view", 1L), (3L, "click", 2L), (3L, "purchase", 20L),
      (4L, "purchase", 1L)                            // never viewed
    ).toDF("user_id", "event_type", "ts_us")
    val r = TimeAgg.funnel(ev, "user_id", "ts_us", "event_type",
      Seq("view", "click", "purchase"), horizonMicros = 10L)
      .collect().map(x => x.getLong(0) -> x.getInt(4)).toMap
    assert(r === Map(1L -> 3, 2L -> 1, 3L -> 2), s"got $r")
  }

  test("markovTransitions: per-user consecutive pairs, row-normalized") {
    // u1: a→b→a; u2: a→b. transitions: a→b ×2, b→a ×1
    val ev = Seq(
      (1L, "a", 1L, 10L), (1L, "b", 2L, 11L), (1L, "a", 3L, 12L),
      (2L, "a", 1L, 20L), (2L, "b", 2L, 21L)
    ).toDF("user_id", "event_type", "ts_us", "event_id")
    val r = TimeAgg.markovTransitions(ev, "user_id", "ts_us",
      "event_type", "event_id")
      .as[(String, String, Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4, t._5))).toMap
    assert(r === Map(
      ("a", "b") -> ((2L, 2L, 1000000L)),
      ("b", "a") -> ((1L, 1L, 1000000L))))
    // ties on ts break by event_id: same-ts events order deterministically
    val tied = Seq((1L, "x", 5L, 1L), (1L, "y", 5L, 2L))
      .toDF("user_id", "event_type", "ts_us", "event_id")
    val rt = TimeAgg.markovTransitions(tied, "user_id", "ts_us",
      "event_type", "event_id")
      .as[(String, String, Long, Long, Long)].collect()
    assert(rt.map(t => (t._1, t._2)).toSeq === Seq(("x", "y")))
  }

  test("cohortRetention: first-seen cohorts and day offsets") {
    def at(day: Long, u: Long) = (u, day * 86400000000L + u)
    val ev = Seq(at(0, 1), at(1, 1), at(3, 1), at(1, 2))
      .toDF("user_id", "ts_us")
    val r = TimeAgg.cohortRetention(ev, "user_id", "ts_us",
      bucketSec = 86400L)
      .as[(Long, Long, Long)].collect().toSet
    assert(r === Set((0L, 0L, 1L), (0L, 1L, 1L), (0L, 3L, 1L),
      (86400L, 0L, 1L)))
  }

  test("assocRules: support/confidence/lift from exact basket counts") {
    // u1:{a,b} u2:{a,b} u3:{a} — duplicates within a basket collapse
    val ev = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"),
      (3L, "a")).toDF("user_id", "event_type")
    val out = TimeAgg.assocRules(ev, "user_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // a→b: n_ab=2, N=3, n_a=3, n_b=2
    assert(out(("a", "b")) === ((2L, 666666L, 666666L, 1000000L)))
    // b→a: confidence 2/2 = 1; lift symmetric
    assert(out(("b", "a")) === ((2L, 666666L, 1000000L, 1000000L)))
    // minCount prunes below-threshold pairs entirely
    assert(TimeAgg.assocRules(ev, "user_id", "event_type", minCount = 3L)
      .count() === 0L)
  }

  test("weekdayProfile: integer dow with 0=Monday; shares sum per group") {
    val day = 86400000000L
    // 1970-01-05 (epoch day 4) was a Monday; day 5 Tuesday
    val rows = Seq(("t", 4 * day), ("t", 4 * day + 7), ("t", 5 * day),
      ("t", 5 * day + 1), ("t", 5 * day + 2), ("u", 9 * day))
    val out = TimeAgg.weekdayProfile(rows.toDF("g", "ts_us"), "g", "ts_us")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(out(("t", 0L)) === ((2L, 400000L))) // Monday 2/5
    assert(out(("t", 1L)) === ((3L, 600000L))) // Tuesday 3/5
    assert(out(("u", 5L)) === ((1L, 1000000L))) // day 9 = Saturday
  }

  test("rfm/dup-mass composition guard: duplicateMass hand corpus") {
    // source A: two identical docs (4 tokens each) + 1 unique (2)
    // source B: one doc duplicating A's text (4 tokens, NOT canonical
    // because A holds the min id) — cross-source attribution
    val docs = Seq(
      (1L, "A", "w x y z"), (2L, "A", "w x y z"), (3L, "A", "a b"),
      (4L, "B", "w x y z"))
    val out = graft.operators.Dedup.duplicateMass(
      docs.toDF("doc_id", "src", "text"), "src", "doc_id", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    assert(out("A") === ((3L, 1L, 10L, 4L, 400000L)))
    assert(out("B") === ((1L, 1L, 4L, 4L, 1000000L)))
  }


  test("kmFromDurations: textbook product-limit with censoring") {
    // t=1 obs, t=2 obs, t=2 cens, t=3 obs:
    //   S(1)=3/4 -> 749999 (quantized-ln grid), S(2)=1/2 -> 499999,
    //   S(3): d=n at risk -> exactly 0
    val subj = Seq((1L, true), (2L, true), (2L, false), (3L, true))
      .toDF("t", "obs")
    val out = TimeAgg.kmFromDurations(subj, "t", "obs")
      .orderBy("t_days").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toList === List((1L, 4L, 1L, 0L, 749999L),
      (2L, 3L, 1L, 1L, 499999L), (3L, 1L, 1L, 0L, 0L)))
  }

  test("interEventSurvival: gaps per user, last event censored at edge") {
    val us = 86400000000L // one day
    val ev = Seq(
      (1L, 10L, 0L * us), (1L, 11L, 1L * us), (1L, 12L, 3L * us),
      (2L, 20L, 0L * us), (2L, 21L, 4L * us))
      .toDF("user_id", "event_id", "ts_us")
    // gaps: u1: 1d, 2d, censored 1d (edge 4d); u2: 4d, censored 0d
    val out = TimeAgg.interEventSurvival(ev, "user_id", "event_id", "ts_us")
      .orderBy("t_days").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toList === List((0L, 5L, 0L, 1L), (1L, 4L, 1L, 1L),
      (2L, 2L, 1L, 0L), (4L, 1L, 1L, 0L)))
  }

  test("nelsonAalen: cumulative hazard is the exact integer sum of " +
      "d/n increments") {
    // same textbook frame as the KM spec: increments 1/4, 1/3, 1/1
    val subj = Seq((1L, true), (2L, true), (2L, false), (3L, true))
      .toDF("t", "obs")
    val out = TimeAgg.nelsonAalen(subj, "t", "obs")
      .orderBy("t_days").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    val q = 1000000000000L
    assert(out.toList === List((1L, 4L, q / 4), (2L, 3L, q / 4 + q / 3),
      (3L, 1L, q / 4 + q / 3 + q)))
  }

  test("logRank: identical cohorts give O-E = 0 and no signal") {
    // two cohorts with the SAME duration multiset
    val subj = Seq((0L, 1L, true), (0L, 2L, true), (0L, 3L, false),
      (1L, 1L, true), (1L, 2L, true), (1L, 3L, false))
      .toDF("grp", "t", "obs")
    val r = TimeAgg.logRank(subj, "t", "obs", "grp").collect().head
    assert(r.getLong(0) === 2L)              // two event times
    assert(r.getLong(1) === 2L && r.getLong(2) === 2L)
    assert(r.getLong(3) === 0L)              // exact O-E cancellation
    assert(r.getLong(5) === 0L)              // chi ~ 0
  }

  test("logRank: one-sided events load O-E fully onto cohort 1") {
    // cohort 1 has all the events; cohort 0 only censored subjects
    val subj = Seq((1L, 1L, true), (1L, 2L, true),
      (0L, 5L, false), (0L, 5L, false))
      .toDF("grp", "t", "obs")
    val r = TimeAgg.logRank(subj, "t", "obs", "grp").collect().head
    // t=1: d1=1, n1=2, n=4 -> e1 = 1/2; t=2: d1=1, n1=1, n=3 -> 1/3
    // O-E = 2 - 5/6 = 7/6
    assert(r.getLong(1) === 2L && r.getLong(2) === 0L)
    val exp = (1000000000L * (1L * 4L - 1L * 2L)) / 4L +
      (1000000000L * (1L * 3L - 1L * 1L)) / 3L
    assert(r.getLong(3) === exp)
    assert(r.getLong(5) > 0L)
  }

  test("seasonalDecompose: pure weekly pattern over a linear-free base " +
      "— exact trend, seasonal absorbs the pattern, residual zero") {
    val day0 = 20000L // epoch days
    val pattern = Array(3L, -1L, -2L, 0L, 1L, 2L, -3L) // sums to 0
    val rows = for {
      d <- 0 until 21
      day = day0 + d
      x = 5L + pattern(((day + 3) % 7).toInt)
      _ <- 1L to x
    } yield Tuple1(day * 86400000000L)
    val ev = rows.toDF("ts_us").withColumn("g", lit("e"))
    val out = TimeAgg.seasonalDecompose(ev, "g", "ts_us")
      .orderBy("day").collect()
    // full-window days only: day0+3 .. day0+17
    assert(out.length === 15)
    assert(out.head.getLong(1) === day0 + 3)
    assert(out.last.getLong(1) === day0 + 17)
    out.foreach { r =>
      val dow = ((r.getLong(1) + 3) % 7).toInt
      assert(r.getLong(3) === 5000000L) // MA-7 of a zero-sum pattern
      assert(r.getLong(4) === 1000000L * pattern(dow)) // detrended
      assert(r.getLong(5) === 1000000L * pattern(dow)) // seasonal mean
      assert(r.getLong(6) === 0L) // residual
    }
  }

  test("seasonalDecompose: a missing day densifies to a real zero and " +
      "perturbs the window sums around it") {
    val day0 = 20000L
    // 9 days of constant 2 events, except day0+4 has none
    val rows = for {
      d <- 0 until 9 if d != 4
      _ <- 1 to 2
    } yield Tuple1((day0 + d) * 86400000000L)
    val ev = rows.toDF("ts_us").withColumn("g", lit("e"))
    val out = TimeAgg.seasonalDecompose(ev, "g", "ts_us")
      .orderBy("day").collect()
    // full-window days: day0+3 .. day0+5; window sums all 12 (6·2 + 0)
    assert(out.map(_.getLong(1)).toList ===
      List(day0 + 3, day0 + 4, day0 + 5))
    out.foreach(r => assert(r.getLong(3) === (1000000L * 12) / 7))
    assert(out(1).getLong(2) === 0L) // the densified zero day
  }

  test("decompositionStrength: pure weekly pattern maxes F_S with F_T " +
      "undefined; pure linear trend maxes F_T with F_S undefined") {
    val day0 = 20000L
    val pattern = Array(3L, -1L, -2L, 0L, 1L, 2L, -3L)
    val seasonal = (for {
      d <- 0 until 21; day = day0 + d
      x = 5L + pattern(((day + 3) % 7).toInt); _ <- 1L to x
    } yield Tuple1(day * 86400000000L))
      .toDF("ts_us").withColumn("g", lit("s"))
    val rs = TimeAgg.decompositionStrength(seasonal, "g", "ts_us")
      .collect().head
    // residual variance 0, seasonal carries everything; trend+resid
    // is the constant 5e6 -> F_T has no denominator
    assert(rs.getLong(1) === 15L && rs.getLong(2) === 1000000L)
    assert(rs.isNullAt(3))
    // linear ramp: MA-7 reproduces the center exactly, detrended = 0
    val ramp = (for {
      d <- 0 until 13; _ <- 0 until (d + 1)
    } yield Tuple1((day0 + d) * 86400000000L))
      .toDF("ts_us").withColumn("g", lit("t"))
    val rt = TimeAgg.decompositionStrength(ramp, "g", "ts_us")
      .collect().head
    assert(rt.isNullAt(2) && rt.getLong(3) === 1000000L)
  }

  test("markovEntropyRate: deterministic flip-flop has zero rate; " +
      "branching chain matches the per-cell quantized fold") {
    val flip = (0 until 8).map(i =>
      ("u1", i.toLong, 1000L + i, if (i % 2 == 0) "a" else "b"))
      .toDF("user_id", "event_id", "ts_us", "event_type")
    val rf = TimeAgg.markovEntropyRate(flip, "user_id", "ts_us",
      "event_type", "event_id", rounds = 5).collect().head
    assert((rf.getLong(0), rf.getLong(1), rf.getLong(2)) === ((2L, 2L, 0L)))
    // [a,b,a,c]: from-a branches 50/50 — expected recomputed from the
    // exact component outputs with the operator's own op order
    val br = Seq(("u1", 0L, 1000L, "a"), ("u1", 1L, 1001L, "b"),
      ("u1", 2L, 1002L, "a"), ("u1", 3L, 1003L, "c"))
      .toDF("user_id", "event_id", "ts_us", "event_type")
    val pi = TimeAgg.markovStationary(br, "user_id", "ts_us",
      "event_type", "event_id", rounds = 5)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val tr = TimeAgg.markovTransitions(br, "user_id", "ts_us",
      "event_type", "event_id")
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    val expected = tr.map { case (f, n, rn) =>
      math.floor(1.0e9 * ((pi(f).toDouble / 1.0e12) *
        (n.toDouble / rn.toDouble)) *
        math.log(rn.toDouble / n.toDouble)).toLong
    }.sum
    val rb = TimeAgg.markovEntropyRate(br, "user_id", "ts_us",
      "event_type", "event_id", rounds = 5).collect().head
    assert((rb.getLong(0), rb.getLong(1)) === ((3L, 3L)))
    assert(rb.getLong(2) === expected && rb.getLong(2) > 0L)
  }

  test("kmGreenwood: exact Greenwood increments; whole-risk-set death " +
      "pins se to 0; censor-only steps add nothing") {
    val subj = Seq((1L, true), (1L, true), (2L, true))
      .toDF("t", "obs")
    val out = TimeAgg.kmGreenwood(subj, "t", "obs")
      .orderBy("t_days").collect()
    // t=1: d=2 of n=3 -> g = floor(1e12 * 2/3)
    assert(out(0).getLong(5) === 666666666666L)
    assert(out(0).getLong(6) === math.floor(
      out(0).getLong(4).toDouble *
        math.sqrt(666666666666L.toDouble / 1.0e12)).toLong)
    // t=2: d = n_risk -> S = 0, se = 0 by the contract
    assert(out(1).getLong(4) === 0L && out(1).getLong(6) === 0L)
    val cens = Seq((1L, true), (2L, false)).toDF("t", "obs")
    val oc = TimeAgg.kmGreenwood(cens, "t", "obs")
      .orderBy("t_days").collect()
    assert(oc(0).getLong(5) === 500000000000L)
    assert(oc(1).getLong(5) === 500000000000L) // censor step: +0
  }
}
