package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // ---- Count-Min ---------------------------------------------------------

  test("cmsCounters: exactly depth*distinct-slots rows; totals preserved per row") {
    val vals = (1L to 300L).map(i => s"t${i % 40}").toDF("v")
    val c = Sketches.cmsCounters(vals, "v", width = 16, depth = 3).collect()
    assert(c.map(_.getAs[Int]("row")).toSet === Set(0, 1, 2))
    // every CMS row partitions ALL 300 occurrences across its slots
    val byRow = c.groupBy(_.getAs[Int]("row"))
      .map { case (r, rows) => r -> rows.map(_.getAs[Long]("c")).sum }
    assert(byRow.values.toSet === Set(300L))
    assert(c.forall(r => r.getAs[Long]("slot") >= 0 && r.getAs[Long]("slot") < 16))
  }

  test("cmsEstimate never under-counts and is exact for unique slots") {
    val vals = (1L to 500L).map(i => s"term${i % 25}").toDF("v")
    val counters = Sketches.cmsCounters(vals, "v", width = 64, depth = 4)
    val exact = vals.groupBy(col("v")).agg(count(lit(1)).as("exact"))
    val est = Sketches.cmsEstimate(counters, exact, "v", width = 64, depth = 4)
      .collect()
    assert(est.forall(r => r.getAs[Long]("cms_count") >= r.getAs[Long]("exact")))
    // a term absent from the build side still probes (left join → >= 0)
    val miss = Sketches.cmsEstimate(counters,
      Seq("never-seen-term-xyz").toDF("v"), "v", width = 64, depth = 4)
      .collect()
    assert(miss.length === 1 && miss.head.getAs[Long]("cms_count") >= 0L)
  }

  test("cms is partition-order free") {
    val vals = (1L to 400L).map(i => s"w${i % 31}").toDF("v")
    def run(df: org.apache.spark.sql.DataFrame) =
      Sketches.cmsCounters(df, "v", width = 32, depth = 4)
        .orderBy("row", "slot").collect().toSeq
    assert(run(vals.coalesce(1)) === run(vals.repartition(13)))
  }

  // ---- HyperLogLog -------------------------------------------------------

  test("hllRegisters: rho matches a driver-side bit computation") {
    val vals = Seq(("g", "alpha"), ("g", "beta"), ("g", "gamma")).toDF("grp", "v")
    val regs = Sketches.hllRegisters(vals, "v", "grp", m = 64)
      .as[(String, Long, Int)].collect().map(t => (t._2, t._3)).toMap
    def md560(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d.substring(0, 15), 16)
    }
    Seq("alpha", "beta", "gamma").foreach { s =>
      val h = md560(s)
      val suffix = h >>> 6
      val rho = if (suffix == 0) 55 else 55 - (64 - java.lang.Long.numberOfLeadingZeros(suffix))
      assert(regs.get(h % 64).exists(_ >= rho))
    }
  }

  test("hllEstimate: within 25% of truth at 10k distinct values, deterministic") {
    val vals = (1L to 10000L).map(i => ("g", s"value-$i")).toDF("grp", "v")
    val est1 = Sketches.hllEstimate(
      Sketches.hllRegisters(vals, "v", "grp", m = 64), "grp", m = 64)
      .collect().head.getAs[Double]("hll_est")
    val est2 = Sketches.hllEstimate(
      Sketches.hllRegisters(vals.repartition(17), "v", "grp", m = 64),
      "grp", m = 64)
      .collect().head.getAs[Double]("hll_est")
    assert(est1 === est2) // bit-identical across partitionings
    assert(math.abs(est1 - 10000.0) / 10000.0 < 0.25,
      s"raw HLL estimate $est1 too far from 10000")
  }

  test("hllEstimate: duplicate values do not move the estimate") {
    val once = (1L to 200L).map(i => ("g", s"d$i")).toDF("grp", "v")
    val dup = (1L to 200L).flatMap(i => Seq.fill(5)(("g", s"d$i"))).toDF("grp", "v")
    val e1 = Sketches.hllEstimate(
      Sketches.hllRegisters(once, "v", "grp", m = 64), "grp", 64)
      .collect().head.getAs[Double]("hll_est")
    val e2 = Sketches.hllEstimate(
      Sketches.hllRegisters(dup, "v", "grp", m = 64), "grp", 64)
      .collect().head.getAs[Double]("hll_est")
    assert(e1 === e2)
  }

  test("heavyHitters: exact counts above N/den; partition-layout free") {
    // 100 'hot' + 50 'warm' + 150 singletons → N = 300
    // den = 4: threshold 75 → only 'hot'; den = 8: 37.5 → hot + warm
    val vals = (Seq.fill(100)("hot") ++ Seq.fill(50)("warm") ++
      (1 to 150).map(i => s"cold$i")).toDF("v")
    val r4 = Sketches.heavyHitters(vals, "v", den = 4)
      .as[(String, Long)].collect().toMap
    assert(r4 === Map("hot" -> 100L))
    val r8 = Sketches.heavyHitters(vals, "v", den = 8)
      .as[(String, Long)].collect().toMap
    assert(r8 === Map("hot" -> 100L, "warm" -> 50L))
    // MG candidates differ per layout; the exact recount must not
    for (parts <- Seq(1, 3, 17)) {
      val r = Sketches.heavyHitters(vals.repartition(parts), "v", den = 8)
        .as[(String, Long)].collect().toMap
      assert(r === r8, s"layout $parts changed the heavy-hitter set")
    }
  }

  // ---- KMV ----------------------------------------------------------------

  test("kmvMinima: k smallest distinct hashes, duplicates collapse") {
    val vals = (Seq.fill(5)("x") ++ Seq("y", "z", "w")).map(("s", _))
      .toDF("set", "v")
    val out = Sketches.kmvMinima(vals, "set", "v", k = 3).collect()
    assert(out.length === 3, "4 distinct values, bottom-3 kept")
    assert(out.map(_.getLong(2)).sorted.toSeq === Seq(1L, 2L, 3L))
    val hs = out.map(_.getLong(1))
    assert(hs.distinct.length === 3 && hs.sorted.toSeq === hs.sorted.toSeq)
  }

  test("kmvOverlapPairs: sub-k sets give EXACT union/intersection") {
    // |A| = 4, |B| = 4, |A ∩ B| = 2 -> union 6 < k: everything exact
    val vals = (Seq("p", "q", "c1", "c2").map(("A", _)) ++
      Seq("r", "t", "c1", "c2").map(("B", _))).toDF("set", "v")
    val r = Sketches.kmvOverlapPairs(vals, "set", "v", k = 64).collect()(0)
    assert((r.getString(0), r.getString(1)) === (("A", "B")))
    assert(r.getLong(2) === 6L)             // merged minima
    assert(r.getLong(3) === 2L)             // shared
    assert(r.getLong(4) === 6000000L)       // exact union
    assert(r.getLong(5) === (1000000L * 2) / 6)
    assert(r.getLong(6) === (2L * 6000000L) / 6)
  }

  test("kmvOverlapPairs: estimate tracks truth within KMV error at k=256") {
    // two 2000-element sets sharing 1000 -> union 3000, jacc 1/3
    val a = (1 to 2000).map(i => ("A", s"v$i"))
    val b = (1001 to 3000).map(i => ("B", s"v$i"))
    val r = Sketches.kmvOverlapPairs((a ++ b).toDF("set", "v"),
      "set", "v", k = 256).collect()(0)
    val union = r.getLong(4) / 1e6
    assert(union > 2400 && union < 3600,
      s"union estimate $union too far from 3000") // ~6% rse at k=256
    val jacc = r.getLong(5) / 1e6
    assert(jacc > 0.2 && jacc < 0.47, s"jaccard $jacc too far from 1/3")
  }

  test("kmvOverlapPairs: deterministic across partition layouts") {
    val vals = (1 to 500).map(i => (s"s${i % 3}", s"v${i % 211}"))
      .toDF("set", "v")
    val r1 = Sketches.kmvOverlapPairs(vals.repartition(1), "set", "v", 32)
      .orderBy("set_a", "set_b").collect().toSeq.toString
    val r17 = Sketches.kmvOverlapPairs(vals.repartition(17), "set", "v", 32)
      .orderBy("set_a", "set_b").collect().toSeq.toString
    assert(r1 === r17)
  }
}
