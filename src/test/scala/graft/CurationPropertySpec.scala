package graft

import org.scalacheck.{Gen, Prop}

import graft.operators.{Curation, TimeAgg}

/** Property tests for the curation operators' structural invariants —
  * the guarantees downstream pipelines build on, checked over random
  * corpora rather than hand-picked examples. Generators are kept small
  * (each property collects a DataFrame per case) and cases few; the
  * point is shape coverage, not volume.
  */
class CurationPropertySpec extends SparkSpec {
  import spark.implicits._

  private val minSucc = 12

  /** Run a property with scalacheck's own runner (no scalatestplus
    * bridge in the offline dep set) and fail the test on any
    * counterexample.
    */
  private def check(p: Prop, seed: Long = 20260813L): Unit = {
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(minSucc)
      .withInitialSeed(org.scalacheck.rng.Seed(seed)) // reproducible runs
    val res = org.scalacheck.Test.check(params, p)
    assert(res.passed, s"property failed: ${res.status}")
  }

  private val wordGen = Gen.oneOf("alpha", "beta", "gamma", "delta", "x", "yy")
  private val textGen = Gen.chooseNum(0, 40).flatMap(n =>
    Gen.listOfN(n, wordGen).map(_.mkString(" ")))
  private val corpusGen = Gen.chooseNum(1, 8).flatMap(n =>
    Gen.listOfN(n, textGen).map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) }))

  test("chunkTokens: chunks cover every token when stride <= chunkSize, " +
    "starts strictly increase, no chunk is contained in its predecessor") {
    val gen = for {
      docs <- corpusGen
      chunk <- Gen.chooseNum(1, 8)
      stride <- Gen.chooseNum(1, chunk) // overlapping / aligned regime
    } yield (docs, chunk, stride)
    check(Prop.forAllNoShrink(gen) { case (docs, chunk, stride) =>
      val df = docs.toDF("doc_id", "text")
      val chunks = Curation.chunkTokens(df, "doc_id", "text", chunk, stride)
        .select("doc_id", "start_tok", "n_chunk_tokens")
        .as[(Long, Int, Int)].collect().groupBy(_._1)
      docs.forall { case (id, text) =>
        val nTok = text.split("\\s+", -1).length // split("") → 1, matches tokens()
        val cs = chunks.getOrElse(id, Array.empty).sortBy(_._2)
        val covered = cs.map(c => c._2 + c._3 - 1).foldLeft(0)(math.max)
        val increasing = cs.map(_._2).sliding(2).forall(w => w.length < 2 || w(0) < w(1))
        val noRedundant = cs.sliding(2).forall(w => w.length < 2 ||
          w(1)._2 + w(1)._3 - 1 > w(0)._2 + w(0)._3 - 1) // tail extends coverage
        covered == nTok && increasing && noRedundant
      }
    })
  }

  test("sessionize: per-key indices are contiguous 1..k and split exactly at gaps") {
    val evGen = Gen.chooseNum(1, 20).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 500L)).map(_.zipWithIndex.map {
        case (ts, i) => (i.toLong % 3, ts * 1000000L, i.toLong) // 3 keys
      }))
    check(Prop.forAllNoShrink(evGen, Gen.chooseNum(1L, 200L)) { (rows, gapSec) =>
      val gap = gapSec * 1000000L
      val out = TimeAgg.sessionize(rows.toDF("k", "ts_us", "eid"),
        Seq("k"), "ts_us", gap, Seq("eid"))
        .select("k", "ts_us", "eid", "session_idx")
        .as[(Long, Long, Long, Long)].collect()
      out.groupBy(_._1).forall { case (_, g) =>
        val sorted = g.sortBy(r => (r._2, r._3))
        val idx = sorted.map(_._4)
        val contiguous = idx.head == 1L &&
          idx.sliding(2).forall(w => w.length < 2 || w(1) - w(0) == 0 || w(1) - w(0) == 1)
        val splitsRight = sorted.sliding(2).forall { w =>
          w.length < 2 || {
            val brk = w(1)._2 - w(0)._2 > gap
            (w(1)._4 - w(0)._4 == 1) == brk
          }
        }
        contiguous && splitsRight
      }
    })
  }

  test("repetitionSignals: fractions bounded in [0,1]; token count matches") {
    check(Prop.forAllNoShrink(corpusGen) { docs =>
      val r = Curation.repetitionSignals(docs.toDF("doc_id", "text"), "doc_id", "text")
        .select("doc_id", "n_tokens", "top2_frac", "top3_frac", "dup2_frac", "dup5_frac")
        .as[(Long, Long, Double, Double, Double, Double)].collect()
      r.length == docs.length && r.forall { case (id, n, t2, t3, d2, d5) =>
        val text = docs.find(_._1 == id).get._2
        val expN = if (text.trim.isEmpty) 0L else text.trim.split("\\s+").length.toLong
        n == expN && Seq(t2, t3, d2, d5).forall(f => f >= 0.0 && f <= 1.0)
      }
    })
  }

  test("stratifiedSplit: whitespace/case variants always co-locate") {
    val variantGen = for {
      words <- Gen.nonEmptyListOf(wordGen)
      seps  <- Gen.listOfN(words.length, Gen.oneOf(" ", "  ", "\t", " \t "))
      upcase <- Gen.listOfN(words.length, Gen.oneOf(true, false))
    } yield {
      val base = words.mkString(" ")
      val variant = words.zip(upcase).map { case (w, u) => if (u) w.toUpperCase else w }
        .zip(seps).map { case (w, s) => w + s }.mkString.trim
      (base, variant)
    }
    check(Prop.forAllNoShrink(variantGen) { case (base, variant) =>
      val r = Curation.stratifiedSplit(
        Seq((1L, base), (2L, variant)).toDF("doc_id", "text"), "text")
        .select("split").as[String].collect()
      r(0) == r(1)
    })
  }

  test("perplexityBuckets: every doc gets exactly one bucket; bucket order " +
    "respects score order (no head doc scores below a tail doc)") {
    check(Prop.forAllNoShrink(corpusGen) { docs =>
      val df = docs.toDF("doc_id", "text")
      val lm = Curation.fitUnigramLm(df, "text")
      val r = Curation.perplexityBuckets(df, lm, "doc_id", "text")
        .select("doc_id", "logprob_mean", "bucket")
        .as[(Long, Option[Double], String)].collect()
      val oneEach = r.length == docs.length &&
        r.forall(t => Set("head", "middle", "tail").contains(t._3))
      val scored = r.filter(_._2.isDefined)
      def worst(b: String) = scored.filter(_._3 == b).map(_._2.get)
      val ordered =
        (worst("head").isEmpty || worst("middle").isEmpty ||
          worst("head").min > worst("middle").max) &&
        (worst("middle").isEmpty || worst("tail").isEmpty ||
          worst("middle").min > worst("tail").max)
      oneEach && ordered
    })
  }

  test("sourceQualityStats: n_docs partitions the corpus; dup_ratio in [0,1); " +
    "verdict matches the emitted stats") {
    val srcGen = Gen.chooseNum(2, 10).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.oneOf("s1", "s2", "s3"), textGen)))
    check(Prop.forAllNoShrink(srcGen) { rows =>
      val df = rows.zipWithIndex
        .map { case ((s, t), i) => (i.toLong, s, t) }
        .toDF("doc_id", "source", "text")
      val r = Curation.sourceQualityStats(df, "text", "source",
        Seq("the", "a"), 0.2, 0.4)
        .as[(String, Long, Double, Double, Boolean)].collect()
      r.map(_._2).sum == rows.length &&
        r.forall(t => t._4 >= 0.0 && t._4 < 1.0) &&
        r.forall(t => t._5 == (t._3 >= 0.2 && t._4 <= 0.4))
    })
  }

  test("sparseCosinePairs: cosines in (0,1]; symmetric under id relabeling " +
    "to reversed order (pair set is orientation-free)") {
    check(Prop.forAllNoShrink(corpusGen) { docs =>
      val df = docs.toDF("doc_id", "text")
      val r = graft.operators.Similarity
        .sparseCosinePairs(df, "doc_id", "text", maxTermDf = 50, minCosine = 0.5)
        .as[(Long, Long, Long, Double, Boolean)].collect()
      val bounded = r.forall(t => t._4 > 0.0 && t._4 <= 1.0 && t._1 < t._2)
      // relabel ids in reverse: the UNDIRECTED pair set must be identical
      val n = docs.length.toLong
      val flipped = df.selectExpr(s"$n - 1 - doc_id AS doc_id", "text")
      val r2 = graft.operators.Similarity
        .sparseCosinePairs(flipped, "doc_id", "text", maxTermDf = 50, minCosine = 0.5)
        .as[(Long, Long, Long, Double, Boolean)].collect()
      def undirected(ps: Array[(Long, Long, Long, Double, Boolean)], flip: Boolean) =
        ps.map { t =>
          val (a, b) = if (flip) (n - 1 - t._1, n - 1 - t._2) else (t._1, t._2)
          (Set(a, b), t._3, t._4, t._5)
        }.toSet
      bounded && undirected(r, flip = false) == undirected(r2, flip = true)
    })
  }

  test("heavyHitters equals the brute-force threshold set on random streams") {
    val streamGen = Gen.chooseNum(1, 120).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h")))
    val gen = for {
      vals <- streamGen
      den <- Gen.chooseNum(2, 6)
      parts <- Gen.chooseNum(1, 5)
    } yield (vals, den, parts)
    check(Prop.forAllNoShrink(gen) { case (vals, den, parts) =>
      val df = vals.toDF("v").repartition(parts)
      val got = graft.operators.Sketches.heavyHitters(df, "v", den)
        .as[(String, Long)].collect().toMap
      val exact = vals.groupBy(identity).view.mapValues(_.size.toLong)
        .filter { case (_, c) => c * den > vals.length }.toMap
      got == exact
    })
  }

  test("exactRanks emits a 1..n permutation per group on random data") {
    val gen = Gen.chooseNum(1, 60).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.oneOf("g1", "g2"), Gen.chooseNum(0L, 50L))))
    check(Prop.forAllNoShrink(gen) { rows =>
      val df = rows.zipWithIndex
        .map { case ((g, v), i) => (i.toLong, g, v) }
        .toDF("id", "g", "v")
      val r = graft.operators.Quantiles
        .exactRanks(df, "g", "v", bucketWidth = 7L, tieCols = Seq("id"))
        .select("g", "rank", "grp_n").as[(String, Long, Long)].collect()
      r.groupBy(_._1).forall { case (_, rs) =>
        val n = rs.head._3
        rs.forall(_._3 == n) && rs.map(_._2).sorted.toSeq == (1L to n)
      }
    })
  }

  test("winsorize keeps every row, clips into [lo, hi], lo <= hi") {
    val gen = Gen.chooseNum(1, 50).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 200L)))
    check(Prop.forAllNoShrink(gen) { vals =>
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, "g", v) }
        .toDF("id", "g", "v")
      val r = graft.operators.Quantiles
        .winsorize(df, "g", "v", bucketWidth = 16L, lo = (1, 10),
          hi = (9, 10))
        .select("lo", "hi", "v_clipped").as[(Long, Long, Long)].collect()
      r.length == vals.length &&
        r.forall(t => t._1 <= t._2 && t._3 >= t._1 && t._3 <= t._2)
    })
  }

  test("aucExact matches brute-force pairwise AUC on random inputs") {
    val gen = Gen.chooseNum(2, 40).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.chooseNum(0L, 10L), Gen.oneOf(true, false))))
    check(Prop.forAllNoShrink(gen) { rows =>
      val df = rows.toDF("s", "y")
      val got = graft.operators.Eval.aucExact(df, "s",
        org.apache.spark.sql.functions.col("y")).collect().head
      val pos = rows.filter(_._2).map(_._1)
      val neg = rows.filterNot(_._2).map(_._1)
      if (pos.isEmpty || neg.isEmpty) got.isNullAt(2)
      else {
        val wins = (for (p <- pos; n <- neg) yield
          if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
        val expect = math.floor(1e6 * wins / (pos.size * neg.size)).toLong
        // brute force sums halves in doubles; the engine is integer-exact.
        // 2·wins is integral, so both compute the same rational exactly.
        got.getLong(2) == expect
      }
    })
  }

  test("mlmMaskPlan/spanCorruptPlan: positions in range, disjoint spans") {
    check(Prop.forAllNoShrink(corpusGen) { docs =>
      val df = docs.toDF("doc_id", "text")
      val nTok = docs.map { case (id, t) =>
        id -> t.split("\\s+").count(_.nonEmpty) }.toMap
      val mask = Curation.mlmMaskPlan(df, "doc_id", "text")
        .select("doc_id", "pos").as[(Long, Long)].collect()
      val spans = Curation.spanCorruptPlan(df, "doc_id", "text")
        .select("doc_id", "span_start", "span_len")
        .as[(Long, Long, Long)].collect()
      val maskOk = mask.forall { case (id, p) => p >= 1 && p <= nTok(id) }
      val spanOk = spans.forall { case (id, st, ln) =>
        st >= 1 && ln >= 1 && st + ln - 1 <= nTok(id) }
      val disjoint = spans.groupBy(_._1).forall { case (_, ss) =>
        val ivs = ss.map(s => (s._2, s._2 + s._3 - 1)).sortBy(_._1)
        ivs.zip(ivs.drop(1)).forall { case ((_, e1), (s2, _)) => s2 > e1 }
      }
      maskOk && spanOk && disjoint
    })
  }
}
