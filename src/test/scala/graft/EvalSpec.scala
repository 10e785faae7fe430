package graft

import org.apache.spark.sql.functions._

import graft.operators.Eval

class EvalSpec extends SparkSpec {
  import spark.implicits._

  private def auc(rows: Seq[(Long, Boolean)]): (Long, Long, Option[Long]) = {
    val df = rows.toDF("s", "y")
    val r = Eval.aucExact(df, "s", col("y")).collect().head
    (r.getLong(0), r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long]))
  }

  test("aucExact: perfect separation is 1.0, reversed is 0.0") {
    assert(auc(Seq((10L, true), (9L, true), (2L, false), (1L, false))) ===
      ((2L, 2L, Some(1000000L))))
    assert(auc(Seq((1L, true), (2L, false))) === ((1L, 1L, Some(0L))))
  }

  test("aucExact: ties contribute one half (hand-computed)") {
    // pos scores {3, 2}, neg scores {2, 1}:
    // pairs: (3,2)=1, (3,1)=1, (2,2)=0.5, (2,1)=1 → AUC = 3.5/4 = 0.875
    assert(auc(Seq((3L, true), (2L, true), (2L, false), (1L, false))) ===
      ((2L, 2L, Some(875000L))))
  }

  test("aucExact: degenerate single-class input yields null AUC") {
    assert(auc(Seq((5L, true), (7L, true))) === ((2L, 0L, None)))
    assert(auc(Seq((5L, false))) === ((0L, 1L, None)))
  }

  test("mrrAtK: quantized reciprocals, absent queries count in the mean") {
    val ranked = Seq(
      (1L, 1, true), (1L, 2, true),   // first rel rank 1 → 1000000
      (2L, 1, false), (2L, 3, true),  // first rel rank 3 → 333333
      (3L, 1, false), (3L, 2, false), // no rel → 0
      (4L, 7, true)                   // rel beyond k → 0
    ).toDF("query_id", "rank", "rel")
    val r = Eval.mrrAtK(ranked, k = 5, nQueries = 5) // query 5 absent
      .as[(Long, Long)].head()
    assert(r === ((5L, (1000000L + 333333L) / 5L)))
  }

  test("ndcgAtK: perfect ranking scores 1e6; hand-computed partial") {
    def g(i: Int) = math.floor(1e6 / (math.log(1 + i) / math.log(2))).toLong
    val ranked = Seq(
      (1L, 1, true), (1L, 2, true), (1L, 3, false),  // ideal for n_rel=2
      (2L, 1, false), (2L, 2, false), (2L, 3, true), // 1 rel at rank 3
      (3L, 1, false)                                  // no rel
    ).toDF("query_id", "rank", "rel")
    val r = Eval.ndcgAtK(ranked, k = 5)
      .as[(Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._4))).toMap
    assert(r(1L) === ((2L, 1000000L)))
    val expect2 =
      math.floor(1e6 * g(3).toDouble / g(1).toDouble).toLong
    assert(r(2L) === ((1L, expect2)))
    assert(r(3L) === ((0L, 0L)))
  }

  test("calibration: pure-integer ECE on a hand 2-bucket table") {
    // bucket 0: scores 50000 ×2, labels (T, F) → pos 1, conf 100000
    //   |1e6·1 − 100000| = 900000
    // bucket 9: score 950000, label T → |1e6 − 950000| = 50000
    // ece = (900000 + 50000) div 3 = 316666
    val df = Seq((50000L, true), (50000L, false), (950000L, true))
      .toDF("s_q", "y")
    val r = Eval.calibration(df, "s_q", col("y"))
      .orderBy("bucket")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(r.map(_._1).toSeq === Seq(0L, 9L))
    assert(r(0) === ((0L, 2L, 1L, 100000L, 316666L)))
    assert(r(1) === ((9L, 1L, 1L, 950000L, 316666L)))
  }

  test("classReport: confusion margins and quantized P/R/F1") {
    // truth a×3 (pred a,a,b), truth b×1 (pred a)
    val df = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "a"))
      .toDF("truth", "pred")
    val r = Eval.classReport(df, "truth", "pred")
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3),
          Option(x.get(4)), Option(x.get(5))))).toMap
    // a: n_truth 3, n_pred 3, tp 2 → prec 666666, rec 666666
    assert(r("a") === ((3L, 3L, 2L, Some(666666L), Some(666666L))))
    // b: n_truth 1, n_pred 1, tp 0 → prec 0, rec 0 (f1 null: p+r = 0)
    assert(r("b") === ((1L, 1L, 0L, Some(0L), Some(0L))))
  }

  test("aucExact: null scores excluded; partition-order free") {
    val df = Seq((Some(3L), true), (None, true), (Some(1L), false))
      .toDF("s", "y")
    val r = Eval.aucExact(df, "s", col("y")).collect().head
    assert((r.getLong(0), r.getLong(1)) === ((1L, 1L)))
    val big = (1L to 500L).map(i => (i % 97, i % 3 == 0))
    val a = Eval.aucExact(big.toDF("s", "y").coalesce(1), "s", col("y"))
      .collect().head.get(2)
    val b = Eval.aucExact(big.toDF("s", "y").repartition(13), "s", col("y"))
      .collect().head.get(2)
    assert(a === b)
  }

  test("cohenKappa: hand-computed 2x2 case") {
    // confusion: (y,y)=20, (y,n)=5, (n,y)=10, (n,n)=15 → N=50, A=35
    // margA: y=25, n=25; margB: y=30, n=20 → S = 25·30 + 25·20 = 1250
    // κ = (50·35 − 1250)/(2500 − 1250) = 500/1250 = 0.4
    val rows = Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val r = Eval.cohenKappa(rows.toDF("a", "b"), "a", "b").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((50L, 35L, 1250L, 400000L)))
  }

  test("cohenKappa: perfect agreement is 1, constant raters are null") {
    val perfect = Seq(("a", "a"), ("b", "b"), ("c", "c"))
    val p = Eval.cohenKappa(perfect.toDF("a", "b"), "a", "b").collect().head
    assert(p.getLong(3) === 1000000L)
    val constant = Seq(("a", "a"), ("a", "a"))
    val c = Eval.cohenKappa(constant.toDF("a", "b"), "a", "b").collect().head
    assert(c.isNullAt(3)) // p_e = 1
  }

  test("cohenKappa: disjoint label sets give zero marginal product") {
    // raters never use the same label: S = 0, agree = 0 → κ = 0
    val r = Eval.cohenKappa(Seq(("x", "y"), ("x", "z")).toDF("a", "b"),
      "a", "b").collect().head
    assert((r.getLong(2), r.getLong(3)) === ((0L, 0L)))
  }

  test("twoProportionZ: hand-computed z and significance flag") {
    // n0=100 c0=10, n1=100 c1=20 → p̂=0.15,
    // se = sqrt(.15·.85·(0.02)) = sqrt(0.00255)
    // z = 0.1/0.050497...= 1.980295... → z_q = 1980295, significant
    val rows = (1L to 200L).map { i =>
      val v = i % 2
      val conv = if (v == 0) i <= 20 else i <= 40 // 10 evens ≤20, 20 odds ≤40
      (v, conv)
    }
    val r = Eval.twoProportionZ(rows.toDF("variant", "converted"),
      "variant", "converted").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((100L, 10L, 100L, 20L)))
    val expectedZ = math.floor(1000000.0 * (0.2 - 0.1) /
      math.sqrt(0.15 * 0.85 * (1.0 / 100 + 1.0 / 100))).toLong
    assert(r.getLong(4) === expectedZ)
    assert(r.getBoolean(5))
  }

  test("twoProportionZ: zero-rate pooled proportion yields null z") {
    val rows = Seq((0L, false), (1L, false), (0L, false), (1L, false))
    val r = Eval.twoProportionZ(rows.toDF("variant", "converted"),
      "variant", "converted").collect().head
    assert(r.isNullAt(4)) // se = 0
    assert(r.isNullAt(5))
  }

  // ------------------------------------------------------------- rboByDepth

  private def rbo(a: Seq[(String, Int, Long)], b: Seq[(String, Int, Long)],
                  k: Int): Seq[(String, Long, Long, Long)] =
    Eval.rboByDepth(a.toDF("query_id", "rank", "item"),
        b.toDF("query_id", "rank", "item"), k)
      .orderBy("query_id", "depth")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq

  test("rboByDepth: identical rankings give overlap = depth, term = 2^-d · 1e9") {
    val a = Seq(("q", 1, 10L), ("q", 2, 20L), ("q", 3, 30L))
    val out = rbo(a, a, 3)
    assert(out === Seq(("q", 1L, 1L, 500000000L), ("q", 2L, 2L, 250000000L),
      ("q", 3L, 3L, 125000000L)))
  }

  test("rboByDepth: disjoint rankings give zero overlap at every depth") {
    val a = Seq(("q", 1, 1L), ("q", 2, 2L))
    val b = Seq(("q", 1, 8L), ("q", 2, 9L))
    assert(rbo(a, b, 2) === Seq(("q", 1L, 0L, 0L), ("q", 2L, 0L, 0L)))
  }

  test("rboByDepth: an item enters the overlap at max(rank_a, rank_b)") {
    // item 5 is rank 1 in A, rank 3 in B → counts only from depth 3
    val a = Seq(("q", 1, 5L), ("q", 2, 6L), ("q", 3, 7L))
    val b = Seq(("q", 1, 8L), ("q", 2, 9L), ("q", 3, 5L))
    val out = rbo(a, b, 3)
    assert(out.map(_._3) === Seq(0L, 0L, 1L))
    // term(3) = floor(1e9 · (1/3) / 8)
    assert(out(2)._4 === math.floor(1000000000.0 * 1.0 / 3.0 / 8.0).toLong)
  }

  test("rboByDepth: ranks beyond k are ignored") {
    val a = Seq(("q", 1, 1L), ("q", 5, 2L))
    val b = Seq(("q", 1, 1L), ("q", 2, 2L))
    assert(rbo(a, b, 2).map(_._3) === Seq(1L, 1L))
  }

  test("averagePrecision: hand-ranked list with a tie broken by id") {
    // order (score desc, id asc): 1(+), 2(-), 3(+), 4(-)
    // ids 1 and 2 TIE at score 10 — id breaks it
    val rows = Seq((1L, 10L, true), (2L, 10L, false),
      (3L, 5L, true), (4L, 1L, false))
    val out = Eval.averagePrecision(rows.toDF("id", "s", "y"),
      "id", "s", col("y")).collect()(0)
    assert(out.getLong(0) === 2L) // n_pos
    assert(out.getLong(1) === 2L) // n_neg
    // AP = (⌊1e12·1/1⌋ + ⌊1e12·2/3⌋) div 2
    val want = (1000000000000L +
      math.floor(1.0e12 * 2.0 / 3.0).toLong) / 2
    assert(out.getLong(2) === want)
  }

  test("averagePrecision: all-positive gives exactly 1; no positives null") {
    val allPos = Eval.averagePrecision(
      Seq((1L, 3L, true), (2L, 2L, true)).toDF("id", "s", "y"),
      "id", "s", col("y")).collect()(0)
    assert(allPos.getLong(2) === 1000000000000L)
    val noPos = Eval.averagePrecision(
      Seq((1L, 3L, false)).toDF("id", "s", "y"),
      "id", "s", col("y")).collect()(0)
    assert(noPos.isNullAt(2))
  }

  test("brierDecomposition: hand buckets; rel - res + unc = brier") {
    // two extreme buckets: s=0 (one wrong, one right), s=1e6 (two right)
    val rows = Seq((0L, false), (0L, true), (1000000L, true),
      (1000000L, true))
    val out = Eval.brierDecomposition(rows.toDF("s", "y"), "s",
      col("y")).collect()(0)
    assert(out.getLong(0) === 4L)
    assert(out.getLong(1) === 3L)
    assert(out.getLong(2) === 250000000000L)  // 1e12/4
    assert(out.getLong(3) === 125000000000L)  // reliability 0.125
    assert(out.getLong(4) === 62500000000L)   // resolution 0.0625
    assert(out.getLong(5) === 187500000000L)  // uncertainty .75·.25
    // Murphy identity (every term here is binary-exact)
    assert(out.getLong(3) - out.getLong(4) + out.getLong(5) ===
      out.getLong(2))
  }

  test("fleissKappa: perfect agreement = 1, perfect disagreement = -1") {
    val agree = Seq((1L, "a"), (1L, "a"), (1L, "a"),
      (2L, "b"), (2L, "b"), (2L, "b"))
    val k1 = Eval.fleissKappa(agree.toDF("item", "r"), "item", "r",
      raters = 3).collect()(0)
    assert(k1.getLong(0) === 2L)
    assert(k1.getLong(2) === 1000000000000L) // pbar = 1
    assert(k1.getLong(3) === 500000000000L)  // pe = 1/2
    assert(k1.getLong(4) === 1000000000000L) // kappa = 1
    val disagree = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"))
    val k2 = Eval.fleissKappa(disagree.toDF("item", "r"), "item", "r",
      raters = 2).collect()(0)
    assert(k2.getLong(2) === 0L)
    assert(k2.getLong(4) === -1000000000000L)
  }

  test("averagePrecision: partition-order free (1 vs 17 partitions)") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 300L).map(i => (i, rnd.nextInt(50).toLong,
      rnd.nextBoolean()))
    val a = Eval.averagePrecision(rows.toDF("id", "s", "y").coalesce(1),
      "id", "s", col("y")).collect()(0).getLong(2)
    val b = Eval.averagePrecision(rows.toDF("id", "s", "y").repartition(17),
      "id", "s", col("y")).collect()(0).getLong(2)
    assert(a === b)
  }

  test("adjustedRand: identity = 1, independence = 0, degenerate null") {
    val same = Seq(("a", "x"), ("a", "x"), ("b", "y"))
    val r1 = Eval.adjustedRand(same.toDF("u", "v"), "u", "v").collect()(0)
    assert(r1.getLong(0) === 3L)
    assert(r1.getLong(1) === 1000000L) // RI = 1
    assert(r1.getLong(2) === 1000000L) // ARI = 1
    // one cluster vs all singletons: chance-level → ARI exactly 0
    val indep = Seq(("a", "x"), ("a", "y"), ("a", "z"))
    val r2 = Eval.adjustedRand(indep.toDF("u", "v"), "u", "v").collect()(0)
    assert(r2.getLong(2) === 0L)
    // both all-singletons: denominator 0 → ARI undefined
    val degen = Seq(("a", "x"), ("b", "y"))
    val r3 = Eval.adjustedRand(degen.toDF("u", "v"), "u", "v").collect()(0)
    assert(r3.isNullAt(2))
  }

  test("adjustedRand: renamed labels do not change the index") {
    val x = Seq(("a", "p"), ("a", "p"), ("b", "q"), ("b", "p"))
    val y = x.map { case (u, v) => (u.toUpperCase + "!", v + "?") }
    val rx = Eval.adjustedRand(x.toDF("u", "v"), "u", "v").collect()(0)
    val ry = Eval.adjustedRand(y.toDF("u", "v"), "u", "v").collect()(0)
    assert(rx.getLong(1) === ry.getLong(1))
    assert(rx.getLong(2) === ry.getLong(2))
  }

  test("errAtK: exact dyadic cascade terms") {
    // q1: rel at ranks 1 and 3 → 1/2 + (1/2)²/3 = 1/2 + 1/12 = 7/12
    // q2: rel at rank 2 only → 1/4
    // q3: no rel → 0
    val rows = Seq(
      ("q1", 1, true), ("q1", 2, false), ("q1", 3, true),
      ("q2", 1, false), ("q2", 2, true),
      ("q3", 1, false))
    val out = Eval.errAtK(rows.toDF("query_id", "rank", "rel"), k = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("q1") === 1000000000000L * (1920 / 2 + 1920 / 12) / 1920)
    assert(out("q2") === 1000000000000L * (1920 / 4) / 1920)
    assert(out("q3") === 0L)
  }

  test("errAtK: ranks beyond k are ignored") {
    val rows = Seq(("q", 1, false), ("q", 6, true))
    val out = Eval.errAtK(rows.toDF("query_id", "rank", "rel"), k = 5)
      .collect()(0)
    assert(out.getLong(1) === 0L)
  }

  test("mcc: perfect prediction +1, inverted -1, degenerate null") {
    val perfect = Seq((true, true), (true, true), (false, false))
    val m1 = Eval.mcc(perfect.toDF("p", "y"), col("p"), col("y"))
      .collect()(0)
    assert((m1.getLong(0), m1.getLong(2)) === ((2L, 1L)))
    assert(m1.getLong(4) === 1000000L)
    val inverted = Seq((true, false), (false, true))
    val m2 = Eval.mcc(inverted.toDF("p", "y"), col("p"), col("y"))
      .collect()(0)
    assert(m2.getLong(4) === -1000000L)
    // all-positive truth: TN+FP margin is 0 → undefined
    val degen = Seq((true, true), (false, true))
    val m3 = Eval.mcc(degen.toDF("p", "y"), col("p"), col("y")).collect()(0)
    assert(m3.isNullAt(4))
  }

  test("mcc: hand-computed mixed confusion") {
    // tp=2 fp=1 tn=3 fn=1: mcc = (6-1)/sqrt(3*3*4*4) = 5/12
    val rows = Seq((true, true), (true, true), (true, false),
      (false, false), (false, false), (false, false), (false, true))
    val m = Eval.mcc(rows.toDF("p", "y"), col("p"), col("y")).collect()(0)
    assert((m.getLong(0), m.getLong(1), m.getLong(2), m.getLong(3)) ===
      ((2L, 1L, 3L, 1L)))
    assert(m.getLong(4) === math.floor(1000000.0 * 5.0 / 12.0).toLong)
  }

  test("fleissKappa: kappa null when chance agreement is total") {
    // one category only: pe = 1 → denominator 0 → null
    val rows = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "a"))
    val out = Eval.fleissKappa(rows.toDF("item", "r"), "item", "r",
      raters = 2).collect()(0)
    assert(out.isNullAt(4))
  }

  test("mcnemar: hand discordant counts and the exact integer statistic") {
    import org.apache.spark.sql.functions.col
    // truth all true; A right on rows 1-6, B right on rows 1-3 and 7
    val df = (1 to 10).map(i => (i, i <= 6, i <= 3 || i == 7))
      .toDF("id", "a", "b")
    val out = Eval.mcnemar(df, col("a"), col("b"), lit(true)).collect()(0)
    assert(out.getLong(0) === 10L)
    assert(out.getLong(1) === 3L) // both right: 1-3
    assert(out.getLong(2) === 3L) // both wrong: 8-10
    assert(out.getLong(3) === 3L) // A-only: 4-6
    assert(out.getLong(4) === 1L) // B-only: 7
    assert(out.getLong(5) === 1000000L) // (1e6·(3−1)²) div 4
  }

  test("mcnemar: null statistic when the classifiers never disagree") {
    import org.apache.spark.sql.functions.col
    val df = Seq((1, true, true), (2, false, false)).toDF("id", "a", "b")
    val out = Eval.mcnemar(df, col("a"), col("b"), lit(true)).collect()(0)
    assert(out.isNullAt(5))
  }

  test("liftTable: perfectly-ranked labels — top deciles rate 10^6, " +
      "cumulative lift decays to exactly 10^6 at the last bin") {
    import org.apache.spark.sql.functions.col
    // scores 10..1, positives on the top 3 scores, 10 bins of 1 row
    val df = (1 to 10).map(i => (i.toLong, (11 - i).toLong, i <= 3))
      .toDF("doc_id", "score", "lbl")
    val out = Eval.liftTable(df, "score", col("lbl"), bins = 10,
      tieCols = Seq("doc_id")).orderBy("bin").collect()
    assert(out.length === 10)
    assert(out.map(_.getLong(1)).forall(_ === 1L))
    assert(out.take(3).map(_.getLong(3)).forall(_ === 1000000L))
    assert(out.drop(3).map(_.getLong(3)).forall(_ === 0L))
    // bin 0: lift = (1/1)/(3/10) = 10/3
    assert(out(0).getLong(4) === 3333333L)
    assert(out(2).getLong(4) === 3333333L)
    assert(out(9).getLong(4) === 1000000L)
  }

  test("liftTable: score ties break by the tie column, bins stay exact " +
      "when N is not divisible by bins") {
    import org.apache.spark.sql.functions.col
    // 5 rows, 2 bins → bins of 3 and 2 ((rank−1)·2 div 5)
    val df = Seq((1L, 5L, true), (2L, 5L, true), (3L, 5L, false),
      (4L, 1L, false), (5L, 1L, true)).toDF("doc_id", "score", "lbl")
    val out = Eval.liftTable(df, "score", col("lbl"), bins = 2,
      tieCols = Seq("doc_id")).orderBy("bin").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
      === List((0L, 3L, 2L), (1L, 2L, 1L)))
  }

  // ---- isotonicFit --------------------------------------------------------

  private def iso(rows: Seq[(Long, Boolean)]): Seq[(Long, Long)] = {
    val df = rows.toDF("bin", "y")
    Eval.isotonicFit(df, "bin", col("y")).orderBy("b")
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
  }

  /** Reference PAVA (pool adjacent violators), EXACT rational pooling
    * comparisons (p1/n1 > p2/n2 via cross-multiplication), quantized
    * only at output — floor commutes through the operator's max/min,
    * so the minimax form must equal ⌊10⁶·(exact PAVA fit)⌋.
    */
  private def pavaRef(bins: Seq[(Long, Long, Long)]): Seq[(Long, Long)] = {
    val blocks = collection.mutable.ArrayBuffer[(Long, Long, List[Long])]()
    bins.foreach { case (b, n, p) =>
      blocks += ((n, p, List(b)))
      while (blocks.length >= 2 && {
        val (n1, p1, _) = blocks(blocks.length - 2)
        val (n2, p2, _) = blocks.last
        p1 * n2 > p2 * n1
      }) {
        val (n2, p2, b2) = blocks.remove(blocks.length - 1)
        val (n1, p1, b1) = blocks.remove(blocks.length - 1)
        blocks += ((n1 + n2, p1 + p2, b1 ++ b2))
      }
    }
    blocks.flatMap { case (n, p, bs) =>
      // same fp sequence as the operator: (1e6 * p) / n, never 1e6 * (p/n)
      bs.map(_ -> math.floor(1000000.0 * p.toDouble / n.toDouble).toLong)
    }.toSeq
  }

  test("isotonicFit: already-monotone bins are returned unchanged") {
    val rows = Seq.fill(4)((0L, false)) ++ Seq((0L, true)) ++ // 1/5
      Seq((1L, true), (1L, false)) ++                          // 1/2
      Seq.fill(3)((2L, true))                                  // 3/3
    assert(iso(rows) === Seq((0L, 200000L), (1L, 500000L), (2L, 1000000L)))
  }

  test("isotonicFit: a violating pair pools to the joint rate") {
    // bin0 rate 1.0 over 2, bin1 rate 0.0 over 2 -> both pool to 0.5
    val rows = Seq((0L, true), (0L, true), (1L, false), (1L, false))
    assert(iso(rows) === Seq((0L, 500000L), (1L, 500000L)))
  }

  test("isotonicFit: minimax equals stack PAVA on an adversarial profile") {
    // rates: .8, .2, .6, .6, .1, .9 with uneven bin sizes
    val spec = Seq((0L, 5L, 4L), (1L, 5L, 1L), (2L, 10L, 6L),
      (3L, 5L, 3L), (4L, 10L, 1L), (5L, 4L, 4L))
    val rows = spec.flatMap { case (b, n, p) =>
      Seq.fill(p.toInt)((b, true)) ++ Seq.fill((n - p).toInt)((b, false))
    }
    val got = iso(rows)
    assert(got === pavaRef(spec))
    got.zip(got.tail).foreach { case ((_, f1), (_, f2)) =>
      assert(f1 <= f2, "fit must be nondecreasing")
    }
  }

  // ---- conformalInterval -----------------------------------------------------

  test("conformalInterval: hand-ranked residual order statistic") {
    // residuals |y - pred|: {0, 1, 2, 3, 4, 5, 6, 7, 8} (n = 9)
    // alpha = 1/10: k = ceil(9*10/10) = 9 -> qhat = 8 (the max)
    // alpha = 5/10: k = ceil(5*10/10) = 5 -> qhat = 4
    val df = (0L to 8L).map(r => ("g", 100L + r, 100L)).toDF("g", "y", "p")
    val strict = Eval.conformalInterval(df, "g", "y", "p", 1, 10).collect()(0)
    assert((strict.getLong(1), strict.getLong(2), strict.getLong(3)) ===
      ((9L, 9L, 8L)))
    val loose = Eval.conformalInterval(df, "g", "y", "p", 5, 10).collect()(0)
    assert((loose.getLong(2), loose.getLong(3)) === ((5L, 4L)))
  }

  test("conformalInterval: too few rows for the coverage -> null qhat") {
    // n = 3, alpha = 1/10: k = ceil(9*4/10) = 4 > 3 -> honest null
    val df = Seq(("g", 1L, 0L), ("g", 2L, 0L), ("g", 3L, 0L))
      .toDF("g", "y", "p")
    val r = Eval.conformalInterval(df, "g", "y", "p", 1, 10).collect()(0)
    assert(r.getLong(2) === 4L && r.isNullAt(3))
  }

  test("conformalInterval: tied residuals resolve through the grid counts") {
    // residuals {5, 5, 5, 0}: k at alpha=1/2 -> ceil(5*5/10) = 3 -> qhat 5
    val df = Seq(("g", 10L, 5L), ("g", 0L, 5L), ("g", 10L, 5L),
      ("g", 5L, 5L)).toDF("g", "y", "p")
    val r = Eval.conformalInterval(df, "g", "y", "p", 5, 10).collect()(0)
    assert(r.getLong(2) === 3L && r.getLong(3) === 5L)
  }

  // ---- aucCi ---------------------------------------------------------------

  test("aucCi: all-tied scores give A = 0.5 with the hand-computed HM se") {
    // one pos, one neg, same score: u2 = 1, A = 0.5; Q1 = Q2 = 1/3;
    // var = (0.25 + 0 + 0)/1 -> se = 0.5; CI clamps to [0, 1]
    val df = Seq((5L, true), (5L, false)).toDF("s", "y")
    val r = Eval.aucCi(df, "s", col("y")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((1L, 1L, 1L)))
    assert(r.getLong(3) === 500000L && r.getLong(4) === 500000L)
    assert(r.getLong(5) === 0L && r.getLong(6) === 1000000L)
  }

  test("aucCi: perfect separation gives se = 0 and a degenerate CI at 1") {
    val df = Seq((9L, true), (8L, true), (2L, false)).toDF("s", "y")
    val r = Eval.aucCi(df, "s", col("y")).collect()(0)
    assert(r.getLong(3) === 1000000L && r.getLong(4) === 0L)
    assert(r.getLong(5) === 1000000L && r.getLong(6) === 1000000L)
  }

  test("aucCi: auc_q agrees with aucExact on a mixed ranking") {
    val rows = Seq((10L, true), (9L, false), (8L, true), (7L, true),
      (5L, false), (5L, true), (2L, false))
    val a = Eval.aucExact(rows.toDF("s", "y"), "s", col("y"))
      .collect()(0).getLong(2)
    val c = Eval.aucCi(rows.toDF("s", "y"), "s", col("y")).collect()(0)
    assert(c.getLong(3) === a)
    assert(c.getLong(5) <= c.getLong(3) && c.getLong(3) <= c.getLong(6))
  }

  test("isotonicFit: null bins are ignored") {
    val df = Seq((Some(0L), true), (None, true), (Some(1L), false))
      .toDF("bin", "y")
    val out = Eval.isotonicFit(df, "bin", col("y")).collect()
    assert(out.length === 2)
  }

  // ------------------------------------------------ krippendorffAlpha

  test("krippendorffAlpha: one agreeing + one disagreeing pair lands " +
      "exactly at chance (alpha = 0)") {
    // u1: (x,x) — perfect; u2: (x,y) — disagreement
    // Do = 0.5, De = (16-10)/12 = 0.5 -> alpha = 0
    val df = Seq(("u1", "x"), ("u1", "x"), ("u2", "x"), ("u2", "y"))
      .toDF("item", "rating")
    val r = Eval.krippendorffAlpha(df, "item", "rating").collect().head
    assert(r.getLong(0) === 2L)   // n_units
    assert(r.getLong(1) === 4L)   // n_pairable
    assert(r.getLong(2) === 24L)  // do_num at S=12
    assert(r.getLong(3) === 6L)   // de_num = 16 - (9+1)
    assert(r.getLong(4) === 0L)
  }

  test("krippendorffAlpha: perfect agreement is alpha = 1, variable m") {
    val df = Seq(("u1", "a"), ("u1", "a"), ("u1", "a"),
      ("u2", "b"), ("u2", "b")).toDF("item", "rating")
    val r = Eval.krippendorffAlpha(df, "item", "rating").collect().head
    assert(r.getLong(2) === 0L)
    assert(r.getLong(4) === 1000000000000L)
  }

  test("krippendorffAlpha: units with a single rating are excluded " +
      "(pairable-values rule)") {
    val df = Seq(("u1", "a"), ("u1", "a"), ("lonely", "z"))
      .toDF("item", "rating")
    val r = Eval.krippendorffAlpha(df, "item", "rating").collect().head
    assert(r.getLong(0) === 1L && r.getLong(1) === 2L)
    // the lonely 'z' never reaches the category marginals either:
    // de_num = 4 - 4 = 0 -> alpha NULL (single category, undefined)
    assert(r.getLong(3) === 0L && r.isNullAt(4))
  }

  // ----------------------------------------------------- bradleyTerry

  test("bradleyTerry: two items converge to the win-ratio fixed point") {
    // A beats B 3x, B beats A 1x: w_A/w_B -> 3 (exact MM fixed point)
    val comps = Seq(("A", "B"), ("A", "B"), ("A", "B"), ("B", "A"))
      .toDF("w", "l")
    val out = Eval.bradleyTerry(comps, "w", "l", iters = 5).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("A") === ((3L, 4L, 1500000L)))
    assert(out("B") === ((1L, 4L, 500000L)))
  }

  test("bradleyTerry: a never-winning item pins to w_q = 0 and the " +
      "winner absorbs the mass") {
    val comps = Seq(("A", "B"), ("A", "B")).toDF("w", "l")
    val out = Eval.bradleyTerry(comps, "w", "l", iters = 3).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out("B") === 0L)
    assert(out("A") > 0L)
  }

  test("bradleyTerry: strength order follows dominance on a 3-chain") {
    // A>B 4x, B>C 4x, A>C 1x, C>A 1x: expect w_A >= w_B >= w_C
    val comps = (Seq.fill(4)(("A", "B")) ++ Seq.fill(4)(("B", "C")) ++
      Seq(("A", "C"), ("C", "A"))).toDF("w", "l")
    val out = Eval.bradleyTerry(comps, "w", "l", iters = 8).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out("A") > out("B") && out("B") > out("C"))
    // every item appears with its full matchup count
    val tot = Eval.bradleyTerry(comps, "w", "l", iters = 1).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(tot === Map("A" -> 6L, "B" -> 8L, "C" -> 6L))
  }

  test("rbpAtK: dyadic weights are exact — rel at every rank vs " +
      "rank 1 only") {
    val ranked = Seq((1L, 1, true), (1L, 2, true), (1L, 3, true),
      (2L, 1, true), (2L, 2, false), (3L, 1, false), (3L, 2, true))
      .toDF("query_id", "rank", "rel")
    val out = Eval.rbpAtK(ranked, k = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // q1: 1/2+1/4+1/8 = 0.875 exactly; q2: 0.5; q3: 0.25
    assert(out(1L) === 875000L)
    assert(out(2L) === 500000L)
    assert(out(3L) === 250000L)
  }

  test("cronbachAlpha: duplicated item scores give alpha exactly 1") {
    val df = Seq((1L, "A", 3L), (1L, "B", 3L), (2L, "A", 5L),
      (2L, "B", 5L), (3L, "A", 9L), (3L, "B", 9L))
      .toDF("u", "i", "s")
    val r = Eval.cronbachAlpha(df, "u", "i", "s").collect().head
    assert(r.getLong(0) === 2L && r.getLong(1) === 3L)
    assert(r.getLong(4) === 1000000L)
  }

  test("cronbachAlpha: constant subject totals -> degenerate, NULL") {
    // B = 10 - A: every subject totals 10, zero total variance
    val df = Seq((1L, "A", 3L), (1L, "B", 7L), (2L, "A", 5L),
      (2L, "B", 5L), (3L, "A", 9L), (3L, "B", 1L)).toDF("u", "i", "s")
    val r = Eval.cronbachAlpha(df, "u", "i", "s").collect().head
    assert(r.getLong(3) === 0L && r.isNullAt(4))
  }

  test("cronbachAlpha: absent cells and explicit zeros agree") {
    val sparse = Seq((1L, "A", 2L), (1L, "B", 4L), (2L, "A", 5L))
      .toDF("u", "i", "s")
    val dense = Seq((1L, "A", 2L), (1L, "B", 4L), (2L, "A", 5L),
      (2L, "B", 0L)).toDF("u", "i", "s")
    val a = Eval.cronbachAlpha(sparse, "u", "i", "s").collect().head
    val b = Eval.cronbachAlpha(dense, "u", "i", "s").collect().head
    assert(a.getLong(2) === b.getLong(2))
    assert(a.getLong(3) === b.getLong(3))
    assert(a.getLong(4) === b.getLong(4))
  }

  test("rocPoints: hand-checked curve, perfect separator hits (0,1)") {
    // scores 4,3 positive; 2,1 negative -> at thr 3: tp=2 fp=0
    val df = Seq((4L, 1L), (3L, 1L), (2L, 0L), (1L, 0L))
      .toDF("score", "y")
    val out = Eval.rocPoints(df, "y", "score")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(out(4L) === ((1L, 0L, 500000L, 0L)))
    assert(out(3L) === ((2L, 0L, 1000000L, 0L)))
    assert(out(2L) === ((2L, 1L, 1000000L, 500000L)))
    assert(out(1L) === ((2L, 2L, 1000000L, 1000000L)))
    // single-class input: the absent class's rate is NULL, not a crash
    val onec = Seq((5L, 1L), (4L, 1L)).toDF("score", "y")
    val r = Eval.rocPoints(onec, "y", "score").collect()
    assert(r.forall(row => row.isNullAt(5)) && r.forall(!_.isNullAt(4)))
  }

  test("gwetAc1: hand-checked; stays high where kappa paradoxes to 0; " +
      "single category degenerates to NULL") {
    // N=4, A=3, m_a=5, m_b=3 -> B=30, AC1 = 18/34
    val d = Seq(("a", "a"), ("a", "a"), ("b", "b"), ("a", "b"))
      .toDF("r1", "r2")
    val out = Eval.gwetAc1(d, "r1", "r2").collect().head
    assert((out.getLong(0), out.getLong(1), out.getLong(2)) ===
      ((4L, 3L, 2L)))
    assert(out.getDecimal(3).longValue === 30L)
    assert(out.getLong(4) === math.floor(1.0e6 * 18.0 / 34.0).toLong)
    // the kappa paradox fixture: 9 agreements on 'a', 1 disagreement —
    // Cohen's kappa is 0 (rater 1 is constant); AC1 stays near 0.9
    val skew = (Seq.fill(9)(("a", "a")) :+ (("a", "b"))).toDF("r1", "r2")
    val rs = Eval.gwetAc1(skew, "r1", "r2").collect().head
    assert(rs.getLong(4) === math.floor(1.0e6 * 322.0 / 362.0).toLong)
    assert(rs.getLong(4) > 880000L)
    // everyone agrees on one category: Q=1 -> chance term undefined
    val one = Seq(("a", "a"), ("a", "a")).toDF("r1", "r2")
    assert(Eval.gwetAc1(one, "r1", "r2").collect().head.isNullAt(4))
  }

  test("fairnessAudit: per-group rates and disparate-impact ratio " +
      "hand-checked; a group without negatives reports NULL fpr") {
    import org.apache.spark.sql.functions.col
    val d = Seq(
      ("A", true, true), ("A", true, false), ("A", false, true),
      ("A", false, false),
      ("B", true, true), ("B", true, true)).toDF("g", "p", "y")
    val out = Eval.fairnessAudit(d, "g", col("p"), col("y"))
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("A"); val b = out("B")
    assert((a.getLong(1), a.getLong(2), a.getLong(3)) === ((4L, 2L, 2L)))
    assert((a.getLong(4), a.getLong(5), a.getLong(6)) ===
      ((500000L, 500000L, 500000L)))
    // dp_A = (2*6)/(4*4), dp_B = (2*6)/(2*4)
    assert(a.getLong(7) === 750000L && b.getLong(7) === 1500000L)
    assert(b.getLong(5) === 1000000L)
    assert(b.isNullAt(6)) // no negatives in B: FPR is unauditable
  }
}
