package graft

import org.apache.spark.sql.functions.col

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

  test("chiSquare: independent table has zero contribution, dependent doesn't") {
    val ind = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("a", "y"),
      ("b", "x"), ("b", "x"), ("b", "y"), ("b", "y"))
    val outI = Stats.chiSquare(ind.toDF("r", "c"), "r", "c")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // every cell: o=2, e = 4*4/8 = 2 exactly, contribution 0
    outI.values.foreach { case (o, eq, cq) =>
      assert(o === 2L); assert(eq === 2000000L); assert(cq === 0L)
    }
    val dep = Seq.fill(4)(("a", "x")) ++ Seq.fill(4)(("b", "y"))
    val outD = Stats.chiSquare(dep.toDF("r", "c"), "r", "c")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // (a,x): o=4, e=2, (o-e)^2/e = 2 → 2e6 on the grid
    assert(outD(("a", "x")) === ((4L, 2000000L, 2000000L)))
  }

  test("spearman: monotone nonlinear is +1, ties use midranks") {
    val rows = Seq(("g", 1L, 1L), ("g", 2L, 10L), ("g", 3L, 100L),
      ("t", 1L, 5L), ("t", 1L, 5L), ("t", 2L, 9L))
    val out = Stats.spearman(rows.toDF("g", "x", "y"), "g", "x", "y")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out("g") === 1000000L) // rank-perfect despite nonlinearity
    assert(out("t") === 1000000L) // tie midranks agree on both axes
  }

  test("gini: equal masses 0, one-holder concentration 3/4 for n=4") {
    val rows = Seq(("eq", 1L, 5L), ("eq", 2L, 5L), ("eq", 3L, 5L),
      ("eq", 4L, 5L),
      ("one", 1L, 0L), ("one", 2L, 0L), ("one", 3L, 0L), ("one", 4L, 10L))
    val out = Stats.gini(rows.toDF("g", "id", "w"), "g", "id", "w")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out("eq") === 0L)
    assert(out("one") === 750000L) // (1 - 1/n) = 3/4
  }

  test("tvdVsCorpus: identical mixes 0, disjoint point mass 1/2") {
    val same = Seq(("g1", "a"), ("g1", "b"), ("g2", "a"), ("g2", "b"))
    Stats.tvdVsCorpus(same.toDF("g", "t"), "g", "t")
      .collect().foreach(r => assert(r.getLong(2) === 0L))
    val dis = Seq(("g1", "a"), ("g1", "a"), ("g2", "b"), ("g2", "b"))
    val out = Stats.tvdVsCorpus(dis.toDF("g", "t"), "g", "t")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // point mass on a vs uniform{a,b}: TVD = 1/2
    assert(out("g1") === 500000L)
    assert(out("g2") === 500000L)
  }

  test("mannWhitney: separated samples hit 0/2·n1·n2, ties midrank") {
    val rows = Seq(("A", 1L), ("A", 2L), ("B", 3L), ("B", 4L))
    val out = Stats.mannWhitney(rows.toDF("g", "v"), "g", "v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("A") === ((2L, 0L, 4L))) // all below rest: U=0, E[2U]=4
    assert(out("B") === ((2L, 8L, 4L))) // all above rest: 2U = 2·n1·n2
    val ties = Seq(("A", 1L), ("A", 1L), ("B", 1L), ("B", 3L))
    val outT = Stats.mannWhitney(ties.toDF("g", "v"), "g", "v")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(outT("A") === 2L) // midranks (2,2,2,4): R_A=4 → 2U=2
  }

  test("mutualInfo: dependent cells carry ln2 nats, independent cells 0") {
    val dep = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y"))
    val outD = Stats.mutualInfo(dep.toDF("r", "c"), "r", "c")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(3))
      .toMap
    // o=2, N=4, r=c=2: 1e6·2·ln(8/4)/4 = 5e5·ln2 = 346573.59…
    assert(outD(("a", "x")) === 346573L)
    assert(outD(("b", "y")) === 346573L)
    val ind = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"))
    Stats.mutualInfo(ind.toDF("r", "c"), "r", "c")
      .collect().foreach(r => assert(r.getLong(3) === 0L))
  }

  test("benford: digit extract and compiled expected shares") {
    val rows = Seq(BigDecimal("19.00"), BigDecimal("25.10"),
      BigDecimal("102.00"), BigDecimal("1.50"), BigDecimal("0.07"))
      .map(Tuple1(_))
    val out = Stats.benford(rows.toDF("x"), "x")
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1) === ((3L, 600000L, 301029L))) // log10(2) = .30103
    assert(out(2)._1 === 1L)
    assert(out(7)._1 === 1L) // 0.07 → first significant digit 7
    assert(out(7)._3 === 57991L) // log10(8/7)
  }

  test("jsDivergence: identical distributions give exactly 0") {
    val rows = Seq(("a", "x"), ("a", "x"), ("a", "y"),
      ("b", "x"), ("b", "x"), ("b", "y"))
    val out = Stats.jsDivergence(rows.toDF("g", "tok"), "g", "tok")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // p = q for every term → every ln is ln(1) = 0 → exact zero
    assert(out("a") === ((2L, 0L, 0L)))
    assert(out("b") === ((2L, 0L, 0L)))
  }

  test("jsDivergence: disjoint vocabularies give the ln2 maximum") {
    val rows = Seq(("a", "x"), ("b", "y"))
    val out = Stats.jsDivergence(rows.toDF("g", "tok"), "g", "tok")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    // present x for a: p=1, q=0 → ½ln2; absent y: q=1 → ½ln2;
    // each term floors on the 1e12 grid: 2·⌊10¹²·½ln2⌋
    val half = math.floor(1.0e12 * (0.5 * 1.0 * math.log(1.0 / 0.5))).toLong
    assert(out("a") === ((1L, 1L, 1L, 1L, 2 * half)))
    assert(out("b") === ((1L, 1L, 1L, 1L, 2 * half)))
  }

  test("acf: alternating series — exact -1 at lag 1, ~+1 at lag 2") {
    // daily buckets 0..4 with x = 1,0,1,0,1
    val rows = (0 to 4).map(i => ("t", i.toLong * 86400L,
      if (i % 2 == 0) 1L else 0L))
    val out = Stats.acf(rows.toDF("g", "b", "x"), "g", "b", "x",
        stepSec = 86400L, maxLag = 2)
      .collect().map(r => r.getInt(1) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    // lag1: 4 pairs, r = -1 exactly (all sums integers, sqrt(4) exact)
    assert(out(1) === ((4L, -1000000L)))
    // lag2: 3 pairs, r = 2/(√2·√2) = 0.999…8 → floors to 999999
    assert(out(2) === ((3L, 999999L)))
  }

  test("pcaPower: axis-aligned variance picks the axis; L1 grid exact") {
    // all variance on dim 1
    val axis = Seq((1L, Seq(1f, 0f)), (2L, Seq(2f, 0f)), (3L, Seq(3f, 0f)))
      .toDF("vec_id", "embedding")
    val v1 = Stats.pcaPower(axis, "embedding", dims = 2, iters = 3)
      .orderBy("dim").collect()
    assert(v1.map(_.getLong(1)).toSeq === Seq(1000000000000L, 0L))
    assert(v1(0).getLong(2) > 0) // eigenvalue = the dim-1 variance
    // perfectly correlated dims split the L1 mass evenly
    val corr = Seq((1L, Seq(1f, 1f)), (2L, Seq(2f, 2f)), (3L, Seq(3f, 3f)))
      .toDF("vec_id", "embedding")
    val v2 = Stats.pcaPower(corr, "embedding", dims = 2, iters = 3)
      .orderBy("dim").collect().map(_.getLong(1)).toSeq
    assert(v2 === Seq(500000000000L, 500000000000L))
  }

  test("pcaPower: anti-correlated dims — canonical sign anchors positive") {
    val anti = Seq((1L, Seq(1f, -1f)), (2L, Seq(2f, -2f)), (3L, Seq(3f, -3f)))
      .toDF("vec_id", "embedding")
    val out = Stats.pcaPower(anti, "embedding", dims = 2, iters = 3)
      .orderBy("dim").collect().map(_.getLong(1)).toSeq
    // top PC ∝ (1, −1), anchored positive on dim 1; quantization of
    // the negative-product covariance cell leaves a tiny residual
    // second component, so assert convergence, not the ideal point
    assert(out(0) > 0 && out(1) < 0)
    assert(math.abs(out(0) - 500000000000L) < 10000000L)
    assert(math.abs(out(1) + 500000000000L) < 10000000L)
  }

  test("jsDivergence: partition-order free (1 vs 17 partitions)") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 400).map(_ =>
      (s"s${rnd.nextInt(4)}", s"t${rnd.nextInt(40)}"))
    val a = Stats.jsDivergence(rows.toDF("g", "tok").coalesce(1), "g", "tok")
      .orderBy("g").collect().toSeq
    val b = Stats.jsDivergence(rows.toDF("g", "tok").repartition(17),
      "g", "tok").orderBy("g").collect().toSeq
    assert(a === b)
  }

  test("acf: gaps densify to zero before pairing") {
    // buckets 0 and 2·86400 present; bucket 1 missing → counts as 0
    val rows = Seq(("t", 0L, 2L), ("t", 2L * 86400L, 2L))
    val out = Stats.acf(rows.toDF("g", "b", "x"), "g", "b", "x",
        stepSec = 86400L, maxLag = 1)
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    // dense series 2,0,2 → lag-1 pairs (2,0),(0,2): n_pairs = 2
    assert(out(1) === 2L)
  }


  test("kendallTau: monotone series hits ±1 exactly") {
    import graft.operators.Stats
    val up = Seq(("g", 1L, 1L, 10L), ("g", 2L, 2L, 20L), ("g", 3L, 3L, 30L))
      .toDF("g", "k", "x", "y")
    val r1 = Stats.kendallTau(up, "g", "k", "x", "y").collect()(0)
    assert(r1.getLong(1) === 3L && r1.getLong(2) === 3L &&
      r1.getLong(3) === 0L && r1.getLong(4) === 1000000L)
    val down = Seq(("g", 1L, 1L, 30L), ("g", 2L, 2L, 20L), ("g", 3L, 3L, 10L))
      .toDF("g", "k", "x", "y")
    assert(Stats.kendallTau(down, "g", "k", "x", "y")
      .collect()(0).getLong(4) === -1000000L)
  }

  test("kendallTau: tau-b tie correction (hand-computed)") {
    import graft.operators.Stats
    // x=(1,1,2), y=(1,2,3): C=2, D=0, n0=3, n1=1(x-tie), n2=0
    // tau = 2/sqrt(2*3) = 0.81649658... -> 816496
    val df = Seq(("g", 1L, 1L, 1L), ("g", 2L, 1L, 2L), ("g", 3L, 2L, 3L))
      .toDF("g", "k", "x", "y")
    val r = Stats.kendallTau(df, "g", "k", "x", "y").collect()(0)
    assert(r.getLong(1) === 3L && r.getLong(2) === 2L && r.getLong(3) === 0L)
    assert(r.getLong(4) === 816496L)
  }

  test("kendallTau: all-tied x yields null tau (degenerate denominator)") {
    import graft.operators.Stats
    val df = Seq(("g", 1L, 5L, 1L), ("g", 2L, 5L, 2L)).toDF("g", "k", "x", "y")
    assert(Stats.kendallTau(df, "g", "k", "x", "y").collect()(0).isNullAt(4))
  }

  test("welchT: two-group hand values match the mirrored double sequence") {
    import graft.operators.Stats
    val df = (Seq(1L, 2L, 3L).map(("a", _)) ++
      Seq(10L, 20L, 30L, 40L).map(("b", _))).toDF("g", "x")
    val out = Stats.welchT(df, "g", "x").collect()
      .map(r => r.getString(0) -> r).toMap
    // replicate the operator's exact fp sequence for group a vs rest
    def expect(n1: Double, s1: Double, q1: Double,
               n2: Double, s2: Double, q2: Double): (Long, Long) = {
      val v1 = (q1 - s1 * s1 / n1) / (n1 - 1.0)
      val v2 = (q2 - s2 * s2 / n2) / (n2 - 1.0)
      val se1 = v1 / n1; val se2 = v2 / n2
      val t = (s1 / n1 - s2 / n2) / math.sqrt(se1 + se2)
      val dfW = (se1 + se2) * (se1 + se2) /
        (se1 * se1 / (n1 - 1.0) + se2 * se2 / (n2 - 1.0))
      (math.floor(1.0e6 * t).toLong, math.floor(1.0e6 * dfW).toLong)
    }
    val (ta, dfa) = expect(3, 6, 14, 4, 100, 3000)
    val ra = out("a")
    assert(ra.getLong(1) === 3L && ra.getLong(2) === 4L)
    assert(ra.getLong(3) === ta && ra.getLong(4) === dfa)
    val (tb, dfb) = expect(4, 100, 3000, 3, 6, 14)
    assert(out("b").getLong(3) === tb && out("b").getLong(4) === dfb)
    assert(ta < 0 && tb > 0) // antisymmetric direction
  }

  test("welchT: a singleton group reports null t (no variance)") {
    import graft.operators.Stats
    val df = Seq(("a", 1L), ("b", 2L), ("b", 3L), ("b", 9L)).toDF("g", "x")
    val byG = Stats.welchT(df, "g", "x").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(byG("a").isNullAt(3)) // n1 = 1
    assert(byG("b").isNullAt(3)) // rest side n2 = 1
  }

  test("cramersV: perfect 2x2 diagonal scores exactly 10^6 (absent-cell " +
      "mass recovered), independent table scores 0") {
    import graft.operators.Stats
    val perfect = (Seq.fill(5)(("r1", "c1")) ++ Seq.fill(5)(("r2", "c2")))
      .toDF("r", "c")
    val p = Stats.cramersV(perfect, "r", "c").collect()(0)
    assert(p.getLong(0) === 10L && p.getLong(3) === 10000000L)
    assert(p.getLong(4) === 1000000L)
    val indep = (for {
      r <- Seq("r1", "r2"); c <- Seq("c1", "c2"); _ <- 1 to 5
    } yield (r, c)).toDF("r", "c")
    val i = Stats.cramersV(indep, "r", "c").collect()(0)
    assert(i.getLong(3) === 0L && i.getLong(4) === 0L)
  }

  // ---- friedman ----------------------------------------------------------

  test("friedman: textbook no-tie case, Q = 4 exactly") {
    // two blocks, identical 1<2<3 ordering: R2 = (4,8,12), ssq = 224,
    // Q = 3*224/(2*3*4) - 3*2*4 = 28 - 24 = 4
    val df = Seq(
      ("b1", "t1", 1L), ("b1", "t2", 2L), ("b1", "t3", 3L),
      ("b2", "t1", 1L), ("b2", "t2", 2L), ("b2", "t3", 3L))
      .toDF("blk", "trt", "v")
    val r = Stats.friedman(df, "blk", "trt", "v").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((2L, 3L, 224L, 4000000L)))
  }

  test("friedman: all-tied blocks give Q = 0 via midranks") {
    // every treatment equal in every block: midrank (k+1)/2 = 2 each,
    // R2 = 2*rank + ties - 1 = 2*1 + 3 - 1 = 4 per cell, R2_j = 8 each;
    // ssq = 3*64 = 192, Q = 3*192/(2*3*4) - 24 = 24 - 24 = 0
    val df = Seq(
      ("b1", "t1", 7L), ("b1", "t2", 7L), ("b1", "t3", 7L),
      ("b2", "t1", 9L), ("b2", "t2", 9L), ("b2", "t3", 9L))
      .toDF("blk", "trt", "v")
    val r = Stats.friedman(df, "blk", "trt", "v").collect()(0)
    assert(r.getLong(2) === 192L && r.getLong(3) === 0L)
  }

  test("friedman: absent cells densify to REAL zeros before ranking") {
    // t3 missing from b2: its cell must rank as 0 (lowest), not drop
    val df = Seq(
      ("b1", "t1", 1L), ("b1", "t2", 2L), ("b1", "t3", 3L),
      ("b2", "t1", 1L), ("b2", "t2", 2L))
      .toDF("blk", "trt", "v")
    val r = Stats.friedman(df, "blk", "trt", "v").collect()(0)
    // b1 ranks t1<t2<t3 -> R2 (2,4,6); b2 cells (1,2,0) -> t3 lowest:
    // ranks t3=1, t1=2, t2=3 -> R2 (4,6,2); sums (6,10,8), ssq = 200
    assert(r.getLong(0) === 2L && r.getLong(2) === 200L)
  }

  test("friedman: duplicate (block, treatment) rows sum before ranking") {
    val df = Seq(
      ("b1", "t1", 1L), ("b1", "t1", 4L), ("b1", "t2", 2L))
      .toDF("blk", "trt", "v")
    val r = Stats.friedman(df, "blk", "trt", "v").collect()(0)
    // cell t1 = 5 > t2 = 2: ranks t2=1, t1=2 -> doubled midranks
    // t2: 2*1+1-1 = 2; t1: 2*2+1-1 = 4 -> ssq = 4 + 16 = 20
    assert(r.getLong(1) === 2L && r.getLong(2) === 20L)
  }

  // ---- kruskalWallis -------------------------------------------------------

  test("kruskalWallis: textbook no-tie case") {
    // groups {1,2} vs {3,4}: global ranks 1..4, R_a = 3, R_b = 7;
    // H = 12/(4*5) * (9/2 + 49/2) - 3*5 = 0.6*29 - 15 = 2.4
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L))
      .toDF("g", "x")
    val r = Stats.kruskalWallis(df, "g", "x").collect()(0)
    assert(r.getLong(0) === 2L && r.getLong(1) === 4L)
    // t_a = floor(1e9 * 9/(2*4*5)) = floor(1e9*0.225) = 225000000
    // t_b = floor(1e9 * 49/(2*4*5)) = 1225000000; h_q9 = 12*sum - 15e9
    assert(r.getLong(2) === 1450000000L)
    assert(r.getLong(3) === 2400000000L) // 2.4 on the 1e-9 grid
  }

  test("kruskalWallis: identical groups give H ~ 0 via midranks") {
    val df = Seq(("a", 5L), ("a", 7L), ("b", 5L), ("b", 7L))
      .toDF("g", "x")
    val r = Stats.kruskalWallis(df, "g", "x").collect()(0)
    // both groups: midranks {1.5, 3.5}, R = 5 each; H = 0 exactly:
    // t_j = floor(1e9 * 25/(2*4*5)) = 625000000; 12*1.25e9 - 15e9 = 0
    assert(r.getLong(3) === 0L)
  }

  test("kruskalWallis: agrees with mannWhitney's rank sums for k=2") {
    val df = Seq(("a", 1L), ("a", 5L), ("a", 5L), ("b", 5L), ("b", 9L),
      ("b", 2L), ("b", 9L)).toDF("g", "x")
    val kw = Stats.kruskalWallis(df, "g", "x").collect()(0)
    val u = Stats.mannWhitney(df, "g", "x").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    // U_a + U_b = 2*n_a*n_b (doubled U surface)
    assert(u("a") + u("b") === 2L * 3L * 4L)
    assert(kw.getLong(0) === 2L && kw.getLong(1) === 7L)
  }

  // ---- ksTwoSample ---------------------------------------------------------

  test("ksTwoSample: disjoint supports reach D = 1") {
    val df = Seq((1L, true), (2L, true), (10L, false), (11L, false))
      .toDF("x", "y")
    val r = Stats.ksTwoSample(df, "x", col("y")).collect()(0)
    assert((r.getLong(0), r.getLong(1)) === ((2L, 2L)))
    assert(r.getLong(2) === 4L)        // max|CA*nb - CB*na| = 2*2
    assert(r.getLong(3) === 1000000L)  // D = 1
  }

  test("ksTwoSample: identical samples give D = 0") {
    val df = Seq((1L, true), (2L, true), (1L, false), (2L, false))
      .toDF("x", "y")
    val r = Stats.ksTwoSample(df, "x", col("y")).collect()(0)
    assert(r.getLong(2) === 0L && r.getLong(3) === 0L)
  }

  test("ksTwoSample: hand-computed mid-distribution gap") {
    // A = {1,2,3}, B = {2,3,4}: D = 1/3 at v=1 (CA=1,CB=0)
    val df = Seq((1L, true), (2L, true), (3L, true),
      (2L, false), (3L, false), (4L, false)).toDF("x", "y")
    val r = Stats.ksTwoSample(df, "x", col("y")).collect()(0)
    assert(r.getLong(2) === 3L)        // |1*3 - 0*3| = 3
    assert(r.getLong(3) === 333333L)
  }

  // ---- cochranQ ------------------------------------------------------------

  test("cochranQ: uniform presence gives Q = 0") {
    // every block has every treatment: C_j = n, kC_j - N = 0
    val df = (for (b <- 1 to 4; t <- Seq("x", "y", "z")) yield (b.toLong, t))
      .toDF("blk", "trt")
    val r = Stats.cochranQ(df, "blk", "trt").collect()(0)
    // den = k(k*sr - sr2) = 3*(3*12 - 4*9) = 0 -> q_q null (degenerate)
    assert(r.getLong(2) === 0L)
    assert(r.isNullAt(4))
  }

  test("cochranQ: hand-computed 3x3 design") {
    // blocks: b1 {x,y}, b2 {x}, b3 {x,y,z}; C = (3,2,1), N = 6
    // R = (2,1,3); sr=6, sr2=14; den = 3*(18-14) = 12
    // kC-N: (3,0,-3) -> ssd = 18; num = 2*18 = 36; Q = 3.0
    val df = Seq((1L, "x"), (1L, "y"), (2L, "x"),
      (3L, "x"), (3L, "y"), (3L, "z")).toDF("blk", "trt")
    val r = Stats.cochranQ(df, "blk", "trt").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((3L, 3L, 36L, 12L)))
    assert(r.getLong(4) === 3000000L)
  }

  // ---- ccf -------------------------------------------------------------------

  test("ccf: a shifted copy peaks at exactly its lag") {
    // y is x delayed by 2 buckets -> ccf(+2) = 1.0 on the overlap
    val xs = Seq(5L, 1L, 9L, 2L, 7L, 3L, 8L, 4L, 6L, 2L)
    val rows = xs.indices.map { i =>
      ("g", i.toLong, xs(i), if (i >= 2) xs(i - 2) else 0L)
    }
    // careful: y_t = x_{t-2} means corr(x_t, y_{t+2}) = 1 -> lag +2
    val out = Stats.ccf(rows.toDF("g", "b", "x", "y"), "g", "b",
      "x", "y", stepSec = 1L, maxLag = 3)
      .collect().map(r => r.getInt(1) -> r.getLong(3)).toMap
    assert(out(2) >= 999999L, s"lag +2 should be ~1 (sqrt rounding): $out")
    assert(out.keySet === (-3 to 3).toSet)
    assert(out(0) < 1000000L)
  }

  test("ccf: symmetric series give ccf(h) = ccf(-h) when x == y") {
    val rows = (0L to 9L).map(b => ("g", b, b % 4 + 1, b % 4 + 1))
    val out = Stats.ccf(rows.toDF("g", "b", "x", "y"), "g", "b",
      "x", "y", 1L, 3).collect()
      .map(r => r.getInt(1) -> r.getLong(3)).toMap
    for (h <- 1 to 3) assert(out(h) === out(-h))
    assert(out(0) >= 999999L)
  }

  // ---- jonckheereTerpstra ------------------------------------------------------

  test("jonckheereTerpstra: textbook ordered shift") {
    // g1 = {1,2}, g2 = {3,4}, g3 = {5,6}: every cross pair ascends
    // J = 4 + 4 + 4 = 12 -> j2 = 24; E2 = (36 - 12)/2 = 12
    val df = Seq(("g1", 1L), ("g1", 2L), ("g2", 3L), ("g2", 4L),
      ("g3", 5L), ("g3", 6L)).toDF("g", "x")
    val r = Stats.jonckheereTerpstra(df, "g", "x").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((3L, 6L, 24L, 12L)))
    assert(r.getLong(4) > 2000000L, "a perfect ascent is z >> 2")
  }

  test("jonckheereTerpstra: reversed order flips the sign; ties halve") {
    val rev = Seq(("g1", 5L), ("g1", 6L), ("g2", 3L), ("g2", 4L),
      ("g3", 1L), ("g3", 2L)).toDF("g", "x")
    assert(Stats.jonckheereTerpstra(rev, "g", "x").collect()(0)
      .getLong(4) < -2000000L)
    // all values tied: every cross pair contributes 1 (the ½ tie)
    val tied = Seq(("g1", 7L), ("g1", 7L), ("g2", 7L), ("g2", 7L))
      .toDF("g", "x")
    val rt = Stats.jonckheereTerpstra(tied, "g", "x").collect()(0)
    assert(rt.getLong(2) === 4L, "2x2 cross pairs, doubled-tie = 1 each")
    assert(rt.getLong(3) === 4L && rt.getLong(4) === 0L,
      "all-tied data sits exactly at the null expectation")
  }

  // ---- diffInDiff ------------------------------------------------------------

  test("diffInDiff: hand-computed cells and estimate") {
    // treatment: pre mean 1, post mean 4 (+3); control: 1 -> 2 (+1)
    // DiD = 3 - 1 = 2
    val rows = Seq(
      (true, false, 1L), (true, false, 1L), (true, true, 4L),
      (false, false, 1L), (false, true, 2L), (false, true, 2L))
    val df = rows.toDF("v", "p", "m")
    val r = Stats.diffInDiff(df, col("v"), col("p"), "m").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((2L, 1L, 1L, 2L)))
    assert(r.getLong(4) === 1000000L && r.getLong(5) === 4000000L)
    assert(r.getLong(8) === 2000000L)
  }

  test("diffInDiff: an empty cell yields an honest null estimate") {
    val df = Seq((true, true, 1L), (false, false, 2L), (false, true, 3L))
      .toDF("v", "p", "m")
    val r = Stats.diffInDiff(df, col("v"), col("p"), "m").collect()(0)
    assert(r.getLong(0) === 0L && r.isNullAt(8))
  }

  test("diffInDiff: parallel trends with no effect gives DiD = 0") {
    val rows = Seq((true, false, 5L), (true, true, 8L),
      (false, false, 2L), (false, true, 5L))
    val r = Stats.diffInDiff(rows.toDF("v", "p", "m"),
      col("v"), col("p"), "m").collect()(0)
    assert(r.getLong(8) === 0L)
  }

  // ---- cochranArmitage ---------------------------------------------------------

  test("cochranArmitage: perfect positive trend gives a large positive z") {
    // dose 0: 0/10 success; dose 1: 5/10; dose 2: 10/10
    val rows = (1 to 10).map(_ => (0L, false)) ++
      (1 to 5).map(_ => (1L, true)) ++ (1 to 5).map(_ => (1L, false)) ++
      (1 to 10).map(_ => (2L, true))
    val r = Stats.cochranArmitage(rows.toDF("dose", "y"), "dose",
      col("y")).collect()(0)
    // T = Σs·r·N − Σs·n·R = (5 + 20)*30 − (10+20)*15 = 750 − 450 = 300
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((3L, 30L, 15L, 300L)))
    assert(r.getLong(4) > 5000000L, s"z ${r.getLong(4)} should be >> 0")
  }

  test("cochranArmitage: flat rates give z ~ 0; reversed trend negative") {
    val flat = (0L to 2L).flatMap(s =>
      Seq((s, true), (s, false), (s, true), (s, false)))
    val rf = Stats.cochranArmitage(flat.toDF("dose", "y"), "dose",
      col("y")).collect()(0)
    assert(rf.getLong(3) === 0L && math.abs(rf.getLong(4)) <= 1L)
    val rev = (1 to 10).map(_ => (0L, true)) ++
      (1 to 10).map(_ => (2L, false))
    val rr = Stats.cochranArmitage(rev.toDF("dose", "y"), "dose",
      col("y")).collect()(0)
    assert(rr.getLong(4) < 0L)
  }

  // ---- sprtCurve -------------------------------------------------------------

  test("sprtCurve: integer LLR walk matches the hand-computed constants") {
    val c1 = math.floor(1e6 * math.log(0.22 / 0.18)).toLong
    val c2 = math.floor(1e6 * math.log(0.78 / 0.82)).toLong
    // day 0: 2 trials 1 success; day 1: 3 trials 0 successes
    val df = Seq((0L, true), (43200000000L, false),
      (86400000000L, false), (90000000000L, false), (100000000000L, false))
      .toDF("ts", "y")
    val out = Stats.sprtCurve(df, "ts", col("y"), 180000L, 220000L)
      .orderBy("day").collect()
    assert(out.length === 2)
    assert(out(0).getLong(5) === 1L * c1 + 1L * c2)
    assert(out(1).getLong(5) === 1L * c1 + 4L * c2)
    assert(out(1).getLong(3) === 5L && out(1).getLong(4) === 1L)
  }

  test("sprtCurve: a hot streak drives LLR up, a cold streak down") {
    val hot = (0 until 50).map(i => (i.toLong * 1000000L, true))
    val cold = (0 until 50).map(i => (i.toLong * 1000000L, false))
    val up = Stats.sprtCurve(hot.toDF("ts", "y"), "ts", col("y"),
      180000L, 220000L).collect()(0).getLong(5)
    val dn = Stats.sprtCurve(cold.toDF("ts", "y"), "ts", col("y"),
      180000L, 220000L).collect()(0).getLong(5)
    assert(up > 0L && dn < 0L)
  }

  // ---- cuped -----------------------------------------------------------------

  test("cuped: perfectly correlated covariate removes ~all variance") {
    // y = x exactly -> rho^2 = 1 -> var_ratio ~ 0; theta = 1
    val rows = (1L to 40L).map(i => (i, i % 13, i % 13))
    val df = rows.toDF("u", "y", "x")
    val out = Stats.cuped(df, col("u") % 2 === 0, "y", "x")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(4), r.getLong(5)))).toMap
    assert(out("treatment")._1 === 1000000L) // theta = 1 exactly
    assert(out("treatment")._2 <= 1L, "variance ratio must collapse to ~0")
  }

  test("cuped: independent covariate leaves the means unadjusted-ish") {
    // x constant -> var(x) = 0 -> honest nulls for adjusted columns
    val df = (1L to 20L).map(i => (i, i % 7, 5L)).toDF("u", "y", "x")
    val r = Stats.cuped(df, col("u") % 2 === 0, "y", "x").collect()(0)
    assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5))
  }

  test("cuped: adjusted treatment-control gap tightens toward the true effect") {
    // y = x + effect(variant), x independent of the arm (CUPED's
    // pre-period contract): the accidental x imbalance between arms
    // pollutes the raw gap; the adjustment removes exactly that term
    val rows = (1L to 100L).map { i =>
      val treat = i % 2 == 0
      val x = (i * 7) % 11
      val y = x + (if (treat) 5L else 0L)
      (i, y, x)
    }
    val out = Stats.cuped(rows.toDF("u", "y", "x"), col("u") % 2 === 0,
      "y", "x").collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val rawGap = out("treatment")._1 - out("control")._1
    val adjGap = out("treatment")._2 - out("control")._2
    assert(math.abs(adjGap - 5000000L) < math.abs(rawGap - 5000000L),
      s"adjusted gap $adjGap should beat raw $rawGap at recovering 5e6")
    assert(math.abs(adjGap - 5000000L) < 300000L)
  }

  // ---- mantelHaenszel --------------------------------------------------------

  test("mantelHaenszel: hand-computed pooled odds ratio") {
    // s1: a=2 b=1 c=1 d=2 (n=6): t=⌊4e6/6⌋=666666, u=⌊1e6/6⌋=166666
    // s2: a=b=c=d=1 (n=4): t=u=250000
    // OR = ⌊1e6·916666/416666⌋ = 2200001
    val rows =
      Seq.fill(2)(("s1", true, true)) ++ Seq(("s1", true, false)) ++
      Seq(("s1", false, true)) ++ Seq.fill(2)(("s1", false, false)) ++
      Seq(("s2", true, true), ("s2", true, false),
        ("s2", false, true), ("s2", false, false))
    val df = rows.toDF("s", "e", "y")
    val r = Stats.mantelHaenszel(df, "s", col("e"), col("y")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ===
      ((2L, 916666L, 416666L)))
    assert(r.getLong(3) === 2200001L)
  }

  test("mantelHaenszel: no discordant pairs -> null OR") {
    val df = Seq(("s", true, true), ("s", false, false)).toDF("s", "e", "y")
    val r = Stats.mantelHaenszel(df, "s", col("e"), col("y")).collect()(0)
    assert(r.getLong(2) === 0L && r.isNullAt(3))
  }

  test("mantelHaenszel: deconfounds a Simpson reversal") {
    // within each stratum exposure HELPS (OR > 1), but the pooled
    // crude table reverses; MH must report the stratum-level truth
    val rows =
      (Seq.fill(9)(("low", true, true)) ++ Seq.fill(1)(("low", true, false)) ++
       Seq.fill(16)(("low", false, true)) ++ Seq.fill(4)(("low", false, false)) ++
       Seq.fill(4)(("high", true, true)) ++ Seq.fill(16)(("high", true, false)) ++
       Seq.fill(1)(("high", false, true)) ++ Seq.fill(9)(("high", false, false)))
    val df = rows.toDF("s", "e", "y")
    val r = Stats.mantelHaenszel(df, "s", col("e"), col("y")).collect()(0)
    assert(r.getLong(3) > 1000000L,
      s"MH OR ${r.getLong(3)} must exceed 1 despite the crude reversal")
  }

  // ---- psi -----------------------------------------------------------------

  test("psi: a group matching the corpus mix has near-zero drift") {
    // two groups with IDENTICAL distributions -> p == q -> psi = 0
    val df = (for (g <- Seq("a", "b"); v <- Seq(10L, 10L, 250L)) yield (g, v))
      .toDF("g", "v")
    val out = Stats.psi(df, "g", "v", binWidth = 100L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // +1 smoothing leaves a small-n bias, so near-zero, not zero —
    // and symmetric groups must land on exactly the same value
    assert(out("a") === out("b"))
    assert(out("a") < 10000000L, s"matching mix should read stable: $out")
  }

  test("psi: a concentrated group drifts more than a matching one") {
    val rows = (1L to 90L).map(i => ("ref", i * 10 % 1000)) ++
      (1L to 30L).map(i => ("same", i * 30 % 1000)) ++
      (1L to 30L).map(_ => ("conc", 50L)) // all in one bin
    val out = Stats.psi(rows.toDF("g", "v"), "g", "v", 100L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out("conc") > out("same"),
      s"concentrated ${out("conc")} should exceed matching ${out("same")}")
    assert(out("conc") > 200000000L, "one-bin group is 'drifted' (>0.2)")
  }

  test("psi: contributions are nonnegative so the sum is order-free") {
    val rows = (1L to 200L).map(i => (s"g${i % 5}", i % 997))
    val out = Stats.psi(rows.toDF("g", "v"), "g", "v", 100L).collect()
    assert(out.forall(_.getLong(3) >= 0L))
    assert(out.length === 5)
  }

  // ---- bartlett / gTest -----------------------------------------------------

  test("bartlett: equal variances score ~0; a spread gap is detected; " +
      "the statistic replays the documented fp chain") {
    // identical spread (shifted copies): every group variance equals
    // the pooled one, so pooled_term == sumlog and the statistic is 0
    val same = Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 11L), ("b", 12L), ("b", 13L)).toDF("g", "x")
    val r0 = Stats.bartlett(same, "g", "x").collect().head
    assert(r0.getLong(6) === 0L)
    // genuine gap: a tight, b wide
    val gap = Seq(("a", 10L), ("a", 11L), ("a", 10L), ("a", 11L),
      ("b", 1L), ("b", 20L), ("b", 40L), ("b", 2L)).toDF("g", "x")
    val r = Stats.bartlett(gap, "g", "x").collect().head
    val (k, n) = (r.getLong(0), r.getLong(1))
    assert((k, n) === ((2L, 8L)))
    // replay the chain by hand
    val ssdA = (2 * 100L + 2 * 121L) - math.floor(42.0 * 42.0 / 4.0).toLong
    val sB = 63L
    val qB = 1L + 400L + 1600L + 4L
    val ssdB = qB - math.floor(sB.toDouble * sB / 4.0).toLong
    def lnq(ssd: Long, nj: Long) =
      (nj - 1) * math.floor(1.0e9 * math.log(ssd.toDouble / (nj - 1))).toLong
    val sumlog = lnq(ssdA, 4) + lnq(ssdB, 4)
    val pooled = (n - k) * math.floor(1.0e9 *
      math.log((ssdA + ssdB).toDouble / (n - k))).toLong
    val inv = 1000000000000L / 3 * 2 // two groups of n_j = 4
    val cFac = 1.0 + (inv.toDouble / 1.0e12 - 1.0 / (n - k)) / (3.0 * (k - 1))
    val want = math.floor(1000000.0 * ((pooled - sumlog).toDouble / 1.0e9) / cFac).toLong
    assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ===
      ((ssdA + ssdB, sumlog, pooled, inv)))
    assert(r.getLong(6) === want)
    assert(r.getLong(6) > 1000000L) // the gap registers as chi2 > 1
    // zero-variance group is excluded (ln undefined), k reflects it
    val degen = Seq(("a", 5L), ("a", 5L), ("b", 1L), ("b", 9L)).toDF("g", "x")
    val rd = Stats.bartlett(degen, "g", "x").collect().head
    assert(rd.getLong(0) === 1L && rd.isNullAt(6)) // k=1 -> no statistic
  }

  test("gTest: independent table scores ~0; G = 2N·MI against the " +
      "mutualInfo kernel on a dependent table") {
    import org.apache.spark.sql.functions.{sum => fsum}
    // perfectly independent 2x2 (all margins equal)
    val ind = Seq(("r1", "c1"), ("r1", "c2"), ("r2", "c1"), ("r2", "c2"))
      .toDF("r", "c")
    val ri = Stats.gTest(ind, "r", "c").collect().head
    assert(ri.getLong(0) === 4L && ri.getLong(1) === 4L)
    assert(math.abs(ri.getLong(3)) <= 4L) // ±1 quantization per cell
    // dependent: diagonal-heavy
    val dep = (Seq.fill(8)(("r1", "c1")) ++ Seq.fill(8)(("r2", "c2")) ++
      Seq(("r1", "c2"), ("r2", "c1"))).toDF("r", "c")
    val rg = Stats.gTest(dep, "r", "c").collect().head
    // g_sum_q (10⁹·Σo·ln) vs Σ mi_contrib_q (10⁶·Σo·ln/N): same value
    // at a N·10³ scale gap, within per-cell quantization slack
    val mi = Stats.mutualInfo(dep, "r", "c")
      .agg(fsum(col("mi_contrib_q"))).collect().head.getLong(0)
    val n = rg.getLong(1)
    assert(math.abs(rg.getLong(2) - mi * n * 1000L) < 2000L * n * 4L,
      s"g_sum_q ${rg.getLong(2)} vs N*1000*mi ${mi * n * 1000L}")
    assert(rg.getLong(3) > 0L)
  }

  // ---- anovaF / brownForsythe ----------------------------------------------

  test("anovaF: textbook two-group case") {
    // a={1,2,3}, b={5,7,9}: t=(12,147), T=159, gt=floor(729/6)=121
    // ssb=38 (exact 37.5 + the gt floor), ssw=169-159=10
    // F = 38/(10/4) = 15.2
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 5L), ("b", 7L), ("b", 9L)).toDF("g", "x")
    val r = Stats.anovaF(df, "g", "x").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((2L, 6L, 38L, 10L)))
    assert(r.getLong(4) === 15200000L)
  }

  test("anovaF: zero within-group spread is the degenerate null") {
    val df = Seq(("a", 5L), ("a", 5L), ("b", 9L), ("b", 9L)).toDF("g", "x")
    val r = Stats.anovaF(df, "g", "x").collect()(0)
    assert(r.getLong(3) === 0L && r.isNullAt(4))
  }

  test("brownForsythe: location shift alone gives F = 0") {
    // same spread, different centers: |x - med| identical across groups
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 5L), ("b", 7L), ("b", 9L)).toDF("g", "x")
    val r = Stats.brownForsythe(df, "g", "x").collect()(0)
    // meds 2 and 7; z: a=(1,0,1) b=(2,0,2); t=(1,5), gt=6 -> ssb=0
    assert(r.getLong(2) === 0L && r.getLong(3) === 4L)
    assert(r.getLong(4) === 0L)
  }

  test("brownForsythe: genuine spread difference is detected") {
    val df = Seq(("tight", 10L), ("tight", 10L), ("tight", 11L),
      ("wide", 1L), ("wide", 10L), ("wide", 20L)).toDF("g", "x")
    val r = Stats.brownForsythe(df, "g", "x").collect()(0)
    assert(r.getLong(4) > 1000000L, s"expected F > 1, got ${r.getLong(4)}")
  }

  test("brownForsythe: even-count group uses the exact LOWER median") {
    // {1, 3}: 2*cum(1)=2 >= n=2 -> med = 1 (lower), z = (0, 2)
    val df = Seq(("a", 1L), ("a", 3L), ("b", 1L), ("b", 3L)).toDF("g", "x")
    val r = Stats.brownForsythe(df, "g", "x").collect()(0)
    // both groups identical -> ssb_l = 0
    assert(r.getLong(2) === 0L)
  }

  // ---- poissonBootstrap ----------------------------------------------------

  test("PoissonCdf1: lambda=1 inversion table is the textbook CDF") {
    val c = Stats.PoissonCdf1
    assert(c.length === 9)
    assert(math.abs(c(0) - 0.36787944117144233) < 1e-15)
    assert(math.abs(c(1) - 2 * 0.36787944117144233) < 1e-12)
    c.zip(c.tail).foreach { case (a, b) => assert(a < b) }
    assert(c.last > 0.999996 && c.last < 1.0)
  }

  test("poissonBootstrap: constant metric has a zero-width CI at the value") {
    val df = (1L to 200L).map(i => (i, 7L)).toDF("id", "v")
    val r = Stats.poissonBootstrap(df, "id", "v", reps = 40, "s").collect()(0)
    assert((r.getLong(0), r.getLong(1)) === ((200L, 40L)))
    assert(r.getLong(2) === 7000000L)
    assert(r.getLong(3) === 7000000L && r.getLong(4) === 7000000L)
  }

  test("poissonBootstrap: deterministic per salt, CI brackets the estimate") {
    val df = (1L to 300L).map(i => (i, i % 97)).toDF("id", "v")
    def run(salt: String) = Stats.poissonBootstrap(df, "id", "v", 40, salt)
      .collect()(0)
    val a = run("s1"); val b = run("s1"); val c = run("s2")
    assert(a.toSeq === b.toSeq, "same salt must replay identically")
    assert((a.getLong(3), a.getLong(4)) !== ((c.getLong(3), c.getLong(4))),
      "a fresh salt must redraw the replicates")
    assert(a.getLong(3) <= a.getLong(2) && a.getLong(2) <= a.getLong(4),
      s"CI [${a.getLong(3)}, ${a.getLong(4)}] should bracket ${a.getLong(2)}")
    assert(a.getLong(3) < a.getLong(4), "spread data -> nonzero CI width")
  }

  test("poissonBootstrapMedian: constant metric collapses the CI") {
    val df = (1L to 150L).map(i => (i, 42L)).toDF("id", "v")
    val r = Stats.poissonBootstrapMedian(df, "id", "v", 40, "s")
      .collect()(0)
    assert((r.getLong(0), r.getLong(1)) === ((150L, 40L)))
    assert(r.getLong(2) === 42L && r.getLong(3) === 42L &&
      r.getLong(4) === 42L)
  }

  test("poissonBootstrapMedian: exact lower median; CI brackets it") {
    // values 1..101: median 51
    val df = (1L to 101L).map(i => (i, i)).toDF("id", "v")
    val r = Stats.poissonBootstrapMedian(df, "id", "v", 40, "s")
      .collect()(0)
    assert(r.getLong(2) === 51L)
    assert(r.getLong(3) <= 51L && 51L <= r.getLong(4))
    assert(r.getLong(3) > 30L && r.getLong(4) < 72L,
      s"CI [${r.getLong(3)}, ${r.getLong(4)}] implausibly wide for n=101")
  }

  test("cochranQ: duplicate events collapse to presence") {
    val once = Seq((1L, "x"), (2L, "y")).toDF("blk", "trt")
    val dup = Seq((1L, "x"), (1L, "x"), (1L, "x"), (2L, "y"))
      .toDF("blk", "trt")
    assert(Stats.cochranQ(once, "blk", "trt").collect().toSeq.toString ===
      Stats.cochranQ(dup, "blk", "trt").collect().toSeq.toString)
  }

  // ------------------------------------------------------ effectSizes

  test("effectSizes: hand-computed d, g, and exact Cliff's delta") {
    // g1 = {2, 4}, g0 = {1, 3}: U = 3 of 4 pairs -> delta = 0.5;
    // m1=3 m2=2 ssw=4 pooled=2 -> d = 1/sqrt(2); J = 1 - 3/7
    val df = Seq((2L, true), (4L, true), (1L, false), (3L, false))
      .toDF("x", "y")
    val r = Stats.effectSizes(df, "x", col("y")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((2L, 2L, 6L)))
    assert(r.getLong(3) === 500000L)
    val cohen = (3.0 - 2.0) / math.sqrt(4.0 / (2.0 + 2.0 - 2.0))
    assert(r.getLong(4) === math.floor(1.0e6 * cohen).toLong)
    val j = 1.0 - 3.0 / (4.0 * 4.0 - 9.0)
    assert(r.getLong(5) === math.floor(1.0e6 * (cohen * j)).toLong)
  }

  test("effectSizes: identical groups give delta 0 and d 0") {
    val df = Seq((5L, true), (7L, true), (5L, false), (7L, false))
      .toDF("x", "y")
    val r = Stats.effectSizes(df, "x", col("y")).collect().head
    assert(r.getLong(3) === 0L) // u2 = n1·n2 exactly under symmetry
    assert(r.getLong(4) === 0L)
  }

  test("effectSizes: zero within-group variance yields NULL d") {
    val df = Seq((5L, true), (5L, true), (3L, false), (3L, false))
      .toDF("x", "y")
    val r = Stats.effectSizes(df, "x", col("y")).collect().head
    assert(r.isNullAt(4) && r.isNullAt(5))
    assert(r.getLong(3) === 1000000L) // complete separation
  }

  // ---------------------------------------------------------- olsFit2

  test("olsFit2: recovers an exact linear relation with R^2 = 1") {
    // y = 2 + 3*x1 + 5*x2 exactly -> Cramer division is exact
    val df = Seq((0L, 0L, 2L), (1L, 0L, 5L), (0L, 1L, 7L), (1L, 1L, 10L),
      (2L, 1L, 13L)).toDF("x1", "x2", "y")
    val r = Stats.olsFit2(df, "y", "x1", "x2").collect().head
    assert(r.getLong(0) === 5L)
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((2000000L, 3000000L, 5000000L)))
    assert(r.getLong(4) === 1000000L)
  }

  test("olsFit2: collinear regressors are singular -> NULL betas") {
    val df = Seq((1L, 1L, 3L), (2L, 2L, 5L), (3L, 3L, 7L))
      .toDF("x1", "x2", "y")
    val r = Stats.olsFit2(df, "y", "x1", "x2").collect().head
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
  }

  test("olsFit2: null rows are excluded from the fit") {
    val df = Seq((Some(1L), Some(0L), Some(5L)), (None, Some(1L), Some(9L)),
      (Some(2L), Some(0L), Some(8L)), (Some(3L), Some(1L), Some(11L)),
      (Some(4L), Some(1L), Some(14L)))
      .toDF("x1", "x2", "y")
    val r = Stats.olsFit2(df, "y", "x1", "x2").collect().head
    assert(r.getLong(0) === 4L) // y = 2 + 3x1 + 0x2 on the non-null rows
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((2000000L, 3000000L, 0L)))
  }

  // ---------------------------------------------------- durbinWatson

  private def dw(xs: Seq[Long]) = Stats.durbinWatson(
    xs.zipWithIndex.map { case (x, i) => ("g", i.toLong, x) }
      .toDF("g", "bucket", "x"), "g", "bucket", "x")
    .collect().head

  test("durbinWatson: an exact linear trend has zero residuals -> NULL") {
    val r = dw(Seq(3L, 5L, 7L, 9L, 11L, 13L))
    assert(r.getLong(2) === 2000000L) // slope recovered exactly
    assert(r.isNullAt(3))
  }

  test("durbinWatson: alternating residuals push DW toward 4, " +
      "momentum pushes it toward 0") {
    // trend + (-1)^t oscillation
    val osc = dw((1 to 40).map(t => t.toLong + (if (t % 2 == 0) 1L else -1L)))
    assert(osc.getLong(3) > 3000000L, s"oscillation DW = ${osc.getLong(3)}")
    // step function: long runs of same-sign residuals
    val mom = dw(Seq.fill(20)(0L) ++ Seq.fill(20)(10L))
    assert(mom.getLong(3) < 1000000L, s"momentum DW = ${mom.getLong(3)}")
  }

  // ----------------------------------------------- partialCorrelation

  test("partialCorrelation: confound fully explains the correlation") {
    // a and b both equal z (plus distinct constants): r_ab = 1 via z,
    // but partialling z out leaves nothing -> denominator 0 -> NULL
    val df = Seq((1L, 11L, 1L), (0L, 10L, 0L), (1L, 11L, 1L),
      (0L, 10L, 0L)).toDF("a", "b", "z")
    val r = Stats.partialCorrelation(df, "a", "b", "z").collect().head
    assert(r.getLong(1) === 1000000L || r.getLong(1) === 999999L)
    assert(r.isNullAt(4)) // |r_az| = 1 -> sqrt(1 - r^2) = 0
  }

  test("partialCorrelation: independent confound leaves r_ab intact") {
    // z uncorrelated with both (balanced): r_az = r_bz = 0 exactly,
    // so partial == marginal
    val df = Seq((1L, 2L, 0L), (2L, 4L, 1L), (1L, 2L, 1L), (2L, 4L, 0L),
      (3L, 5L, 0L), (4L, 7L, 1L), (3L, 5L, 1L), (4L, 7L, 0L))
      .toDF("a", "b", "z")
    val r = Stats.partialCorrelation(df, "a", "b", "z").collect().head
    assert(r.getLong(2) === 0L && r.getLong(3) === 0L)
    assert(r.getLong(4) === r.getLong(1))
  }

  test("partialCorrelation: zero-variance column yields NULLs") {
    val df = Seq((1L, 2L, 5L), (2L, 3L, 5L), (3L, 4L, 5L))
      .toDF("a", "b", "z")
    val r = Stats.partialCorrelation(df, "a", "b", "z").collect().head
    assert(r.isNullAt(1) && r.isNullAt(4))
  }

  // ------------------------------------------ uncertaintyCoefficient

  test("uncertaintyCoefficient: bijective association is exactly 1e6 " +
      "(per-term floors cancel)") {
    val df = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("c", "z"))
      .toDF("r", "c")
    val out = Stats.uncertaintyCoefficient(df, "r", "c").collect().head
    assert(out.getLong(4) === 1000000L)
  }

  test("uncertaintyCoefficient: exact independence is 0") {
    val df = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"))
      .toDF("r", "c")
    val out = Stats.uncertaintyCoefficient(df, "r", "c").collect().head
    assert(out.getLong(3) === 0L && out.getLong(4) === 0L)
  }

  test("uncertaintyCoefficient: single row category has zero entropy " +
      "-> NULL u") {
    val df = Seq(("a", "x"), ("a", "y")).toDF("r", "c")
    val out = Stats.uncertaintyCoefficient(df, "r", "c").collect().head
    assert(out.getLong(2) === 0L && out.isNullAt(4))
  }

  test("ordinalAssociation: perfect concordance/discordance hit +-1e6") {
    val up = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("x", "y")
    val u = Stats.ordinalAssociation(up, col("x"), col("y"))
      .collect().head
    assert(u.getLong(1) === 3L && u.getLong(2) === 0L) // C, D
    assert(u.getLong(3) === 1000000L) // gamma
    assert(u.getLong(4) === 1000000L && u.getLong(5) === 1000000L)
    val down = Seq((1L, 3L), (2L, 2L), (3L, 1L)).toDF("x", "y")
    val d = Stats.ordinalAssociation(down, col("x"), col("y"))
      .collect().head
    assert(d.getLong(3) === -1000000L)
  }

  test("ordinalAssociation: x-ties leave gamma at 1 but dilute " +
      "Somers' D(x|y)") {
    // pairs: (1,1)-(1,2) tied on x; the other two concordant
    val df = Seq((1L, 1L), (1L, 2L), (2L, 3L)).toDF("x", "y")
    val r = Stats.ordinalAssociation(df, col("x"), col("y"))
      .collect().head
    assert(r.getLong(1) === 2L && r.getLong(2) === 0L)
    assert(r.getLong(3) === 1000000L) // gamma ignores the tie
    assert(r.getLong(4) === 1000000L) // D(y|x): 2 / (3 - 1 x-tied)
    assert(r.getLong(5) === 666666L)  // D(x|y): 2 / 3 untied-on-y
  }

  test("ordinalAssociation: constant x -> every pair x-tied -> NULLs") {
    val df = Seq((5L, 1L), (5L, 2L), (5L, 3L)).toDF("x", "y")
    val r = Stats.ordinalAssociation(df, col("x"), col("y"))
      .collect().head
    assert(r.isNullAt(3) && r.isNullAt(4)) // gamma, D(y|x)
    assert(r.getLong(5) === 0L)            // D(x|y): 0 / 3 pairs
  }

  test("jarqueBera: two-point symmetric data is exact in fp " +
      "(skew 0, kurtosis 1, JB = n/6)") {
    val df = Seq(("g", 0L), ("g", 0L), ("g", 1L), ("g", 1L))
      .toDF("grp", "x")
    val r = Stats.jarqueBera(df, "grp", "x").collect().head
    assert(r.getLong(1) === 4L)
    assert(r.getLong(2) === 500000L)  // mean 0.5
    assert(r.getLong(3) === 0L)       // skew exactly 0
    assert(r.getLong(4) === 1000000L) // kurtosis exactly 1
    assert(r.getLong(5) === 666666L)  // 4/6 * (2^2/4) = 0.666..
  }

  test("jarqueBera: constant group has zero variance -> NULL stats") {
    val df = Seq(("g", 7L), ("g", 7L), ("g", 7L)).toDF("grp", "x")
    val r = Stats.jarqueBera(df, "grp", "x").collect().head
    assert(r.getLong(2) === 7000000L)
    assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5))
  }

  test("chapmanEstimate: textbook capture-recapture numbers") {
    // population 100, sampler A catches ids < 30, B catches ids % 10 < 3
    val df = (0L until 100L).map(i => (i, i < 30, i % 10 < 3))
      .toDF("id", "a", "b")
    val r = Stats.chapmanEstimate(df, col("a"), col("b")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ===
      ((100L, 30L, 30L)))
    val m = r.getLong(3) // ids < 30 with last digit 0,1,2 -> 9
    assert(m === 9L)
    // Chapman: (31*31)/10 - 1 = 95.1 -> 95100000 on the 1e6 grid
    assert(r.getLong(4) === 1000000L * 31 * 31 / 10 - 1000000L)
    // variance: 31*31*21*21 / ((m+1)^2 (m+2)) = .. / (100*11)
    assert(r.getLong(5) === 1000000L * 31 * 31 * 21 * 21 / (100 * 11))
  }

  test("jackknifeRatio: uniform groups leave the ratio unchanged; a " +
      "heavy group's pseudo-value moves opposite its pull") {
    val rows = Seq(("a", 10L, 100L), ("b", 10L, 100L), ("c", 80L, 100L))
    val out = Stats.jackknifeRatio(rows.toDF("g", "y", "x"), "g",
      "y", "x").collect().map(r => r.getString(0) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // full ratio 100/300
    assert(out("a")._1 === 333333L)
    // drop a: 90/200 = 0.45; drop c: 20/200 = 0.1
    assert(out("a")._2 === 450000L)
    assert(out("c")._2 === 100000L)
    // pseudo_c = 3*(1/3) - 2*(0.1) = 0.8: c pulls the ratio UP
    assert(out("c")._3 === 799999L || out("c")._3 === 800000L)
  }

  test("wilsonInterval: textbook 5-of-10 bounds; extreme p-hat keeps " +
      "nonzero width") {
    val df = (1L to 10L).map(i => ("g", i <= 5)).toDF("g", "s")
    val r = Stats.wilsonInterval(df, "g", col("s")).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((10L, 5L, 500000L)))
    def wilson(x: Double, n: Double, up: Boolean): Long = {
      val z = 1.96; val z2 = z * z; val ph = x / n
      val c = ph + z2 / (2.0 * n)
      val m = z * math.sqrt(ph * (1.0 - ph) / n + z2 / (4.0 * n * n))
      math.floor(1e6 * (if (up) c + m else c - m) / (1.0 + z2 / n)).toLong
    }
    assert(r.getLong(4) === wilson(5, 10, up = false))
    assert(r.getLong(5) === wilson(5, 10, up = true))
    // all-success group: Wald would give [1,1]; Wilson lower bound < 1
    val all = (1L to 4L).map(i => ("h", true)).toDF("g", "s")
    val ra = Stats.wilsonInterval(all, "g", col("s")).collect().head
    assert(ra.getLong(4) < 1000000L && ra.getLong(5) === 1000000L)
  }

  test("ebShrinkage: extreme small groups pull toward the prior mean; " +
      "identical rates are degenerate -> NULL") {
    val rows = (1L to 10L).map(i => ("hi", i <= 9)) ++
      (1L to 10L).map(i => ("lo", i <= 1)) ++
      (1L to 10L).map(i => ("mid", i <= 5))
    val out = Stats.ebShrinkage(rows.toDF("g", "s"), "g", col("s"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    assert(out("hi")._2 < out("hi")._1) // 0.9 shrinks down
    assert(out("lo")._2 > out("lo")._1) // 0.1 shrinks up
    assert(out("hi")._2 > out("mid")._2 && out("mid")._2 > out("lo")._2)
    val same = Seq(("a", true), ("a", false), ("b", true), ("b", false))
      .toDF("g", "s")
    val rs = Stats.ebShrinkage(same, "g", col("s")).collect().head
    assert(rs.isNullAt(4)) // zero between-group variance
  }

  test("moodMedian: split groups around the grand median give the " +
      "hand chi-square cells") {
    val df = (Seq(1L, 2L, 3L).map(("a", _)) ++ Seq(4L, 5L, 6L)
      .map(("b", _))).toDF("g", "x")
    val out = Stats.moodMedian(df, "g", "x").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    // grand lower median = 3; a has 0 above, b has 3; e = 1.5 each
    assert(out("a") === ((3L, 3L, 0L, 1500000000L, 1500000000L)))
    assert(out("b") === ((3L, 3L, 3L, 1500000000L, 1500000000L)))
  }

  test("kendallW: perfect concordance is 1e6, perfect reversal is 0") {
    val agree = Seq(("b1", "a", 1L), ("b1", "b", 2L), ("b1", "c", 3L),
      ("b2", "a", 10L), ("b2", "b", 20L), ("b2", "c", 30L))
      .toDF("blk", "trt", "v")
    val w1 = Stats.kendallW(agree, "blk", "trt", "v").collect().head
    assert((w1.getLong(0), w1.getLong(1)) === ((2L, 3L)))
    assert(w1.getLong(3) === 0L) // no ties
    assert(w1.getLong(4) === 1000000L)
    val rev = Seq(("b1", "a", 1L), ("b1", "b", 2L),
      ("b2", "a", 2L), ("b2", "b", 1L)).toDF("blk", "trt", "v")
    val w0 = Stats.kendallW(rev, "blk", "trt", "v").collect().head
    assert(w0.getLong(4) === 0L)
  }

  test("kendallW: all-tied blocks have zero denominator -> NULL") {
    val df = Seq(("b1", "a", 5L), ("b1", "b", 5L)).toDF("blk", "trt", "v")
    val r = Stats.kendallW(df, "blk", "trt", "v").collect().head
    assert(r.isNullAt(4))
  }

  test("pacf2: phi22 replays the Durbin-Levinson chain on the " +
      "operator's own rho values; constant series yields NULLs") {
    val xs = Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L, 5L, 3L, 5L, 8L)
    val df = xs.zipWithIndex.map { case (x, i) =>
      ("g", i.toLong * 60L, x) }.toDF("grp", "bucket", "x")
    val r = Stats.pacf2(df, "grp", "bucket", "x", stepSec = 60L)
      .collect().head
    val r1 = r.getLong(1).toDouble / 1000000.0
    val r2 = r.getLong(2).toDouble / 1000000.0
    assert(r.getLong(3) ===
      math.floor(1000000.0 * (r2 - r1 * r1) / (1.0 - r1 * r1)).toLong)
    val const = (0 until 6).map(i => ("g", i.toLong * 60L, 7L))
      .toDF("grp", "bucket", "x")
    val rc = Stats.pacf2(const, "grp", "bucket", "x", stepSec = 60L)
      .collect().head
    assert(rc.isNullAt(1) && rc.isNullAt(3))
  }

  test("vMeasure: identical partitions score 1e6 on all three; " +
      "single-cluster scores completeness 1e6, homogeneity 0") {
    val same = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("c", "z"))
      .toDF("cl", "lb")
    val r = Stats.vMeasure(same, "cl", "lb").collect().head
    assert(r.getLong(4) === 1000000L && r.getLong(5) === 1000000L)
    assert(r.getLong(6) === 1000000L)
    val one = Seq(("a", "x"), ("a", "y"), ("a", "x"), ("a", "y"))
      .toDF("cl", "lb")
    val r1 = Stats.vMeasure(one, "cl", "lb").collect().head
    assert(r1.getLong(1) === 0L)        // H(clusters) = 0: one cluster
    assert(r1.getLong(3) === 0L)        // I = 0
    assert(r1.getLong(4) === 0L)        // homogeneity I/H(labels) = 0
    assert(r1.getLong(5) === 1000000L)  // completeness: H(K)=0 -> 1
    assert(r1.getLong(6) === 0L)        // v = 2I/(H(C)+H(K)) = 0
    // dual degenerate: single label across clusters -> homogeneity 1
    val lbl = Seq(("a", "x"), ("b", "x"), ("c", "x")).toDF("cl", "lb")
    val r2 = Stats.vMeasure(lbl, "cl", "lb").collect().head
    assert(r2.getLong(4) === 1000000L)  // H(labels)=0 -> homogeneity 1
    assert(r2.getLong(5) === 0L)        // completeness I/H(clusters)=0
  }

  test("iccOneWay: perfect between-group separation gives ICC 1, " +
      "degenerate variance gives NULL") {
    val df = Seq(("a", 0L), ("a", 0L), ("b", 10L), ("b", 10L))
      .toDF("g", "x")
    val r = Stats.iccOneWay(df, "g", "x").collect().head
    assert((r.getLong(0), r.getLong(1)) === ((2L, 4L)))
    assert(r.getLong(2) === 100000000L) // SSB = 100 on the 1e6 grid
    assert(r.getLong(3) === 0L)         // SSW = 0
    assert(r.getLong(4) === 2000000L)   // balanced: n0 = 2
    assert(r.getLong(5) === 1000000L)
    val flat = Seq(("a", 5L), ("a", 5L), ("b", 5L), ("b", 5L))
      .toDF("g", "x")
    assert(Stats.iccOneWay(flat, "g", "x").collect().head.isNullAt(5))
  }

  test("randomizationTest: zero observed gap is never extreme-proof " +
      "(p stays away from 0) and identical groups give t_obs 0") {
    val df = (0L to 39L).map(i => (i, 10L, i % 2 == 0))
      .toDF("id", "x", "g")
    val r = Stats.randomizationTest(df, "id", "x", col("g"), reps = 50)
      .collect().head
    assert((r.getLong(0), r.getLong(1)) === ((40L, 20L)))
    assert(r.getLong(2) === 0L) // constant x: every mean gap is 0
    // every valid rep also has t = 0 => all extreme => p = 1
    assert(r.getLong(4) === r.getLong(3))
    assert(r.getLong(5) === 1000000L)
  }

  test("randomizationTest: huge real gap is extreme under no resample " +
      "-> p at the Monte-Carlo floor") {
    // group TRUE x=1000, group FALSE x=0, balanced
    val df = (0L to 39L).map(i =>
      (i, if (i % 2 == 0) 1000L else 0L, i % 2 == 0)).toDF("id", "x", "g")
    val r = Stats.randomizationTest(df, "id", "x", col("g"), reps = 100)
      .collect().head
    assert(r.getLong(2) === 1000000000L) // t_obs = 1000 exactly
    // the md5 draw essentially never re-creates perfect separation
    assert(r.getLong(4) <= 2L)
    assert(r.getLong(5) <= 1000000L * 3 / (r.getLong(3) + 1))
  }

  test("gofFdrBattery: the one divergent group ranks first and is " +
      "the only rejection at alpha=0.05") {
    // three groups share the corpus mix; gX inverts it
    val rows =
      Seq("g1", "g2", "g3").flatMap { g =>
        Seq.fill(6)((g, "a")) ++ Seq.fill(3)((g, "b")) ++ Seq((g, "c"))
      } ++ (Seq.fill(1)(("gX", "a")) ++ Seq.fill(3)(("gX", "b")) ++
        Seq.fill(6)(("gX", "c")))
    val out = Stats.gofFdrBattery(rows.toDF("g", "cat"), "g", "cat")
      .collect()
    assert(out.length === 4)
    val first = out.head
    assert(first.getString(0) === "gX" && first.getLong(4) === 1L)
    assert(first.getInt(6) === 1) // BH-adjusted p below 0.05
    assert(out.tail.forall(_.getInt(6) === 0))
    // conforming groups all carry the same (small) chi-square
    assert(out.tail.map(_.getLong(2)).distinct.length === 1)
  }

  // ---- brunnerMunzel / ansariBradley / pageL --------------------------------

  test("brunnerMunzel: interleaved samples hand-checked; perfect " +
      "separation degenerates to NULL W with p-hat 1; midrank ties") {
    // A={1,3,5}, B={2,4,6}: D_A=18, D_B=24, E_A=E_B=72, v=1,
    // W = 18/(6*sqrt(24)), phat = 12/18
    val inter = Seq(("a", 1L), ("a", 3L), ("a", 5L),
      ("b", 2L), ("b", 4L), ("b", 6L)).toDF("g", "x")
    val r = Stats.brunnerMunzel(inter, "g", "x", "a", "b").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((3L, 3L, 18L, 24L)))
    assert((r.getLong(4), r.getLong(5)) === ((1000000L, 1000000L)))
    assert(r.getLong(6) === 666666L)
    assert(r.getLong(7) ===
      math.floor(1.0e6 * 18.0 / (6.0 * math.sqrt(24.0))).toLong)
    // perfect separation: both rank variances are 0 -> W undefined
    val sep = Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 4L), ("b", 5L), ("b", 6L)).toDF("g", "x")
    val rs = Stats.brunnerMunzel(sep, "g", "x", "a", "b").collect().head
    assert(rs.isNullAt(7) && rs.getLong(6) === 1000000L)
    // ties: A={1,1}, B={1,2} -> E_A=0, E_B=8, W=1 (doubled midranks)
    val tie = Seq(("a", 1L), ("a", 1L), ("b", 1L), ("b", 2L)).toDF("g", "x")
    val rt = Stats.brunnerMunzel(tie, "g", "x", "a", "b").collect().head
    assert((rt.getLong(2), rt.getLong(3)) === ((8L, 12L)))
    assert((rt.getLong(4), rt.getLong(5)) === ((0L, 500000L)))
    assert(rt.getLong(7) === 1000000L)
  }

  test("ansariBradley: extremes-vs-middle hand-checked; equal-scale " +
      "interleave scores z near 0") {
    // A={1,4} (extremes), B={2,3} (middle): 2a = 2,4,4,2;
    // t2=4, s2=12, q4=40, z = -8/sqrt(4*16/3) = -sqrt(3)
    val r = Stats.ansariBradley(
      Seq(("a", 1L), ("a", 4L), ("b", 2L), ("b", 3L)).toDF("g", "x"),
      "g", "x", "a", "b").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((2L, 2L, 4L)))
    assert((r.getLong(3), r.getLong(4)) === ((4L, 12L)))
    assert(r.getDecimal(5).longValue === 40L)
    assert(r.getLong(6) ===
      math.floor(1.0e6 * -8.0 / math.sqrt(4.0 * 16.0 / 3.0)).toLong)
    // same dispersion interleaved: T sits at its expectation exactly
    val even = Seq(("a", 1L), ("a", 3L), ("b", 2L), ("b", 4L)).toDF("g", "x")
    val re = Stats.ansariBradley(even, "g", "x", "a", "b").collect().head
    // t2 = 2+4 = 6 = n_a*s2/N = 2*12/4 -> z = 0
    assert(re.getLong(3) === 6L && re.getLong(6) === 0L)
  }

  test("pageL: perfectly ordered blocks hit the exact z; incomplete " +
      "blocks drop; reversed order flips the sign") {
    // 2 complete blocks, x rising with treatment key order:
    // L = 28, E = 24, Var = 4 -> z = 2
    val df = Seq(
      ("b1", "t1", 1L), ("b1", "t2", 2L), ("b1", "t3", 3L),
      ("b2", "t1", 1L), ("b2", "t2", 2L), ("b2", "t3", 3L),
      ("b3", "t1", 9L), ("b3", "t2", 9L)) // incomplete: dropped
      .toDF("blk", "trt", "x")
    val r = Stats.pageL(df, "blk", "trt", "x").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((2L, 3L, 56L)))
    assert((r.getLong(3), r.getLong(4)) === ((96L, 576L)))
    assert(r.getLong(5) === 2000000L)
    // anti-ordered data: L = 2*(1*6+2*4+3*2) = 40 -> z = -2
    val rev = Seq(
      ("b1", "t1", 3L), ("b1", "t2", 2L), ("b1", "t3", 1L),
      ("b2", "t1", 3L), ("b2", "t2", 2L), ("b2", "t3", 1L))
      .toDF("blk", "trt", "x")
    assert(Stats.pageL(rev, "blk", "trt", "x").collect().head
      .getLong(5) === -2000000L)
  }

  test("grubbs: hand-checked outlier; constant sample degenerates " +
      "to NULL") {
    // {1,2,3,10}: maxdev = |4*10-16| = 24, num0 = 800
    val d = Seq(1L, 2L, 3L, 10L).toDF("x")
    val r = Stats.grubbs(d, "x").collect().head
    assert((r.getLong(0), r.getLong(1)) === ((4L, 24L)))
    assert(r.getDecimal(2).longValue === 800L)
    assert(r.getLong(3) === math.floor(1.0e6 * 24.0 * math.sqrt(3.0) /
      math.sqrt(800.0)).toLong)
    assert(Stats.grubbs(Seq(5L, 5L, 5L).toDF("x"), "x")
      .collect().head.isNullAt(3))
  }

  test("quade: classical 3-block/2-treatment example gives F = 4/19; " +
      "4x-scaled integer grids match the textbook statistic") {
    // ranges 2/6/4 -> block weights 1/3/2; classical F = 4/19
    val d = Seq(
      ("b1", "t1", 1L), ("b1", "t2", 3L),
      ("b2", "t1", 2L), ("b2", "t2", 8L),
      ("b3", "t1", 5L), ("b3", "t2", 1L)).toDF("blk", "trt", "x")
    val r = Stats.quade(d, "blk", "trt", "x").collect().head
    assert((r.getLong(0), r.getLong(1)) === ((3L, 2L)))
    assert((r.getDecimal(2).longValue, r.getDecimal(3).longValue) ===
      ((112L, 32L)))
    assert(r.getLong(4) === math.floor(1.0e6 * 64.0 / 304.0).toLong)
    // identical treatments everywhere: every S4 = 0 -> NULL F
    val flat = Seq(
      ("b1", "t1", 2L), ("b1", "t2", 2L),
      ("b2", "t1", 7L), ("b2", "t2", 7L)).toDF("blk", "trt", "x")
    assert(Stats.quade(flat, "blk", "trt", "x").collect().head.isNullAt(4))
  }

  test("wilcoxonSignedRank: hand-checked without and with ties; " +
      "zero differences drop; all-zero degenerates") {
    // d = +1,-2,+3,+4: W2 = 2+6+8 = 16, 48Var = 360
    val d1 = Seq((0L, 1L), (2L, 0L), (0L, 3L), (0L, 4L)).toDF("b", "a")
    val r = Stats.wilcoxonSignedRank(d1, "b", "a").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((4L, 3L, 1L, 16L)))
    assert(r.getDecimal(4).longValue === 360L)
    assert(r.getLong(5) === math.floor(1.0e6 * 12.0 /
      (4.0 * math.sqrt(360.0 / 48.0))).toLong)
    // ties: d = +1,+1,-1,+2 -> midrank 2R(1)=4, tie term 24
    val d2 = Seq((0L, 1L), (0L, 1L), (1L, 0L), (0L, 2L)).toDF("b", "a")
    val rt = Stats.wilcoxonSignedRank(d2, "b", "a").collect().head
    assert(rt.getLong(3) === 16L && rt.getDecimal(4).longValue === 336L)
    // zeros drop; an all-zero sample has no test
    val dz = Seq((5L, 5L), (7L, 7L), (1L, 2L)).toDF("b", "a")
    assert(Stats.wilcoxonSignedRank(dz, "b", "a")
      .collect().head.getLong(0) === 1L)
    val all0 = Seq((5L, 5L), (7L, 7L)).toDF("b", "a")
    assert(Stats.wilcoxonSignedRank(all0, "b", "a")
      .collect().head.isNullAt(5))
  }

  test("bowker: asymmetric flows hand-checked; one-sided pairs test " +
      "against zero; symmetric table scores 0") {
    // (a->b:3, b->a:1) term 1e9; (a->c:2, c->a absent) term 2e9
    val d = (Seq.fill(3)(("a", "b")) ++ Seq(("b", "a")) ++
      Seq.fill(2)(("a", "c")) ++ Seq.fill(5)(("a", "a")))
      .toDF("r1", "r2")
    val r = Stats.bowker(d, "r1", "r2").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ===
      ((11L, 2L, 3000000000L)))
    val sym = (Seq.fill(2)(("a", "b")) ++ Seq.fill(2)(("b", "a")))
      .toDF("r1", "r2")
    val rs = Stats.bowker(sym, "r1", "r2").collect().head
    assert(rs.getLong(1) === 1L && rs.getLong(2) === 0L)
  }

  test("ksUniform: uniform buckets score 0; total concentration " +
      "scores (k-1)/k; out-of-range buckets drop") {
    val u = Seq(0L, 0L, 1L, 1L, 2L, 2L, 3L, 3L).toDF("bucket")
    val ru = Stats.ksUniform(u, "bucket", k = 4).collect().head
    assert((ru.getLong(0), ru.getLong(2), ru.getLong(3)) === ((8L, 0L, 0L)))
    val c = Seq(0L, 0L, 0L, 0L, 0L, 9L).toDF("bucket") // 9 out of range
    val rc = Stats.ksUniform(c, "bucket", k = 4).collect().head
    assert((rc.getLong(0), rc.getLong(2)) === ((5L, 15L)))
    assert(rc.getLong(3) === 750000L)
  }

  test("pettitt: clean level shift lands K and t_star at the break; " +
      "constant series scores zero with p = 2") {
    // [0,0,0,10,10,10]: R2(0)=4, R2(10)=10; U = 3,6,9,6,3 -> K=9 at t=3
    val d = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 10L), (5L, 10L),
      (6L, 10L)).toDF("o", "x")
    val r = Stats.pettitt(d, "o", "x").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((6L, 9L, 3L)))
    assert(r.getLong(3) === math.floor(1.0e6 * 2.0 *
      math.exp(-6.0 * 81.0 / (216.0 + 36.0))).toLong)
    // constant: every U_t = 0, earliest t wins, p quantizes to 2.0
    val flat = Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("o", "x")
    val rf = Stats.pettitt(flat, "o", "x").collect().head
    assert((rf.getLong(1), rf.getLong(2), rf.getLong(3)) ===
      ((0L, 1L, 2000000L)))
  }

  test("kuiper: uniform scores 0; one-sided pile-up matches the KS " +
      "numerator; two-sided imbalance sums both gaps") {
    val u = Seq(0L, 0L, 1L, 1L, 2L, 2L, 3L, 3L).toDF("bucket")
    val ru = Stats.kuiper(u, "bucket", k = 4).collect().head
    assert((ru.getLong(2), ru.getLong(3), ru.getLong(4)) === ((0L, 0L, 0L)))
    // all mass in bucket 0: D+ = 15 (the ksUniform numerator), D- = 0
    val c = Seq(0L, 0L, 0L, 0L, 0L).toDF("bucket")
    val rc = Stats.kuiper(c, "bucket", k = 4).collect().head
    assert((rc.getLong(2), rc.getLong(3), rc.getLong(4)) ===
      ((15L, 0L, 750000L)))
    // [0,3,3]: hot bucket 0 early (D+ = 1) AND hole before 3 (D- = 5):
    // V numerator 6 of 12 — KS alone would report only 5
    val two = Seq(0L, 3L, 3L).toDF("bucket")
    val rt = Stats.kuiper(two, "bucket", k = 4).collect().head
    assert((rt.getLong(2), rt.getLong(3), rt.getLong(4)) ===
      ((1L, 5L, 500000L)))
  }

  test("hellingerDrift: identical distributions score 0; disjoint " +
      "support scores 1; one-sided cells contribute zero") {
    val same = Seq(("A", "a"), ("A", "a"), ("A", "b"), ("A", "b"),
      ("B", "a"), ("B", "b")).toDF("g", "c")
    val rs = Stats.hellingerDrift(same, "g", "c", "A", "B")
      .collect().head
    // each cell: sqrt((2*1)/(4*2)) = 0.5 exactly -> bc sums to 1e9
    assert((rs.getLong(0), rs.getLong(1), rs.getLong(2)) === ((4L, 2L, 2L)))
    assert(rs.getLong(3) === 1000000000L && rs.getLong(4) === 0L)
    val disj = Seq(("A", "a"), ("A", "a"), ("B", "b"), ("B", "b"),
      ("B", "b")).toDF("g", "c")
    val rd = Stats.hellingerDrift(disj, "g", "c", "A", "B")
      .collect().head
    assert(rd.getLong(3) === 0L && rd.getLong(4) === 1000000L)
  }

  test("blomqvistBeta: monotone pairs score +1, antitone -1; " +
      "on-median points excluded and counted") {
    val up = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("x", "y")
    val ru = Stats.blomqvistBeta(up, "x", "y").collect().head
    assert((ru.getLong(1), ru.getLong(2), ru.getLong(3), ru.getLong(4)) ===
      ((2L, 0L, 1L, 1000000L)))
    val down = Seq((1L, 3L), (2L, 2L), (3L, 1L)).toDF("x", "y")
    val rd = Stats.blomqvistBeta(down, "x", "y").collect().head
    assert((rd.getLong(1), rd.getLong(2), rd.getLong(4)) ===
      ((0L, 2L, -1000000L)))
    // everything on a median line: no quadrant count, no beta
    val flat = Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("x", "y")
    assert(Stats.blomqvistBeta(flat, "x", "y").collect().head.isNullAt(4))
  }

  test("linCcc: identity reproduces 1; a pure +1 shift pays the " +
      "location penalty exactly") {
    val id = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("x", "y")
    assert(Stats.linCcc(id, "x", "y").collect().head.getLong(3) ===
      1000000L)
    // x=[1,2,3], y=x+1: A = B = 6, den = 6+6+9 -> 12/21
    val sh = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("x", "y")
    val r = Stats.linCcc(sh, "x", "y").collect().head
    assert(r.getDecimal(1).longValue === 12L)
    assert(r.getDecimal(2).longValue === 21L)
    assert(r.getLong(3) === math.floor(1.0e6 * 12.0 / 21.0).toLong)
    // constants on both sides: zero denominator, no coefficient
    val const = Seq((5L, 5L), (5L, 5L)).toDF("x", "y")
    assert(Stats.linCcc(const, "x", "y").collect().head.isNullAt(3))
  }

  test("vanElteren: opposing strata cancel exactly; fully-tied " +
      "stratum contributes nothing; single stratum hand-checked") {
    // s1: A below B (d = -0.8), s2: A above B (d = +0.8): z = 0
    val opp = Seq(("s1", "A", 1L), ("s1", "A", 2L), ("s1", "B", 3L),
      ("s1", "B", 4L), ("s2", "A", 5L), ("s2", "A", 6L),
      ("s2", "B", 3L), ("s2", "B", 4L)).toDF("s", "g", "v")
    val ro = Stats.vanElteren(opp, "s", "g", "v", "A", "B")
      .collect().head
    assert(ro.getLong(0) === 2L && ro.getLong(1) === 0L)
    assert(ro.getLong(2) === 2L * 266666666L)
    assert(ro.getLong(3) === 0L)
    // a stratum of pure ties: d = 0 AND tie-corrected variance = 0
    val tied = opp.union(Seq(("s3", "A", 7L), ("s3", "A", 7L),
      ("s3", "B", 7L), ("s3", "B", 7L)).toDF("s", "g", "v"))
    val rt = Stats.vanElteren(tied, "s", "g", "v", "A", "B")
      .collect().head
    assert(rt.getLong(0) === 3L && rt.getLong(1) === ro.getLong(1))
    assert(rt.getLong(2) === ro.getLong(2))
    // one shifted stratum: z replays the operator's own fp ops
    val one = Seq(("s1", "A", 1L), ("s1", "A", 2L), ("s1", "B", 3L),
      ("s1", "B", 4L)).toDF("s", "g", "v")
    val r1 = Stats.vanElteren(one, "s", "g", "v", "A", "B")
      .collect().head
    assert((r1.getLong(1), r1.getLong(2)) === ((-800000000L, 266666666L)))
    assert(r1.getLong(3) === math.floor(1.0e6 * -800000000.0 /
      math.sqrt(1.0e9 * 266666666.0)).toLong)
  }

  test("tailDependence: comonotone pair has lambda 1 and 10x " +
      "independence excess; antitone pair has empty joint tail") {
    val co = (1L to 10L).map(i => (i, i)).toDF("x", "y")
    val rc = Stats.tailDependence(co, "x", "y").collect().head
    assert((rc.getLong(1), rc.getLong(2)) === ((9L, 9L)))
    assert((rc.getLong(3), rc.getLong(4), rc.getLong(5)) ===
      ((1L, 1L, 1L)))
    assert(rc.getLong(6) === 1000000L && rc.getLong(7) === 10000000L)
    val anti = (1L to 10L).map(i => (i, 11L - i)).toDF("x", "y")
    val ra = Stats.tailDependence(anti, "x", "y").collect().head
    assert(ra.getLong(5) === 0L)
    assert(ra.getLong(6) === 0L && ra.getLong(7) === 0L)
  }
}
