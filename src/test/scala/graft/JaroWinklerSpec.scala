package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.TextFns
import graft.operators.Similarity
import graft.plans.JaroWinklerSim

class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinklerSim.sim(UTF8String.fromString(a), UTF8String.fromString(b))

  test("textbook vectors (Winkler 1990 / DuckDB-verified values)") {
    assert(jw("martha", "marhta") === 0.9611111111111111)
    assert(jw("dixon", "dicksonx") === 0.8133333333333332)
    assert(jw("jellyfish", "smellyfish") === 0.8962962962962964)
    assert(jw("dwayne", "duane") === 0.8400000000000001)
    assert(jw("crate", "trace") === 0.7333333333333334)
    assert(jw("abab", "baba") === 0.8333333333333334)
  }

  test("boost threshold: no prefix bonus at or below jaro 0.7") {
    // jaro('abcdefgh','abzzzzzz') = 0.5 with common prefix 2 → unboosted
    assert(jw("abcdefgh", "abzzzzzz") === 0.5)
    // jaro('a','azzzzzzzzz') lands just ABOVE 0.7 in doubles → boosted
    assert(jw("a", "azzzzzzzzz") === 0.7300000000000001)
  }

  test("prefix cap at 4 and edge cases") {
    // common prefix 5 counts as 4
    assert(jw("prefixx", "prefiyy") === 0.8857142857142858)
    assert(jw("", "") === 1.0)
    assert(jw("", "abc") === 0.0)
    assert(jw("abc", "") === 0.0)
    assert(jw("a", "a") === 1.0)
    assert(jw("same", "same") === 1.0)
    // no matching characters at all
    assert(jw("aaa", "zzz") === 0.0)
  }

  test("codegen path equals interpreted eval") {
    val pairs = Seq(("martha", "marhta"), ("dixon", "dicksonx"),
      ("small ring", "red ring"), ("", "x"), ("abab", "baba"))
    val viaDf = pairs.toDF("a", "b")
      .select(TextFns.jaroWinkler(col("a"), col("b"))).as[Double].collect()
    assert(viaDf.toSeq === pairs.map { case (a, b) => jw(a, b) })
  }

  test("null inputs yield null") {
    val out = Seq((Option("abc"), Option.empty[String]))
      .toDF("a", "b")
      .select(TextFns.jaroWinkler(col("a"), col("b")))
      .collect().head
    assert(out.isNullAt(0))
  }

  test("jaroWinklerBound dominates the true similarity on random " +
      "unicode strings (the prune-validity property)") {
    val rnd = new scala.util.Random(37)
    val alpha = "abcdeé漢 zy"
    def word(n: Int) = (1 to n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    val pairs = (1 to 400).map(_ =>
      (word(rnd.nextInt(20)), word(rnd.nextInt(20)))) ++
      Seq(("", ""), ("", "abc"), ("abc", ""), ("martha", "marhta"),
        ("same", "same"), ("aaa", "zzz"))
    val out = pairs.toDF("a", "b").select(
      TextFns.jaroWinklerBound(col("a"), col("b")).as("ub"),
      TextFns.jaroWinkler(col("a"), col("b")).as("sim")).collect()
    out.foreach(r => assert(r.getDouble(0) >= r.getDouble(1),
      s"bound ${r.getDouble(0)} < sim ${r.getDouble(1)}"))
    // identical strings: bound is tight at 1.0
    assert(jw("same", "same") === 1.0)
  }

  test("blockedLinkage prune ≡ no-prune: the bound filter drops no " +
      "accepted pair at any threshold") {
    val rnd = new scala.util.Random(41)
    val nouns = Seq("bolt", "gear", "ring")
    val adjs = Seq("red", "rod", "blue", "bleu", "green", "grene", "teal")
    val rows = (1 to 60).map(i =>
      (i.toLong, s"${adjs(rnd.nextInt(adjs.length))} ${nouns(rnd.nextInt(nouns.length))}"))
    val df = rows.toDF("id", "name")
    for (thr <- Seq(0L, 600000L, 900000L)) {
      val got = Similarity.blockedLinkage(df, "id", "name",
        n => element_at(split(n, " "), -1), simQMin = thr)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // reference: same block join + full JW, NO prune
      val ref = df.as[(Long, String)].collect().toSeq
      val blocks = ref.groupBy(_._2.split(" ").last)
      val expect = blocks.values.flatMap { g =>
        for {
          (ia, na) <- g; (ib, nb) <- g if ia < ib
          sq = math.floor(1000000.0 * jw(na, nb)).toLong if sq >= thr
        } yield (ia, ib, sq)
      }.toSet
      assert(got === expect, s"thr=$thr")
    }
  }

  test("blockedLinkage: blocks bound candidates, threshold filters, id_a < id_b") {
    val df = Seq((1L, "red bolt"), (2L, "rod bolt"), (3L, "red gear"),
      (4L, "blue bolt")).toDF("id", "name")
    val out = Similarity.blockedLinkage(df, "id", "name",
      n => element_at(split(n, " "), -1), simQMin = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // only same-noun blocks pair; (3) is alone in "gear"
    assert(out === Set((1L, 2L), (1L, 4L), (2L, 4L)))
    val strict = Similarity.blockedLinkage(df, "id", "name",
      n => element_at(split(n, " "), -1), simQMin = 900000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // red/rod bolt are one substitution apart (high JW); blue vs red is low
    assert(strict === Set((1L, 2L)))
  }
}
