package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // left: observations; right: state changes
  val left = Seq(("u1", 10L, "obsA"), ("u1", 25L, "obsB"), ("u2", 5L, "obsC"),
    ("u1", 20L, "obsT"))
    .toDF("k", "t", "obs")
  val right = Seq(("u1", 8L, "s1"), ("u1", 20L, "s2"), ("u3", 1L, "sX"))
    .toDF("k", "rt", "state")

  private def run(tol: Option[Long] = None, strict: Boolean = false) =
    AsOfJoin.asOf(left, right, Seq("k"), "t", "rt", Seq("state"), tol, strict)
      .select("k", "t", "obs", "state")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(3))).toSet

  test("latest right at-or-before each left row; no match → null") {
    assert(run() === Set(
      ("u1", 10L, "s1"), // s1@8 ≤ 10
      ("u1", 20L, "s2"), // equal time visible (non-strict)
      ("u1", 25L, "s2"),
      ("u2", 5L, null))) // no right rows for u2
  }

  test("strict mode excludes equal-time right rows") {
    assert(run(strict = true).contains(("u1", 20L, "s1")))
  }

  test("tolerance nulls out stale matches") {
    assert(run(tol = Some(3L)) === Set(
      ("u1", 10L, "s1"),  // age 2 ≤ 3
      ("u1", 20L, "s2"),  // age 0
      ("u1", 25L, null),  // s2 is 5 old > 3
      ("u2", 5L, null)))
  }

  test("null join keys: left rows keep null payload, right rows never match (equi-join parity)") {
    val ls = Seq((null.asInstanceOf[String], 10L, "L1"), ("k1", 10L, "L2"))
      .toDF("k", "t", "obs")
    val rs = Seq((null.asInstanceOf[String], 5L, "NULLSTATE"), ("k1", 5L, "S1"))
      .toDF("k", "rt", "state")
    val got = AsOfJoin.asOf(ls, rs, Seq("k"), "t", "rt", Seq("state"))
      .select("obs", "state").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // SQL `l.k = r.k` never matches NULLs: the null-key left row must
    // appear WITH a null payload, not paired with the null-key right
    assert(got === Map("L1" -> null, "L2" -> "S1"))
  }

  test("equal-time right duplicates resolve deterministically (greatest payload)") {
    val ls = Seq(("k1", 10L, "o")).toDF("k", "t", "obs")
    val rs = Seq(("k1", 5L, "A"), ("k1", 5L, "B")).toDF("k", "rt", "state")
    val got = (1 to 5).map { _ =>
      AsOfJoin.asOf(ls, rs.repartition(4), Seq("k"), "t", "rt", Seq("state"))
        .select("state").head().getString(0)
    }.toSet
    assert(got === Set("B")) // greatest (rt, payload) struct, every run
  }

  test("brute-force parity on seeded random data") {
    val rnd = new scala.util.Random(11)
    val ls = (1 to 200).map(_ => (s"k${rnd.nextInt(5)}", rnd.nextInt(100).toLong, "o"))
    val rs = (1 to 100).map(_ => (s"k${rnd.nextInt(5)}", rnd.nextInt(100).toLong, s"v${rnd.nextInt(1000)}"))
    // dedupe right to one row per (k, rt): as-of with duplicate right
    // timestamps is ill-defined (the window picks the physical last)
    val rsd = rs.groupBy(t => (t._1, t._2)).map(_._2.head).toSeq
    val got = AsOfJoin.asOf(ls.toDF("k", "t", "obs"), rsd.toDF("k", "rt", "state"),
      Seq("k"), "t", "rt", Seq("state"))
      .select("k", "t", "state")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .groupBy(x => (x._1, x._2)).view.mapValues(_.map(_._3).toSet).toMap
    val brute = ls.map { case (k, t, _) =>
      val cand = rsd.filter(r0 => r0._1 == k && r0._2 <= t)
      (k, t) -> (if (cand.isEmpty) null else cand.maxBy(_._2)._3)
    }.groupBy(_._1).view.mapValues(_.map(x => x._2).toSet).toMap
    assert(got === brute)
  }
}
