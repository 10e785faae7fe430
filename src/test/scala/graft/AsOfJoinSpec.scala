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
