package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.LpmJoin

/** J5/J6: both LPM strategies agree with a brute-force scan (seeded
  * random property), and the covering join reproduces the RPKI
  * containment predicate of `2_aggregations.sql:260-265`.
  */
class LpmJoinSpec extends SparkSpec {
  import spark.implicits._

  private val bits = 10 // small space: plenty of overlap

  private def align(addr: Long, len: Int): Long = {
    val step = 1L << (bits - len)
    addr - addr % step
  }

  test("lpmRange == lpmByExpansion == brute force on random data") {
    val rnd = new Random(42)
    for (_ <- 1 to 5) {
      val pfx = (0 until 40).map { i =>
        val l = 1 + rnd.nextInt(bits)
        val a = rnd.nextLong().abs % (1L << bits)
        (i.toLong, l, align(a, l), align(a, l) + (1L << (bits - l)) - 1)
      }
      val rawProbes = (0 until 25).map(_ => rnd.nextLong().abs % (1L << bits))
      val prefixes = pfx.toDF("pid", "len", "pstart", "pend")
      val probes = rawProbes.zipWithIndex.map { case (a, i) => (i.toLong, a) }
        .toDF("probe_id", "addr")

      def resOf(df: org.apache.spark.sql.DataFrame) =
        df.select("probe_id", "len", "pstart", "pid").collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet

      val viaRange = resOf(LpmJoin.lpmRange(probes, Seq("probe_id"), "addr",
        prefixes, "pstart", "pend", "len", tieBreak = Seq(col("pid").asc)))
      val viaExp = resOf(LpmJoin.lpmByExpansion(probes, Seq("probe_id"), "addr",
        prefixes, "pstart", "len", bits, tieBreak = Seq(col("pid").asc)))
      val viaAgg = resOf(LpmJoin.lpmByExpansionAgg(probes, Seq("probe_id"), "addr",
        prefixes, "pstart", "len", bits, payload = Seq("pid"), tieBreakAsc = "pid"))

      val brute = rawProbes.zipWithIndex.flatMap { case (a, i) =>
        val matches = pfx.filter(p => a >= p._3 && a <= p._4)
        if (matches.isEmpty) None
        else {
          val best = matches.minBy(p => (-p._2, -p._3, p._1))
          Some((i.toLong, best._2, best._3, best._1))
        }
      }.toSet

      assert(viaRange === brute)
      assert(viaExp === brute)
      assert(viaAgg === brute)
    }
  }

  test("coveringJoin reproduces the RPKI predicate") {
    val roas = Seq((0L, 511L, 6)).toDF("rstart", "rend", "maxlen")
    val ribs = Seq(
      (1L, align(100, 4), align(100, 4) + (1L << 6) - 1, 4),  // inside, len ok
      (2L, align(100, 8), align(100, 8) + (1L << 2) - 1, 8),  // inside, len too long
      (3L, align(600, 5), align(600, 5) + (1L << 5) - 1, 5))  // outside
      .toDF("id", "rib_start", "rib_end", "len")
    val got = LpmJoin.coveringJoin(ribs, "rib_start", "rib_end", "len",
      roas, "rstart", "rend", "maxlen").select("id").as[Long].collect().toSet
    assert(got === Set(1L))
  }
}
