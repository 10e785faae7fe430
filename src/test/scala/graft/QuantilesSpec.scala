package graft

import org.apache.spark.sql.functions._

import graft.operators.Quantiles

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  private val Qs = Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100))

  test("exactQuantiles: hand-computed ranks on 1..10") {
    val df = (1L to 10L).map(v => ("g", v)).toDF("src", "v")
    val r = Quantiles.exactQuantiles(df, "src", "v", bucketWidth = 3L, Qs)
      .collect().map(x => x.getAs[String]("q") -> x.getAs[Long]("value")).toMap
    // ceil(10/2)=5, ceil(90/10)=9, ceil(990/100)=10
    assert(r === Map("p50" -> 5L, "p90" -> 9L, "p99" -> 10L))
  }

  test("exactQuantiles: rational rank arithmetic avoids the 0.9*N float trap") {
    // 0.9 * 450 = 405.00000000000006 in binary64 → ceil would give 406;
    // the exact (9*450+9) div 10 = 405
    val df = (1L to 450L).map(v => ("g", v)).toDF("src", "v")
    val r = Quantiles.exactQuantiles(df, "src", "v", 64L, Seq(("p90", 9, 10)))
      .collect()
    assert(r.length === 1 && r.head.getAs[Long]("value") === 405L)
  }

  test("exactQuantiles: per-group independence and duplicate values") {
    val df = (Seq.fill(30)(("a", 7L)) ++ (1L to 100L).map(v => ("b", v)))
      .toDF("src", "v")
    val r = Quantiles.exactQuantiles(df, "src", "v", 10L, Qs)
      .collect().map(x => (x.getAs[String]("src"), x.getAs[String]("q")) ->
        x.getAs[Long]("value")).toMap
    assert(r(("a", "p50")) === 7L && r(("a", "p99")) === 7L)
    assert(r(("b", "p50")) === 50L && r(("b", "p90")) === 90L &&
      r(("b", "p99")) === 99L)
  }

  test("exactQuantiles: partition-order free; guards reject bad specs") {
    val df = (1L to 500L).map(v => (s"s${v % 3}", v % 97)).toDF("src", "v")
    val one = Quantiles.exactQuantiles(df.coalesce(1), "src", "v", 8L, Qs)
      .orderBy("src", "q").collect().toSeq
    val many = Quantiles.exactQuantiles(df.repartition(13), "src", "v", 8L, Qs)
      .orderBy("src", "q").collect().toSeq
    assert(one === many)
    intercept[IllegalArgumentException] {
      Quantiles.exactQuantiles(df, "src", "v", 0L, Qs)
    }
    intercept[IllegalArgumentException] {
      Quantiles.exactQuantiles(df, "src", "v", 8L, Seq(("bad", 3, 2)))
    }
  }

  test("winsorize: clips to the exact rational band per group") {
    // group g: values 1..10 → p20 rank ceil(2)=2 → lo=2;
    // p80 rank ceil(8)=8 → hi=8
    val df = (1L to 10L).map(v => ("g", v)).toDF("grp", "v")
    val r = Quantiles.winsorize(df, "grp", "v", bucketWidth = 4L,
      lo = (1, 5), hi = (4, 5))
      .select("v", "lo", "hi", "v_clipped")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(r.forall(t => t._2 === 2L && t._3 === 8L))
    assert(r.map(_._4).toSeq ===
      Seq(2L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 8L, 8L))
    // a second group is clipped independently
    val df2 = df.union(Seq(("h", 100L), ("h", 200L), ("h", 300L))
      .toDF("grp", "v"))
    val r2 = Quantiles.winsorize(df2, "grp", "v", 4L, (1, 5), (4, 5))
      .filter($"grp" === "h").select("v_clipped")
      .as[Long].collect().sorted
    assert(r2.head >= 100L && r2.last <= 300L)
  }

  test("exactRanks: dense-id tie order, partition-order free") {
    // g: values 5, 5, 3, 9 with ids 1..4 → order (3,id3) (5,id1) (5,id2) (9,id4)
    val df = Seq((1L, "g", 5L), (2L, "g", 5L), (3L, "g", 3L),
      (4L, "g", 9L), (5L, "h", 1L)).toDF("id", "grp", "v")
    val r = Quantiles.exactRanks(df, "grp", "v", bucketWidth = 4L,
      tieCols = Seq("id"))
      .select("id", "rank", "grp_n").as[(Long, Long, Long)]
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r === Map(1L -> ((2L, 4L)), 2L -> ((3L, 4L)), 3L -> ((1L, 4L)),
      4L -> ((4L, 4L)), 5L -> ((1L, 1L))))
    // rank assignment is independent of physical partitioning
    val a = Quantiles.exactRanks(df.coalesce(1), "grp", "v", 4L, Seq("id"))
      .select("id", "rank").as[(Long, Long)].collect().toMap
    val b = Quantiles.exactRanks(df.repartition(7), "grp", "v", 4L, Seq("id"))
      .select("id", "rank").as[(Long, Long)].collect().toMap
    assert(a === b)
  }
}
