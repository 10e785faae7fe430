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
}
