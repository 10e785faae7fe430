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
}
