package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each left row at time t, attach the
  * latest right row with the same key at time ≤ t (optionally within a
  * tolerance window). The reference has no as-of join (history reads are
  * log scans — SURVEY §2.4), but a training-data pipeline needs one for
  * point-in-time-correct feature attachment.
  *
  * Strategy: composed from built-ins (preference (a) of §7.3) as the
  * union-and-scan form — tag both sides, sort per key by (time, side),
  * and carry the last right payload forward with an ignoreNulls window.
  * One shuffle + one sort per key, NO left×right range explosion: cost
  * is O((|L|+|R|) log) per key regardless of time-range density, and
  * the shuffle key is the join key so skew tooling ([[Skew]]) applies.
  */
object AsOfJoin {

  /** @param keys       equi-join key columns (same names both sides)
    * @param leftTime   event-time column on `left` (numeric/orderable)
    * @param rightTime  event-time column on `right`
    * @param payload    right columns to attach (null when no right row
    *                   at or before the left row's time)
    * @param tolerance  max allowed (leftTime - rightTime), None = any age
    * @param strict     true → right row must be strictly BEFORE leftTime
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String, payload: Seq[String],
           tolerance: Option[Long] = None, strict: Boolean = false): DataFrame = {
    val keyCols = keys.map(col)
    // side tag orders rights before lefts at equal times (non-strict
    // as-of: a right row AT t is visible to a left row at t); strict
    // mode flips the order so equal-time rights sort after lefts
    val (leftTag, rightTag) = if (strict) (0, 1) else (1, 0)

    val rStructCols = col(rightTime).as("__rt") +: payload.map(col)
    val rStructType = right.select(struct(rStructCols: _*).as("s")).schema("s").dataType
    val lStructType = left.select(struct(left.columns.map(col).toIndexedSeq: _*).as("s"))
      .schema("s").dataType

    val l = left.select(keyCols ++ Seq(
      col(leftTime).as("__t"), lit(leftTag).as("__side"),
      struct(left.columns.map(col).toIndexedSeq: _*).as("__lrow"),
      lit(null).cast(rStructType).as("__rrow")): _*)
    // equi-join null semantics: a right row with a null key matches
    // nothing in SQL, but Window.partitionBy groups the null partition
    // together — drop null-key rights so null-key LEFTS flow through
    // with a null payload (left-join parity) instead of pairing up
    val r = right
      .filter(keys.map(col(_).isNotNull).reduceOption(_ && _).getOrElse(lit(true)))
      .select(keyCols ++ Seq(
        col(rightTime).as("__t"), lit(rightTag).as("__side"),
        lit(null).cast(lStructType).as("__lrow"),
        struct(rStructCols: _*).as("__rrow")): _*)

    // __rrow as the final sort key makes equal-time right rows pick a
    // DETERMINISTIC winner (greatest payload struct) — last() over a
    // partial order would return whichever row the shuffle happened to
    // place later
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__rrow").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("__last_r", last(col("__rrow"), ignoreNulls = true).over(w))
      .filter(col("__side") === leftTag && col("__lrow").isNotNull)
    val withTol: Column = tolerance match {
      case Some(tol) => when(col("__last_r").isNotNull &&
        (col("__t") - col("__last_r.__rt")) <= tol, col("__last_r"))
      case None => col("__last_r")
    }
    val leftCols = left.columns.filterNot(keys.contains)
    carried
      .withColumn("__r", withTol)
      .select(keyCols ++
        leftCols.map(c => col(s"__lrow.$c").as(c)) ++
        payload.map(p => col(s"__r.$p").as(p)): _*)
  }
}
