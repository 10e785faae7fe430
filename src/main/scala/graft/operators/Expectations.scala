package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-contract validation — expectations as DATA, the
  * same design choice as [[MergeOps.MergePolicy]]: a pipeline ships a
  * rule list next to its tables, and every batch/partition is gated on
  * the violation report before promotion. One pass over the frame
  * computes every rule (a single multi-expression aggregate; only
  * uniqueness rules add distinct-count subaggregates), and the report
  * is built with expressions — no driver-side collect.
  */
object Expectations {

  sealed trait Rule { def ruleName: String; def column: String }
  /** Column must contain no nulls. */
  final case class NotNull(column: String) extends Rule {
    val ruleName = "not_null" }
  /** Non-null values must be distinct (null never collides). */
  final case class Unique(column: String) extends Rule {
    val ruleName = "unique" }
  /** Non-null values must lie in [lo, hi]. */
  final case class InRange(column: String, lo: Double, hi: Double)
      extends Rule { val ruleName = "in_range" }
  /** Non-null values must match the regex (RE2-safe subset advised —
    * the report should mean the same thing to every engine reading
    * the contract). */
  final case class Matches(column: String, regex: String) extends Rule {
    val ruleName = "matches" }
  /** Non-null values must be in the accepted set. */
  final case class OneOf(column: String, values: Seq[String]) extends Rule {
    val ruleName = "one_of" }

  /** Evaluate every rule in one aggregate pass.
    * @return (rule, column, n_violations, passed) — one row per rule,
    *         in rule order
    */
  def validate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "validate needs at least one rule")
    val aggCols: Seq[Column] = rules.zipWithIndex.map { case (r, i) =>
      (r match {
        case NotNull(c) =>
          sum(when(col(c).isNull, 1L).otherwise(0L))
        case Unique(c) =>
          count(col(c)) - countDistinct(col(c))
        case InRange(c, lo, hi) =>
          sum(when(col(c).isNotNull && (col(c) < lo || col(c) > hi), 1L)
            .otherwise(0L))
        case Matches(c, re) =>
          sum(when(col(c).isNotNull && !col(c).rlike(re), 1L)
            .otherwise(0L))
        case OneOf(c, vs) =>
          sum(when(col(c).isNotNull && !col(c).isin(vs: _*), 1L)
            .otherwise(0L))
      }).as(s"__v$i")
    }
    val one = df.agg(aggCols.head, aggCols.tail: _*)
    one.select(explode(array(rules.zipWithIndex.map { case (r, i) =>
        struct(lit(r.ruleName).as("rule"), lit(r.column).as("column"),
          coalesce(col(s"__v$i"), lit(0L)).as("n_violations"))
      }: _*)).as("e"))
      .select(col("e.rule"), col("e.column"), col("e.n_violations"))
      .withColumn("passed", col("n_violations") === 0L)
  }
}
