package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed, engine-exact evaluation metrics — the audit side of
  * the model-based curation loop (q85's classifier, quality-score
  * filters): a ranking metric computed from exact integer aggregates,
  * reproducible bit-for-bit on any engine.
  */
object Eval {

  /** Exact tie-adjusted ROC AUC of an integer score against a binary
    * label — the Mann–Whitney U form computed WITHOUT sorting
    * individual rows: aggregate to one row per distinct score (the
    * score-bounded table), then
    *
    *   AUC = Σ_s p_s·(2·negBelow(s) + n_s) / (2·P·N)
    *
    * where p_s/n_s are positive/negative counts at score s and
    * negBelow its cumulative negatives — ties contribute the standard
    * 1/2. Everything up to the final division is exact long
    * arithmetic, so ⌊10⁶·AUC⌋ is engine-identical. Null scores are
    * excluded (they rank nowhere).
    *
    * Plan shape: one hash aggregate to |distinct scores| rows, one
    * window over that bounded table (scores are quantized — bounded by
    * the quantization grid, not the corpus), one scalar aggregate.
    */
  def aucExact(df: DataFrame, scoreCol: String, labelCol: Column): DataFrame = {
    val perScore = df
      .filter(col(scoreCol).isNotNull)
      .select(col(scoreCol).cast("long").as("s"),
        when(labelCol, 1L).otherwise(0L).as("y"))
      .groupBy(col("s"))
      .agg(sum(col("y")).as("p_s"),
        sum(lit(1L) - col("y")).as("n_s"))
    val w = Window.orderBy(col("s").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    perScore
      .withColumn("__nb", coalesce(sum(col("n_s")).over(w), lit(0L)))
      .agg(sum(col("p_s")).as("p"), sum(col("n_s")).as("n"),
        sum(col("p_s") * (lit(2L) * col("__nb") + col("n_s")))
          .as("__num2"))
      .select(col("p"), col("n"),
        when(col("p") > 0 && col("n") > 0,
          floor(lit(1000000.0) * col("__num2").cast("double") /
            (lit(2.0) * col("p").cast("double") * col("n").cast("double")))
            .cast("long")).as("auc_q"))
  }
}
