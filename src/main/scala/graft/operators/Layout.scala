package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout operators: Z-order (Morton) keys and
  * the range-partitioned writer that turns them into file-level skip
  * indexes. The lakehouse answer to "queries filter on BOTH user and
  * day, but files can only be sorted one way": interleaving the key
  * bits makes a single sort order serve every dimension at once —
  * each file covers a small hyper-rectangle, so parquet min/max
  * pruning works for predicates on any participating column.
  */
object Layout {

  /** Morton (Z-order) key: bit-interleave the low `bits` bits of each
    * column — bit i of column c lands at position i·d + c (d = number
    * of columns). Inputs must be non-negative after any caller-side
    * normalization (bucket, modulo, rank); values ≥ 2^bits simply
    * truncate to their low bits, so callers should pre-bucket into
    * [0, 2^bits).
    *
    * Pure integer bit arithmetic composed from codegen'd primitives
    * (shift/and/or) — stays inside WholeStageCodegen, reproducible on
    * any engine with 64-bit integers. `bits·d` ≤ 62 keeps the key in
    * a positive BIGINT.
    */
  def zOrderKey(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "zOrderKey needs at least one column")
    require(bits >= 1 && bits * cols.size <= 62,
      s"bits ($bits) x dims (${cols.size}) must be in [1, 62]")
    val d = cols.size
    val terms = for {
      (c, ci) <- cols.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)),
      i * d + ci)
    terms.reduce(_ bitwiseOR _)
  }

  /** 2-D Hilbert-curve key — native codegen'd
    * ([[graft.plans.HilbertIndex]]): the locality-tighter layout key
    * (no diagonal jumps, so every file of a range-partitioned write
    * covers one contiguous curve segment). Same caller contract as
    * [[zOrderKey]]: pre-bucket both columns into [0, 2^bits).
    */
  def hilbertKey(x: Column, y: Column, bits: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.plans.HilbertIndex(
        org.apache.spark.sql.GraftColumnBridge.expression(x.cast("long")),
        org.apache.spark.sql.GraftColumnBridge.expression(y.cast("long")),
        bits))

  /** Range-partition by an existing Z-order key column and sort within
    * partitions — after `.write.parquet`, each output file covers a
    * disjoint zkey range (range partitioning guarantees it), i.e. a
    * bounded hyper-rectangle per file in the original dimensions.
    * `numFiles` chooses the pruning granularity: more files = tighter
    * rectangles = better skipping, at small-file cost (pick so files
    * land near the row-group size).
    */
  def zOrdered(df: DataFrame, zkeyCol: String, numFiles: Int): DataFrame = {
    require(numFiles > 0, s"numFiles ($numFiles) must be positive")
    df.repartitionByRange(numFiles, col(zkeyCol))
      .sortWithinPartitions(col(zkeyCol))
  }
}
