package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed state-table layout — the storage side of the 100 TB merge
  * design.
  *
  * The reference leans on btree PKs for its upserts; the columnar
  * equivalent is hash-bucketing the snapshot by the merge key so that
  * (a) the nightly/continuous merge joins state⋈updates shuffle ONLY
  * the update side — the big snapshot is read pre-partitioned — and
  * (b) repeated merges reuse the same layout. Spark bucketing
  * (`bucketBy` + `saveAsTable`) records the hash partitioning in the
  * catalog; Catalyst then elides the Exchange on the bucketed side(s)
  * of joins/aggregations over the bucket keys.
  */
object StateTables {

  /** Write `df` as a bucketed catalog table (overwrite). */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    numBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*) // managed table under spark.sql.warehouse.dir
      .format("parquet")
      .saveAsTable(table)

  /** Merge updates into a bucketed state table in place: because the
    * state side is bucketed on the keys, the full-outer merge join reads
    * it without an Exchange; only `updates` shuffles. The result is
    * written back bucketed for the next merge.
    */
  def mergeIntoBucketed(spark: SparkSession, table: String, updates: DataFrame,
                        policy: MergeOps.MergePolicy, numBuckets: Int): Unit = {
    val current = spark.table(table)
    val latest  = MergeOps.dedupToLatest(updates, policy.keys, policy.orderBy)
    val next    = MergeOps.upsert(current, latest, policy)
    val tmp     = table + "_next"
    writeBucketed(next, tmp, policy.keys, numBuckets)
    // swap via rename-aside: catalog renames are not atomic as a pair,
    // so between the two RENAMEs the well-known name briefly does not
    // exist and a reader (or a crash) in that window sees a missing
    // table. State is always recoverable — the full pre-merge snapshot
    // survives as `<table>_old` and the merged one as `<table>_next`;
    // recovery = rename whichever exists back to `table`.
    val old = table + "_old"
    spark.sql(s"DROP TABLE IF EXISTS $old")
    spark.sql(s"ALTER TABLE $table RENAME TO $old")
    spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
    spark.sql(s"DROP TABLE IF EXISTS $old")
  }
}
