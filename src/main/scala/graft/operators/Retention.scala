package graft.operators

import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.SparkSession

/** Physical retention: partition-DIRECTORY drops over the engine's
  * time-partitioned layouts.
  *
  * The reference's retention policies delete aged rows daily
  * (`/root/reference/database/1_base.sql:236,369` — e.g. 2 months of
  * `ip_rib_log`, 4 weeks of `peer_event_log`); TimescaleDB turns that
  * into chunk (partition) drops. The columnar equivalent is deleting
  * aged partition directories — an O(dropped dirs) metadata operation
  * that never opens a parquet file, vs the O(table) rewrite a filter
  * job would cost at 100 TB. [[TimeAgg.applyRetention]] remains the
  * logical (read-side) filter for the in-flight horizon inside the
  * newest surviving partition.
  *
  * Deletion is idempotent and crash-safe: a re-run after a partial
  * crash just re-deletes what remains aged; readers racing a drop see
  * standard FileNotFound-on-listing semantics, identical to a
  * TimescaleDB chunk drop.
  */
object Retention {

  /** Drop every `<key>=<value>` child directory of `path` whose value
    * fails `keep`. Returns the dropped directory names.
    */
  def dropAgedPartitions(spark: SparkSession, path: String, key: String)
                        (keep: String => Boolean): Seq[String] = {
    import org.apache.hadoop.fs.{Path => HPath}
    val root = new HPath(path)
    val fs   = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return Nil
    val prefix = key + "="
    fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
      .filterNot(st => keep(st.getPath.getName.stripPrefix(prefix)))
      .map { st =>
        if (!fs.delete(st.getPath, true))
          sys.error(s"retention: failed to drop ${st.getPath}")
        st.getPath.getName
      }.sorted // listStatus order is fs-dependent; report deterministically
  }

  private val HourFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd-HH")

  /** Retention over the `date_hour=yyyy-MM-dd-HH` layout
    * ([[graft.streaming.Ingest.compactLog]]): drop every hour directory
    * that lies ENTIRELY before the cutoff — a partition survives until
    * its last microsecond ages out, so no surviving row is ever lost
    * (the exact row-level boundary inside the oldest survivor is the
    * read-side filter's job). Unparseable directory values are kept:
    * deleting what we cannot date is never safe.
    */
  def dropAgedHours(spark: SparkSession, path: String, cutoffMicros: Long): Seq[String] =
    dropAgedPartitions(spark, path, "date_hour") { v =>
      try {
        val hourStartUs = LocalDateTime.parse(v, HourFmt)
          .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
        hourStartUs + 3600L * 1000000L > cutoffMicros
      } catch { case _: Exception => true }
    }

  /** Retention over the `batch=<id>` CDC-log layout
    * ([[StateTables.mergeChangedBuckets]] batchId partitions): drop
    * batches below `minBatchId` — used once a closed id range has been
    * compacted into the hourly layout, so idempotent replay (which only
    * ever re-runs RECENT batch ids) is unaffected.
    */
  def dropAgedBatches(spark: SparkSession, path: String, minBatchId: Long): Seq[String] =
    dropAgedPartitions(spark, path, "batch") { v =>
      try v.toLong >= minBatchId
      catch { case _: Exception => true }
    }
}
