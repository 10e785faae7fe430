package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Messages
import graft.operators.MergeOps
import graft.streaming.Ingest

/** Ingest-throughput benchmark against the reference's headline number:
  * "10M+ prefixes within an hour" ≈ ≥2,800 prefix-msgs/s sustained
  * (`/root/reference/README.md:90`, BASELINE.md row 1).
  *
  * Synthesizes N unicast_prefix TSV lines (the bus wire format),
  * then times the full write path: envelope parse + coercions →
  * last-write-wins dedup → keyed merge with retain-on-withdraw →
  * CDC log + snapshot parquet. Prints one JSON line with msgs/s.
  *
  * `runMain graft.IngestBench [nMsgs] [nBatches]`
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val n       = if (args.length > 0) args(0).toLong else 2000000L
    val batches = if (args.length > 1) args(1).toInt else 4
    val cpus    = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val out   = Files.createTempDirectory("graft_ingest_bench").toString
    val state = s"$out/state"; val log = s"$out/log"

    /** Deterministic synthetic unicast_prefix TSV lines: ~n/4 distinct
      * RIB keys across 64 peers, 10% withdraws, 20% same-key repeats in
      * batch (the writer-compression case).
      */
    def lines(batch: Int, rows: Long): DataFrame =
      spark.range(rows).select(concat_ws("\t",
        concat(lit("pfx"), (col("id") % (rows / 4 * 3)).cast("string")), // hash
        concat(lit("peer"), (col("id") % 64).cast("string")),            // peer hash
        concat(lit("attr"), (col("id") % 10000).cast("string")),         // base attr
        lit("1"),
        ((col("id") % 60000) + 1000).cast("string"),                     // origin asn
        format_string("10.%d.%d.0", col("id") % 200, (col("id") * 7) % 250),
        lit("24"),
        date_format(
          timestamp_micros(lit(1704067200000000L) + batch * 1000000L + col("id")),
          "yyyy-MM-dd HH:mm:ss.SSSSSS"),
        when(col("id") % 10 === 0, "true").otherwise("false"),           // withdrawn
        lit("0"), lit(""), lit("1"), lit("1")).as("line"))

    // warm the plans once on a tiny batch (codegen compile excluded, as
    // for a long-running ingest process)
    Ingest.replayUnicastPrefix(spark, lines(0, 10000), state, log)

    val t0 = System.nanoTime()
    for (b <- 1 to batches)
      Ingest.replayUnicastPrefix(spark, lines(b, n / batches), state, log)
    val secs = (System.nanoTime() - t0) / 1e9

    val ribRows = Ingest.readState(spark, state).get.count()
    val logRows = spark.read.parquet(log).count()
    println(s"""{"metric":"ingest_msgs_per_sec","value":${(n / secs).toLong},""" +
      s""""unit":"msgs/sec","msgs":$n,"batches":$batches,"secs":$secs,""" +
      s""""rib_rows":$ribRows,"log_rows":$logRows,""" +
      s""""reference_baseline":2800}""")

    // Changed-bucket write-volume probe: a key-localized 1k-msg update
    // merged into the full snapshot via the bucket-partitioned layout
    // must rewrite bytes ∝ touched buckets, not O(state) — the
    // columnar answer to the reference's row-level ON CONFLICT.
    import graft.operators.StateTables
    val bstate = s"$out/bstate"
    StateTables.writeBucketPartitioned(
      Ingest.readState(spark, state).get, bstate, Ingest.ipRibPolicy.keys, 256)
    val stateBytes =
      org.apache.commons.io.FileUtils.sizeOfDirectory(new java.io.File(bstate))
    // 1k msgs over 40 (hash, peer) key pairs — a localized burst
    val updLines = spark.range(1000).select(concat_ws("\t",
      concat(lit("pfx"), (col("id") % 20).cast("string")),
      concat(lit("peer"), (col("id") % 2).cast("string")),
      concat(lit("attr"), (col("id") % 100).cast("string")),
      lit("1"), ((col("id") % 60000) + 1000).cast("string"),
      format_string("10.%d.%d.0", col("id") % 200, (col("id") * 7) % 250),
      lit("24"),
      date_format(
        timestamp_micros(lit(1704067200000000L) + 999000000L + col("id")),
        "yyyy-MM-dd HH:mm:ss.SSSSSS"),
      lit("false"), lit("0"), lit(""), lit("1"), lit("1")).as("line"))
    val t1 = System.nanoTime()
    val touched = StateTables.mergeChangedBuckets(spark, bstate,
      Messages.unicastPrefixFromTsv(updLines), Ingest.ipRibPolicy, 256)
    val mergeSecs = (System.nanoTime() - t1) / 1e9
    val rewrittenBytes = touched.map(b => org.apache.commons.io.FileUtils
      .sizeOfDirectory(new java.io.File(s"$bstate/__bucket=$b"))).sum
    println(s"""{"metric":"changed_bucket_merge","update_msgs":1000,""" +
      s""""buckets_touched":${touched.size},"buckets_total":256,""" +
      s""""rewritten_bytes":$rewrittenBytes,"state_bytes":$stateBytes,""" +
      s""""write_fraction":${rewrittenBytes.toDouble / stateBytes},""" +
      s""""secs":$mergeSecs}""")
    spark.stop()
  }
}
