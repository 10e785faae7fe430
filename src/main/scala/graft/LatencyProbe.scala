package graft

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StatefulRib
import graft.streaming.StatefulRib.{RibChange, RibUpdate}

/** Measures end-to-end message→CDC-row latency of the
  * [[StatefulRib.changeStream]] path on the production state-store
  * config (RocksDB provider + changelog checkpointing) — the number
  * behind the reference's "<100 ms steady-state" operational claim
  * (obmp-psql README.md:91-92), measured rather than architecture-argued.
  *
  * Method: a feeder thread enqueues `msgsPerTick` updates every `tickMs`
  * into a MemoryStream, stamping each record's `ts_us` with the enqueue
  * monotonic clock (µs). `ts_us` is the record timestamp the operator
  * orders by, so monotonic enqueue stamps are semantically valid. The
  * foreachBatch sink collects each micro-batch's CDC rows and records
  * `now_µs − ts_us` per row — i.e. enqueue → CDC-row-materialized, the
  * full path through shuffle, RocksDB get/put, and changelog commit.
  * Batches inside the warmup window are discarded (codegen + RocksDB
  * block-cache fill); p50/p95/p99 come from the steady-state rows.
  *
  * Workload shape mirrors a live RIB feed: a rotating key space with
  * ~12% withdraws, so state entries are created, updated, flipped and
  * re-advertised rather than append-only.
  *
  * Prints one JSON line: {"metric":"rib_change_stream_latency_ms",...}.
  * Tunables via env: SPARK_GRAFT_LAT_{SECONDS,WARMUP,TICK_MS,MSGS,KEYS}.
  */
object LatencyProbe {
  def main(args: Array[String]): Unit = {
    val runSecs    = sys.env.getOrElse("SPARK_GRAFT_LAT_SECONDS", "30").toInt
    val warmupSecs = sys.env.getOrElse("SPARK_GRAFT_LAT_WARMUP", "10").toInt
    val tickMs     = sys.env.getOrElse("SPARK_GRAFT_LAT_TICK_MS", "100").toLong
    // default 280/100ms = 2,800 msg/s — the reference's sustained-ingest
    // operational number, i.e. the rate its <100 ms claim is made at
    val msgsPerTick = sys.env.getOrElse("SPARK_GRAFT_LAT_MSGS", "280").toInt
    val keySpace   = sys.env.getOrElse("SPARK_GRAFT_LAT_KEYS", "100000").toInt
    val partitions = sys.env.getOrElse("SPARK_GRAFT_LAT_PARTITIONS", "4").toInt

    val spark = StatefulRib.withRocksDbStateStore(
      SparkSession.builder()
        .master("local[8]")
        // latency regime: few partitions — per-batch cost here is task
        // scheduling + per-store commit, not data volume, so every extra
        // partition is pure overhead (the throughput regime is Bench's
        // 32; production sizes partitions to state volume, not latency)
        .config("spark.sql.shuffle.partitions", partitions)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val in = MemoryStream[RibUpdate]
    val lat = new ConcurrentLinkedQueue[Long]() // µs, steady-state only
    val batchDur = new ConcurrentLinkedQueue[Long]() // µs per micro-batch
    @volatile var measuring = false

    // tmpfs checkpoint when available: the per-batch offset/commit WAL
    // and RocksDB changelog are the floor of micro-batch latency; a
    // production deployment gives the checkpoint a fast local/object
    // store path the same way
    val ckptBase = new java.io.File("/dev/shm")
    val ckpt =
      (if (ckptBase.isDirectory && ckptBase.canWrite)
        Files.createTempDirectory(ckptBase.toPath, "graft_lat_ckpt")
      else Files.createTempDirectory("graft_lat_ckpt")).toString
    // NOTE: asyncProgressTrackingEnabled (which would remove the
    // synchronous per-batch offset/commit WAL write from the trigger
    // loop) rejects ALL stateful queries in Spark 4.1
    // ("Stateful streaming queries does not support async progress
    // tracking at this moment") — verified here; the WAL writes are
    // part of the measured floor.
    val q = StatefulRib.changeStream(in.toDS())
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(0L)) // re-trigger immediately
      .foreachBatch { (df: Dataset[RibChange], _: Long) =>
        val t0 = System.nanoTime
        val stamps = df.select("ts_us").as[Long].collect()
        val now = System.nanoTime / 1000L
        if (measuring) {
          stamps.foreach(t => lat.add(now - t))
          batchDur.add((System.nanoTime - t0) / 1000L)
        }
        ()
      }
      .start()

    val rnd = new scala.util.Random(42)
    var sent = 0L
    val tFeedStart = System.nanoTime
    val deadline = tFeedStart + (warmupSecs + runSecs) * 1_000_000_000L
    val measureFrom = tFeedStart + warmupSecs.toLong * 1_000_000_000L
    while (System.nanoTime < deadline) {
      val tickStart = System.nanoTime
      if (!measuring && tickStart >= measureFrom) measuring = true
      val nowUs = System.nanoTime / 1000L
      val batch = (0 until msgsPerTick).map { _ =>
        val k = rnd.nextInt(keySpace)
        val withdrawn = rnd.nextInt(100) < 12
        RibUpdate(
          peer_hash_id = s"p${k % 64}",
          hash_id = s"h$k",
          base_attr_hash_id = if (withdrawn) "" else s"a${rnd.nextInt(1000)}",
          origin_as = 64500L + (k % 1000),
          ts_us = nowUs,
          isWithdrawn = withdrawn)
      }
      in.addData(batch)
      sent += batch.size
      val elapsedMs = (System.nanoTime - tickStart) / 1_000_000L
      if (elapsedMs < tickMs) Thread.sleep(tickMs - elapsedMs)
    }
    // drain: let in-flight data finish before reading results
    q.processAllAvailable()
    q.stop()

    val ls = lat.toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted
    val bs = batchDur.toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted
    def pct(a: Array[Long], p: Double): Double =
      if (a.isEmpty) Double.NaN
      else a(math.min(a.length - 1, (p * a.length).toInt)) / 1000.0 // ms
    val msgRate = sent.toDouble / (warmupSecs + runSecs)
    val line =
      f"""{"metric":"rib_change_stream_latency_ms","p50":${pct(ls, 0.50)}%.1f,"p95":${pct(ls, 0.95)}%.1f,"p99":${pct(ls, 0.99)}%.1f,"max":${if (ls.isEmpty) Double.NaN else ls.last / 1000.0}%.1f,"n_rows":${ls.length},"batch_p50_ms":${pct(bs, 0.50)}%.1f,"batch_p95_ms":${pct(bs, 0.95)}%.1f,"n_batches":${bs.length},"msgs_per_sec":$msgRate%.0f,"key_space":$keySpace,"state_store":"rocksdb","shuffle_partitions":$partitions}"""
    println(line)
    spark.stop()
  }
}
