package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.model.Messages
import graft.streaming.Ingest

/** Real Structured Streaming path: file-source readStream → TSV parse →
  * foreachBatch keyed merge → state + CDC log, driven synchronously via
  * processAllAvailable (the micro-batch shape of the Kafka pipeline).
  */
class StreamingSpec extends SparkSpec {

  test("streaming ingest merges batches and emits CDC") {
    val in  = Files.createTempDirectory("graft_stream_in").toString
    val out = Files.createTempDirectory("graft_stream_out").toString
    val state = s"$out/state"; val log = s"$out/log"

    def line(hash: String, attr: String, ts: String, wd: Boolean) =
      s"$hash\tp1\t$attr\t1\t65001\t10.0.0.0\t8\t$ts\t$wd\t0\t\t1\t1"

    Files.writeString(java.nio.file.Paths.get(s"$in/b1.tsv"),
      line("h1", "a1", "2024-01-01 00:00:01.000000", wd = false) + "\n" +
        line("h2", "a9", "2024-01-01 00:00:01.500000", wd = false))

    val parsed = Messages.unicastPrefixFromTsv(
      spark.readStream.text(in).withColumnRenamed("value", "line"))
    val q = Ingest.start(parsed, state, log, Ingest.ipRibPolicy, triggerMs = 50)
    q.processAllAvailable()

    // second file lands while the stream runs → new micro-batch
    Files.writeString(java.nio.file.Paths.get(s"$in/b2.tsv"),
      line("h1", "", "2024-01-01 00:00:02.000000", wd = true))
    q.processAllAvailable()
    q.stop()

    val st = Ingest.readState(spark, state).get
    assert(st.count() === 2)
    val h1 = st.filter(col("hash_id") === "h1").head()
    assert(h1.getAs[Boolean]("isWithdrawn") === true)
    assert(h1.getAs[String]("base_attr_hash_id") === "a1") // retained on withdraw
    assert(spark.read.parquet(log).count() === 3)          // 2 advertises + 1 withdraw

    // compaction rewrites the per-batch dirs into hour-partitioned files
    Ingest.compactLog(spark, log, s"$out/log_compact")
    val compact = spark.read.parquet(s"$out/log_compact")
    assert(compact.count() === 3)
    assert(compact.columns.contains("date_hour"))
  }
}
