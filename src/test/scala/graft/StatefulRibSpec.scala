package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StatefulRib
import graft.streaming.StatefulRib.{RibChange, RibUpdate}

/** flatMapGroupsWithState RIB: CDC parity with the reference trigger
  * semantics across micro-batches (advertise → dup advertise → attr
  * change → withdraw → re-advertise).
  */
class StatefulRibSpec extends SparkSpec {
  import spark.implicits._

  test("step: retain-on-withdraw + CDC predicate per record") {
    val s0 = StatefulRib.step(None,
      RibUpdate("p1", "h1", "a1", 65001L, 1L, isWithdrawn = false))
    assert(s0._2.isDefined) // first advertise logs
    val st1 = s0._1
    // duplicate advertise, same attr → NO log (trigger WHEN clause)
    val s1 = StatefulRib.step(Some(st1),
      RibUpdate("p1", "h1", "a1", 65001L, 2L, isWithdrawn = false))
    assert(s1._2.isEmpty && s1._1.ts_us === 2L)
    // withdraw → logs OLD attr, state retains attr
    val s2 = StatefulRib.step(Some(s1._1),
      RibUpdate("p1", "h1", "", 0L, 3L, isWithdrawn = true))
    assert(s2._2.get.base_attr_hash_id === "a1" && s2._2.get.isWithdrawn)
    assert(s2._1.base_attr_hash_id === "a1" && s2._1.isWithdrawn)
    // repeated withdraw → no log (flag didn't flip)
    val s3 = StatefulRib.step(Some(s2._1),
      RibUpdate("p1", "h1", "", 0L, 4L, isWithdrawn = true))
    assert(s3._2.isEmpty)
  }

  test("streaming change stream across micro-batches") {
    val in  = Files.createTempDirectory("graft_srib_in").toString
    def write(name: String, rows: Seq[RibUpdate]): Unit =
      rows.toDS().write.parquet(s"$in/$name")

    write("b1", Seq(
      RibUpdate("p1", "h1", "a1", 65001L, 1L, isWithdrawn = false),
      RibUpdate("p1", "h2", "a2", 65002L, 1L, isWithdrawn = false)))

    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[RibUpdate]].schema)
      .option("recursiveFileLookup", "true")
      .parquet(in)
      .as[RibUpdate]
    val q = StatefulRib.changeStream(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("rib_changes")
      .trigger(Trigger.ProcessingTime(50))
      .start()
    q.processAllAvailable()

    write("b2", Seq(RibUpdate("p1", "h1", "", 0L, 2L, isWithdrawn = true)))
    q.processAllAvailable()
    q.stop()

    val changes = spark.table("rib_changes").as[RibChange].collect()
      .sortBy(c => (c.hash_id, c.ts_us)).toSeq
    assert(changes.map(c => (c.hash_id, c.base_attr_hash_id, c.isWithdrawn)) === Seq(
      ("h1", "a1", false),
      ("h1", "a1", true),   // withdraw carries OLD attr across batches
      ("h2", "a2", false)))
  }

  test("batch merge path emits the same CDC + state as the change stream") {
    // the scaladoc's "both paths share the same per-record semantics"
    // claim, made checkable: the exact batches of the streaming test,
    // driven through MergeOps.upsertWithLog, must yield the same CDC
    // triples and the same final state
    import graft.operators.MergeOps
    import org.apache.spark.sql.functions.col
    val policy = MergeOps.MergePolicy(
      keys = Seq("peer_hash_id", "hash_id"), withdrawnCol = "isWithdrawn",
      orderBy = Seq("ts_us", "isWithdrawn", "base_attr_hash_id"),
      retainOnWithdraw = Seq("base_attr_hash_id", "origin_as"),
      alwaysUpdate = Seq("ts_us"))
    val b1 = Seq(
      RibUpdate("p1", "h1", "a1", 65001L, 1L, isWithdrawn = false),
      RibUpdate("p1", "h2", "a2", 65002L, 1L, isWithdrawn = false)).toDS().toDF()
    val b2 = Seq(RibUpdate("p1", "h1", "", 0L, 2L, isWithdrawn = true)).toDS().toDF()
    val (st1, log1) = MergeOps.upsertWithLog(b1.limit(0), b1, policy)
    val (st2, log2) = MergeOps.upsertWithLog(st1, b2, policy)
    val cdc = log1.unionByName(log2)
      .select("hash_id", "base_attr_hash_id", "isWithdrawn").collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2))).toSortedSetLike
    // same triples the streaming test asserts from changeStream
    assert(cdc === Seq(("h1", "a1", false), ("h1", "a1", true), ("h2", "a2", false)))
    val h1 = st2.filter(col("hash_id") === "h1").head()
    assert(h1.getAs[Boolean]("isWithdrawn") === true)
    assert(h1.getAs[String]("base_attr_hash_id") === "a1") // retained, like step()
  }

  private implicit class SortedSeq(a: Array[(String, String, Boolean)]) {
    def toSortedSetLike: Seq[(String, String, Boolean)] = a.toSeq.sortBy(t => (t._1, t._3))
  }

  test("changeStream on the RocksDB state store provider (bounded heap)") {
    import scala.jdk.CollectionConverters._
    val in = Files.createTempDirectory("graft_srib_rdb").toString
    Seq(RibUpdate("p1", "h1", "a1", 65001L, 1L, isWithdrawn = false))
      .toDS().write.parquet(s"$in/b1")
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    StatefulRib.withRocksDbStateStore(spark)
    try {
      val stream = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[RibUpdate]].schema)
        .option("recursiveFileLookup", "true")
        .parquet(in)
        .as[RibUpdate]
      val q = StatefulRib.changeStream(stream)
        .writeStream.outputMode("append")
        .format("memory").queryName("rib_changes_rocks")
        .trigger(Trigger.ProcessingTime(50))
        .start()
      q.processAllAvailable()
      Seq(RibUpdate("p1", "h1", "", 0L, 2L, isWithdrawn = true))
        .toDS().write.parquet(s"$in/b2")
      q.processAllAvailable()
      // provider actually engaged: the state operator reports rocksdb
      // custom metrics (absent on the default HDFS-backed provider)
      val metricKeys = q.recentProgress.toSeq
        .flatMap(_.stateOperators.toSeq)
        .flatMap(_.customMetrics.keySet().asScala)
      q.stop()
      assert(metricKeys.exists(_.toLowerCase.contains("rocksdb")),
        s"no rocksdb state metrics in $metricKeys")
      val changes = spark.table("rib_changes_rocks").as[RibChange].collect()
        .sortBy(_.ts_us).toSeq
      assert(changes.map(c => (c.base_attr_hash_id, c.isWithdrawn)) ===
        Seq(("a1", false), ("a1", true))) // same CDC semantics as default provider
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None    => spark.conf.unset(providerKey)
      }
      spark.conf.unset("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled")
    }
  }
}
