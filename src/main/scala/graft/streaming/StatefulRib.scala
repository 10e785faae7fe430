package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful-streaming RIB maintenance — the `flatMapGroupsWithState`
  * realization of the keyed upsert (SURVEY §1.1 row 1): one state entry
  * per (peer_hash_id, hash_id), retain-on-withdraw applied per record,
  * CDC change rows emitted as the stream output (`9_triggers.sql:89-126`
  * semantics), state TTL available via processing-time timeout (the
  * 20-min attr-cache pattern, `ConsumerRunnable.java:769-783`).
  *
  * This is the alternative to the `foreachBatch` merge in [[Ingest]]:
  * use this when downstream wants a *change stream*; use the batch
  * merge when downstream wants *snapshots*. Both share the same
  * per-record semantics (asserted equal in StatefulRibSpec).
  *
  * Scale: state is hash-partitioned by the group key across executors
  * (RocksDB state store in production); each micro-batch shuffles only
  * the incoming records.
  */
object StatefulRib {

  /** Production state-store configuration for the <100 ms change-stream
    * path: the RocksDB provider keeps per-executor state in off-heap
    * block cache + local SSTs instead of JVM objects — heap stays
    * bounded at production key cardinality (~10⁸ live RIB entries where
    * the default HDFSBackedStateStoreProvider would hold every versioned
    * map entry on heap) — and changelog checkpointing ships per-batch
    * deltas to the checkpoint location instead of full snapshot uploads.
    * Session-scoped runtime confs: apply BEFORE the query starts
    * ([[withRocksDbStateStore]]); queries already running keep their
    * provider.
    */
  val rocksDbConf: Map[String, String] = Map(
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true")

  /** Apply [[rocksDbConf]] to the session (idempotent). */
  def withRocksDbStateStore(spark: SparkSession): SparkSession = {
    rocksDbConf.foreach { case (k, v) => spark.conf.set(k, v) }
    spark
  }

  /** Minimal typed RIB record (the M1 columns that participate in the
    * merge semantics; bookkeeping columns ride along untouched).
    */
  case class RibUpdate(
      peer_hash_id: String,
      hash_id: String,
      base_attr_hash_id: String,
      origin_as: Long,
      ts_us: Long,
      isWithdrawn: Boolean)

  case class RibState(
      peer_hash_id: String,
      hash_id: String,
      base_attr_hash_id: String,
      origin_as: Long,
      ts_us: Long,
      isWithdrawn: Boolean)

  /** CDC row: same shape as the reference's ip_rib_log — on withdraw it
    * carries the OLD attribute columns.
    */
  case class RibChange(
      peer_hash_id: String,
      hash_id: String,
      base_attr_hash_id: String,
      origin_as: Long,
      ts_us: Long,
      isWithdrawn: Boolean)

  /** Apply one update to the current state (retain-on-withdraw,
    * `UnicastPrefixQuery.java:36-37`) and decide whether it's a loggable
    * change (`9_triggers.sql:124-125`).
    */
  def step(cur: Option[RibState], u: RibUpdate): (RibState, Option[RibChange]) = {
    val next = cur match {
      case Some(st) if u.isWithdrawn =>
        st.copy(ts_us = u.ts_us, isWithdrawn = true) // attrs retained
      case _ =>
        RibState(u.peer_hash_id, u.hash_id, u.base_attr_hash_id, u.origin_as,
          u.ts_us, u.isWithdrawn)
    }
    val attrChanged = cur.exists(st =>
      st.base_attr_hash_id != u.base_attr_hash_id || st.origin_as != u.origin_as)
    val isChange = cur match {
      case None     => true // first sighting always logs
      case Some(st) => (st.isWithdrawn != u.isWithdrawn) || (!u.isWithdrawn && attrChanged)
    }
    val change =
      if (!isChange) None
      else if (u.isWithdrawn && cur.isDefined) {
        val st = cur.get // withdraw logs OLD attr values (9_triggers.sql:92-99)
        Some(RibChange(u.peer_hash_id, u.hash_id, st.base_attr_hash_id, st.origin_as,
          u.ts_us, isWithdrawn = true))
      } else
        Some(RibChange(u.peer_hash_id, u.hash_id, u.base_attr_hash_id, u.origin_as,
          u.ts_us, u.isWithdrawn))
    (next, change)
  }

  /** The streaming operator: updates keyed by (peer, hash) → CDC stream.
    * Records within a group are applied in ts order within each batch
    * (cross-batch order comes from the source's per-key ordering, like
    * the reference's sticky writer assignment).
    */
  def changeStream(updates: Dataset[RibUpdate], ttl: Option[java.time.Duration] = None)
      : Dataset[RibChange] = {
    import updates.sparkSession.implicits._
    updates
      .groupByKey(u => (u.peer_hash_id, u.hash_id))
      .flatMapGroupsWithState[RibState, RibChange](
        OutputMode.Append,
        if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout) { case (_, it, state: GroupState[RibState]) =>
        if (state.hasTimedOut) {
          state.remove()
          Iterator.empty
        } else {
          var cur = state.getOption
          // TOTAL order: a (ts, flag)-only sort leaves equal-timestamp
          // advertises in shuffle-arrival order — nondeterministic state
          // and CDC across reruns. Adding the attribute columns makes
          // ties deterministic and matches the batch path's
          // ipRibPolicy orderBy (withdraws after advertises at equal ts)
          val out = it.toSeq
            .sortBy(u => (u.ts_us, u.isWithdrawn, u.base_attr_hash_id, u.origin_as))
            .flatMap { u =>
              val (next, change) = step(cur, u)
              cur = Some(next)
              change
            }
          cur.foreach { st =>
            state.update(st)
            ttl.foreach(d => state.setTimeoutDuration(d.toMillis))
          }
          out.iterator
        }
      }
  }
}
