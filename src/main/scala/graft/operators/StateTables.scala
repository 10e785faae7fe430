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

  // ---- changed-bucket-only merge --------------------------------------
  // The catalog-bucketed path above still REWRITES the whole snapshot
  // per merge — O(state) write amplification per batch, the reference's
  // `ON CONFLICT` touches only conflicting rows. The layout below gets
  // the columnar equivalent: the snapshot is directory-partitioned by a
  // hash bucket of the merge key, updates are hashed with the same
  // function, and a merge (a) reads ONLY the partitions holding updated
  // keys (partition pruning at the scan) and (b) swaps ONLY those
  // directories. Untouched bucket files are never opened or rewritten —
  // write volume is ∝ (touched buckets) ≈ update spread, not state size.

  /** The bucket partition function: pmod(hash(keys), numBuckets) —
    * identical on the state and update sides by construction.
    */
  def bucketId(keys: Seq[String], numBuckets: Int): org.apache.spark.sql.Column =
    pmod(hash(keys.map(col): _*), lit(numBuckets))

  /** Write a snapshot in the changed-bucket layout: one directory per
    * key-hash bucket (`__bucket=<i>/`). Size numBuckets so a bucket is
    * a few parquet files (e.g. 2^10-2^17 at 100 TB): more buckets →
    * finer merge granularity, fewer → larger scan units.
    */
  def writeBucketPartitioned(df: DataFrame, path: String, keys: Seq[String],
                             numBuckets: Int): Unit =
    df.withColumn("__bucket", bucketId(keys, numBuckets))
      .write.mode("overwrite").partitionBy("__bucket").parquet(path)

  /** Merge updates into a bucket-partitioned snapshot rewriting ONLY
    * the buckets that contain updated keys.
    *
    * The touched-bucket list is plan-time metadata (≤ numBuckets ints —
    * the one acceptable collect); the current-state scan carries an
    * `isin(touched)` partition filter so pruning happens at the
    * directory listing, and the merged result is staged to
    * `<path>_stage` then swapped in with per-bucket park-aside renames
    * (the staged write also sidesteps reading and overwriting the same
    * path in one plan). The swap is crash-safe per bucket: the old
    * directory is parked under `<path>_old` before the new one moves
    * in, every rename result is checked, and the recovery pre-pass of
    * the NEXT merge restores any bucket a crash left parked — combined
    * with the idempotent merge, a replayed batch converges with no row
    * loss. Cross-bucket atomicity (a reader seeing half-swapped state)
    * still needs a commit pointer like
    * [[graft.streaming.Ingest.mergeBatch]]'s versioned `_CURRENT`.
    *
    * With `logPath`, the CDC rows of the merge ([[MergeOps.upsertWithLog]])
    * are written before the swap — batchId-keyed partitions make a
    * replayed micro-batch overwrite its own log instead of appending
    * duplicates, and a crash between log write and swap re-runs the
    * idempotent merge from the old state.
    *
    * SINGLE WRITER REQUIRED: the staging (`<path>_stage`) and park
    * (`<path>_old`) directories are fixed siblings of the state path,
    * and the recovery pre-pass assumes anything found in them belongs to
    * a CRASHED run of this same merge — two concurrent merges on one
    * path would overwrite each other's stage and interleave park/move
    * renames, corrupting buckets. This matches the deployment shape:
    * [[graft.streaming.Ingest.startBucketed]] calls this from
    * `foreachBatch`, which Structured Streaming serializes per query
    * (one driver, one batch at a time). Running two streaming queries
    * (or a manual job beside one) against the same state path needs
    * external coordination — there is deliberately no lock file here,
    * because a crashed holder would wedge the pipeline where the
    * idempotent-replay design recovers unattended.
    *
    * @return the bucket ids rewritten (size = write amplification in
    *         units of buckets)
    */
  def mergeChangedBuckets(spark: SparkSession, path: String, updates: DataFrame,
                          policy: MergeOps.MergePolicy, numBuckets: Int,
                          logPath: Option[String] = None,
                          batchId: Option[Long] = None): Seq[Int] = {
    import org.apache.hadoop.fs.{Path => HPath}
    val conf = spark.sessionState.newHadoopConf()
    val fs   = new HPath(path).getFileSystem(conf)
    recoverSwap(fs, path) // restore any bucket parked by a crashed swap

    val latest = MergeOps.dedupToLatest(updates, policy.keys, policy.orderBy)
      .withColumn("__bucket", bucketId(policy.keys, numBuckets))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val touched = latest.select(col("__bucket")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    if (touched.isEmpty) { latest.unpersist(); return Nil } // empty micro-batch: no-op
    // bootstrap detection looks for bucket DIRECTORIES, not bare
    // existence — a crash can leave the root created but empty, which
    // must re-enter the bootstrap path, not a schema-less parquet read
    val hasState = fs.exists(new HPath(path)) &&
      fs.listStatus(new HPath(path)).exists(_.getPath.getName.startsWith("__bucket="))
    val current =
      if (hasState)
        spark.read.parquet(path)
          .filter(col("__bucket").isin(touched: _*)) // partition-pruned read
          .drop("__bucket")
      else // bootstrap: first batch creates the layout
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          latest.drop("__bucket").schema)
    // cached variant: state write + CDC write both execute below — an
    // uncached plan would run the whole merge join once per action
    val (merged0, log, release) =
      MergeOps.upsertWithLogCached(current, latest.drop("__bucket"), policy)
    val merged = merged0.withColumn("__bucket", bucketId(policy.keys, numBuckets))
    val stage = path + "_stage"
    try {
      merged.write.mode("overwrite").partitionBy("__bucket").parquet(stage)
      logPath.foreach { lp =>
        batchId match {
          case Some(id) => log.write.mode("overwrite").parquet(s"$lp/batch=$id")
          case None     => log.write.mode("append").parquet(lp)
        }
      }
    } finally { release(); latest.unpersist() } // a failed write must not strand the cached join for the session's lifetime
    // crash-safe swap: park the old bucket ASIDE (outside the partition
    // root, so partition discovery never sees it), move the new one in,
    // then drop the parked copy. Any crash leaves each bucket either at
    // dst or parked — recoverSwap restores parked ones on the
    // next merge, and the replayed (idempotent) batch converges.
    swapStagedDirs(fs, stage, path, touched.map(b => s"__bucket=$b"))
    touched
  }

  /** Crash-safe staged-directory swap shared by the changed-bucket merge,
    * bucket compaction, and incremental log compaction: for each named
    * child dir, park the current copy ASIDE under `<path>_old` (outside
    * partition discovery), move the staged one in, drop the parked copy;
    * delete the stage root last. Any crash leaves each dir either
    * swapped or parked — [[recoverSwap]] restores parked ones on the
    * next run. Same single-writer contract as [[mergeChangedBuckets]].
    */
  private[graft] def swapStagedDirs(fs: org.apache.hadoop.fs.FileSystem,
                                    stage: String, path: String,
                                    names: Seq[String]): Unit = {
    import org.apache.hadoop.fs.{Path => HPath}
    val asideRoot = new HPath(path + "_old")
    fs.mkdirs(new HPath(path))
    fs.mkdirs(asideRoot)
    names.foreach { n =>
      val dst   = new HPath(path, n)
      val src   = new HPath(stage, n)
      val aside = new HPath(asideRoot, n)
      fs.delete(aside, true)
      if (fs.exists(dst) && !fs.rename(dst, aside))
        sys.error(s"staged swap: failed to park $dst")
      if (fs.exists(src) && !fs.rename(src, dst)) // a dir can be absent from stage only if all its rows were keyed-deleted
        sys.error(s"staged swap: failed to move $src into place")
      fs.delete(aside, true)
    }
    fs.delete(asideRoot, true)
    fs.delete(new HPath(stage), true)
  }

  /** Small-file compaction for the changed-bucket layout: every merge
    * rewrites its touched buckets as fresh files, so a bucket that takes
    * updates every batch accumulates one file set per merge cadence
    * window. This rewrites ONLY buckets whose file count exceeds
    * `maxFilesPerBucket` — coalesced to 1 file each via the same
    * park-aside swap (crash-safe, recoverable by the next merge's
    * pre-pass) — and never opens a healthy bucket. Run it on a timer or
    * after N merges, like any LSM-ish compaction.
    *
    * Same single-writer contract as [[mergeChangedBuckets]].
    *
    * @return bucket ids compacted
    */
  def compactBuckets(spark: SparkSession, path: String,
                     maxFilesPerBucket: Int = 8): Seq[Int] = {
    import org.apache.hadoop.fs.{Path => HPath}
    val conf = spark.sessionState.newHadoopConf()
    val fs   = new HPath(path).getFileSystem(conf)
    if (!fs.exists(new HPath(path))) return Nil
    recoverSwap(fs, path)
    val oversized = fs.listStatus(new HPath(path))
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("__bucket="))
      .filter(st => fs.listStatus(st.getPath)
        .count(f => f.isFile && !f.getPath.getName.startsWith("_")) > maxFilesPerBucket)
      .map(st => st.getPath.getName.stripPrefix("__bucket=").toInt)
      .toSeq.sorted
    if (oversized.isEmpty) return Nil
    val stage = path + "_stage"
    spark.read.parquet(path)
      .filter(col("__bucket").isin(oversized: _*)) // partition-pruned: only sick buckets are read
      .repartition(col("__bucket")) // one task per bucket → one output file each
      .write.mode("overwrite").partitionBy("__bucket").parquet(stage)
    swapStagedDirs(fs, stage, path, oversized.map(b => s"__bucket=$b"))
    oversized
  }

  /** Recovery pre-pass for [[swapStagedDirs]] callers: any directory
    * still parked under `<path>_old` belongs to a swap that crashed
    * between park and move — if its slot is empty, move it back; if the
    * slot was filled (crash after the move), drop the parked copy.
    */
  private[graft] def recoverSwap(fs: org.apache.hadoop.fs.FileSystem, path: String): Unit = {
    val asideRoot = new org.apache.hadoop.fs.Path(path + "_old")
    if (fs.exists(asideRoot)) {
      fs.listStatus(asideRoot).foreach { st =>
        val dst = new org.apache.hadoop.fs.Path(path, st.getPath.getName)
        if (!fs.exists(dst)) {
          if (!fs.rename(st.getPath, dst))
            sys.error(s"bucket swap recovery: failed to restore ${st.getPath}")
        } else fs.delete(st.getPath, true)
      }
      fs.delete(asideRoot, true)
    }
  }
}
