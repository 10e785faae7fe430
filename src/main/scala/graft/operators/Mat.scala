package graft.operators

import org.apache.spark.sql.DataFrame

/** The engine's single materialization point — every operator that
  * needs a plan barrier (multiply-consumed expensive subtrees, per-round
  * lineage truncation in iterative operators) goes through [[MatOps.mat]]
  * instead of calling `localCheckpoint` inline.
  *
  * Default mode is `localCheckpoint(eager = false)`: blocks are stored
  * UNREPLICATED on executors with lineage truncated — the right §2.4
  * tool on `local[*]`, where executor loss is process death anyway. On
  * a real cluster an executor loss after a local checkpoint kills the
  * job instead of recomputing; set
  * `spark.graft.materialize.reliable=true` (plus
  * `sparkContext.setCheckpointDir`) to switch every site to reliable
  * checkpointing at once. Lazy in both modes: materialization happens
  * inside the first action that consumes the frame, so nothing ever
  * executes outside a timed region that wouldn't have.
  */
object Mat {
  implicit class MatOps(private val df: DataFrame) extends AnyVal {
    def mat: DataFrame =
      if (df.sparkSession.conf
          .get("spark.graft.materialize.reliable", "false").toBoolean)
        df.checkpoint(eager = false)
      else df.localCheckpoint(eager = false)
  }
}
