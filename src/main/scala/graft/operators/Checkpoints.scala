package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage truncation that honors the deployment posture.
  *
  * Iterative plans (the [[Dedup.connectedComponents]] label loop, q21's
  * shared `late` relation) must cut their lineage so round t's plan does
  * not embed rounds 0..t-1. On a single node `localCheckpoint` is the
  * right tool: executor-local blocks, no storage round-trip. On a real
  * cluster it is a liveness hazard — losing ANY executor loses blocks
  * with no lineage to recompute them, failing the job unrecoverably —
  * so the 100 TB posture wants RELIABLE checkpoints to shared storage.
  *
  * `spark.graft.reliableCheckpoints=true` flips every graft truncation
  * site to `Dataset.checkpoint` (HDFS/S3-backed, survives executor
  * loss). The checkpoint directory comes from the context's
  * `setCheckpointDir` if already set, else `spark.graft.checkpointDir`.
  * Both checkpoints stay LAZY: the next action over the frame
  * materializes them in the same job (see the scale rationale at
  * Dedup.connectedComponents).
  */
object Checkpoints {

  val FlagKey = "spark.graft.reliableCheckpoints"
  val DirKey = "spark.graft.checkpointDir"

  /** Truncate `df`'s lineage per the session's deployment posture. */
  def truncate(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    val reliable = s.conf.getOption(FlagKey).exists(_.trim.equalsIgnoreCase("true"))
    if (reliable) {
      if (s.sparkContext.getCheckpointDir.isEmpty)
        s.conf.getOption(DirKey) match {
          case Some(dir) => s.sparkContext.setCheckpointDir(dir)
          case None => throw new IllegalStateException(
            s"$FlagKey=true needs a checkpoint dir: call setCheckpointDir or set $DirKey")
        }
      df.checkpoint(eager = false)
    } else df.localCheckpoint(eager = false)
  }
}
