package graft.ops

import org.apache.spark.sql.DataFrame

/** Lineage-truncation policy for iterative loops.
  *
  * Every multi-round operator here pins its per-round state (see
  * [[GraphCores]] for why a merely-cached plan hangs Catalyst at
  * fan-out ≥ 2). HOW it pins is a fault-tolerance trade the caller
  * should own at 100 TB:
  *
  *  - `localCheckpoint` (the default, `dir = None`): blocks live on
  *    executors, no filesystem round-trip — fast, but the truncated
  *    lineage means ONE lost executor fails the whole job. Right for
  *    short bounded loops and local mode.
  *  - reliable `checkpoint` (`dir = Some(path)`): state is written to
  *    the checkpoint directory (HDFS/object store on a cluster), so a
  *    lost executor recovers by re-reading files instead of failing the
  *    job. Right for long peels/fixpoints on clusters that lose
  *    executors as a matter of course — the cost is one distributed
  *    write + read per pin, which is why convergent loops pin every
  *    `checkpointEvery` rounds instead of every round.
  *
  * Checkpoint files for superseded rounds are NOT deleted here — they
  * may still back a live plan; set
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` to have the
  * ContextCleaner GC them, or point `dir` at a run-scoped path and
  * remove it after the job.
  */
object Checkpoints {

  /** Materialize `df` and truncate its lineage under the given policy.
    * Both paths are EAGER — the pin is the round's one action. */
  def pin(df: DataFrame, dir: Option[String]): DataFrame = dir match {
    case None => df.localCheckpoint()
    case Some(d) =>
      val sc = df.sparkSession.sparkContext
      if (!sc.getCheckpointDir.contains(d)) sc.setCheckpointDir(d)
      df.checkpoint()
  }

  /** Release the blocks behind a LOCAL pin once superseded (reliable
    * pins are file-backed; their RDD holds no blocks to release). */
  def release(df: DataFrame, dir: Option[String]): Unit =
    if (dir.isEmpty) Lineage.releaseLocalCheckpoint(df)
}
