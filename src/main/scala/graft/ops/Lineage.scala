package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Block-manager hygiene for iterative operators.
  *
  * The graph loops ([[PageRank]], [[GraphPaths]], [[GraphCores]]) pin
  * per-round state with `persist`/`localCheckpoint`. The pins are
  * load-bearing (see each operator's scaladoc), but a pin with no
  * explicit release leaks: blocks for superseded rounds sit in the block
  * manager until the ContextCleaner happens to GC the RDD object, and a
  * long-lived session running the registry repeatedly (Verify, Bench,
  * the spec suite) accumulates dead blocks that both waste memory and
  * pollute later measurements. Each loop therefore releases the
  * PREVIOUS round's blocks as soon as the next round is materialized —
  * targeted, not a blanket `getPersistentRDDs` flush.
  */
object Lineage {

  /** Free the materialized blocks behind an (eager) `localCheckpoint`'d
    * DataFrame. Safe only once nothing will read `df` again — the
    * checkpoint truncated its lineage, so the blocks are the ONLY copy
    * of the data. Matches only a checkpoint ROOT (the analyzed plan is
    * the bare `LogicalRDD` a checkpoint leaves behind); any other plan —
    * including a caller-supplied frame that merely CONTAINS an RDD
    * scan — is left untouched. */
  def releaseLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
