package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graftbridge.Bridge

/** Lineage truncation for iterative operators ([[Components]],
  * [[Graph.bfsDepths]]), with a cluster-reliability knob.
  *
  * Default mode is `localCheckpoint` — eager, block-manager-backed, no
  * DFS round-trip — which is the right trade on a single box. Its blocks
  * are NOT replicated, though: on a real cluster an executor loss
  * mid-iteration makes the truncated state unrecoverable (the lineage is
  * gone by design) and kills the whole multi-hour job — the exact
  * failure mode the repo's rank_sample revert note documents. Setting
  * the session conf `graft.iter.checkpointDir` to a fault-tolerant path
  * (HDFS/S3) switches every round to a reliable `checkpoint()` instead:
  * state survives executor churn, at the cost of one extra computation
  * of the round's plan plus a DFS write per truncation (Spark's
  * reliable-checkpoint job recomputes the RDD to write it). At the
  * stated 100 TB / 1000-executor target the reliable mode is the one to
  * run; leave the conf unset for local work.
  *
  * Checkpoint FILES in reliable mode are cleaned by the ContextCleaner
  * once the RDD is GC'd when
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (off by
  * default — long-running clusters should set it, or sweep the dir).
  */
object IterCkpt {
  /** Session conf key: fault-tolerant checkpoint directory. Empty/unset
    * → localCheckpoint (single-box default).
    */
  val DirKey = "graft.iter.checkpointDir"

  /** Materialize `df` and truncate its lineage (eager in both modes —
    * callers rely on the round's job having RUN when this returns, e.g.
    * for Observation-based convergence counts).
    */
  def truncate(df: DataFrame): DataFrame = {
    val dir = df.sparkSession.conf.get(DirKey, "")
    if (dir.isEmpty) df.localCheckpoint()
    else {
      val sc = df.sparkSession.sparkContext
      // setCheckpointDir mints a fresh UUID subdir per call — set once,
      // and respect a dir the caller already configured on the context
      if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
      df.checkpoint()
    }
  }

  /** Deterministically free a superseded round's storage (call only once
    * a successor round is materialized — truncated state cannot be
    * recomputed). `Dataset.unpersist` would be a no-op here: checkpoint
    * persists bypass the CacheManager, so the underlying RDD itself must
    * be unpersisted (Bridge.materializedRdd). In reliable mode there are
    * no blocks to drop and this is harmlessly idle — the files are the
    * ContextCleaner's (scaladoc above).
    */
  def drop(df: DataFrame): Unit =
    Bridge.materializedRdd(df).foreach(_.unpersist(blocking = false))
}
