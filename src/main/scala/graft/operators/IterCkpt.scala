package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.storage.StorageLevel

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
  * state survives executor churn.
  *
  * Cost of reliable mode, measured on this Spark (IterCkptSpec pins it):
  * Spark 4's eager `Dataset.checkpoint` runs `RDD.doCheckpoint()`
  * directly — ONE job that computes the round's plan exactly once and
  * writes the partitions to the dir as it goes (the Spark 3 era
  * compute-then-recompute-to-write double evaluation is gone upstream).
  * So a reliable round costs the same single computation as a local one
  * plus the DFS write. The checkpointed RDD is additionally persisted
  * MEMORY_AND_DISK here so the next round's references (hash-to-min
  * reads each round's labels twice) hit the block manager and fall back
  * to the checkpoint FILES only on block loss — read parity with local
  * mode, recoverability of reliable mode.
  *
  * Reliable-mode FILES are deleted deterministically by [[drop]] once a
  * round is superseded (see its scaladoc); rounds never dropped (the
  * final labels) are left for the ContextCleaner
  * (`spark.cleaner.referenceTracking.cleanCheckpoints=true`, off by
  * default) or a dir sweep. The FINAL round's MEMORY_AND_DISK blocks
  * (|V| label rows) are likewise never freed by the operators — they
  * cannot know when the caller has consumed the returned DataFrame —
  * so a reliable-mode caller that is done with the result should call
  * [[drop]] on it (frees blocks AND files) or leave it to RDD GC;
  * repeated reliable-mode invocations in one long session otherwise
  * accumulate one final-round block set each.
  */
object IterCkpt {
  /** Session conf key: fault-tolerant checkpoint directory. Empty/unset
    * → localCheckpoint (single-box default).
    */
  val DirKey = "graft.iter.checkpointDir"

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** The context-level checkpoint dir is first-write-wins: SparkContext
    * has no re-set, and `setCheckpointDir` appends a fresh UUID subdir,
    * so once ANY dir is live every later conf value is ignored. Returns
    * the live dir when it does NOT descend from `want` — the case where
    * a caller believes the conf took effect but checkpoints are landing
    * somewhere else (possibly a non-fault-tolerant path).
    */
  private[graft] def dirMismatch(existing: Option[String], want: String,
                                 hadoopConf: org.apache.hadoop.conf.Configuration)
      : Option[String] =
    existing.filter { live =>
      val wantQ = {
        val p = new Path(want)
        p.getFileSystem(hadoopConf).makeQualified(p)
      }
      // live = wantQ/<uuid> when our conf value took effect
      new Path(live).getParent != wantQ
    }

  /** Materialize `df` and truncate its lineage (eager in both modes —
    * callers rely on the round's job having RUN when this returns, e.g.
    * for Observation-based convergence counts).
    */
  def truncate(df: DataFrame): DataFrame = {
    val dir = df.sparkSession.conf.get(DirKey, "")
    if (dir.isEmpty) df.localCheckpoint()
    else {
      val sc = df.sparkSession.sparkContext
      // setCheckpointDir mints a fresh UUID subdir per call — set once.
      // A dir already on the context (user code, or an earlier different
      // conf value) wins silently at the Spark level; surface that, or
      // the caller believes graft.iter.checkpointDir took effect while
      // state lands on a path with different fault-tolerance guarantees.
      if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
      else dirMismatch(sc.getCheckpointDir, dir, sc.hadoopConfiguration)
        .foreach(live => log.warn(
          s"$DirKey=$dir ignored: SparkContext checkpoint dir is already " +
            s"$live (first-write-wins) — reliable checkpoints are landing there"))
      val out = df.checkpoint()
      // block-backed re-reads: the next round references this state (twice,
      // in hash-to-min); serve those from the block manager, keep the DFS
      // files as the executor-churn fallback. drop() frees the blocks.
      Bridge.materializedRdd(out).foreach(_.persist(StorageLevel.MEMORY_AND_DISK))
      out
    }
  }

  /** Deterministically free a superseded round's storage (call only once
    * a successor round is materialized — truncated state cannot be
    * recomputed, and after this call must never be read again).
    * `Dataset.unpersist` would be a no-op here: checkpoint persists
    * bypass the CacheManager, so the underlying RDD itself is
    * unpersisted (Bridge.materializedRdd). In reliable mode the round's
    * checkpoint FILES (its rdd-N subdir) are deleted too: the
    * ContextCleaner only removes them when
    * `spark.cleaner.referenceTracking.cleanCheckpoints` is set (off by
    * default) AND the RDD is GC'd, so a multi-hour run would otherwise
    * accumulate rounds × |V| of DFS storage.
    */
  def drop(df: DataFrame): Unit =
    Bridge.materializedRdd(df).foreach { rdd =>
      rdd.unpersist(blocking = false)
      rdd.getCheckpointFile.foreach { f =>
        val p = new Path(f)
        try p.getFileSystem(rdd.context.hadoopConfiguration).delete(p, true)
        catch { case e: java.io.IOException =>
          log.warn(s"could not delete superseded checkpoint $p: $e") }
      }
    }
}
