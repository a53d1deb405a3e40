package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Log-structured maintenance state — the write-amplification fix for
  * the epoch-versioned sinks. The `v=<epoch>` discipline in
  * [[Streams]] rewrites the FULL state every micro-batch: O(state)
  * bytes per epoch, which at a 100 TB-class index with minute-level
  * batches is the dominant (and unnecessary) cost. The log-structured
  * form writes per epoch only what the batch itself establishes —
  * O(batch) bytes — and defers the merge:
  *
  *   - a DELTA per epoch: `own` (the keys this epoch claims — upserted
  *     OR tombstoned) and `rows` (the state rows of the upserted keys;
  *     a tombstoned key claims ownership with NO rows, which is how it
  *     dies at read time);
  *   - COMPOSITION at read: for every key, the highest-epoch claim
  *     wins (base counts as its own epoch), and the winner's rows are
  *     the key's state — one union + one max-aggregate + one join,
  *     O(state + deltas), all relational (arg-max by epoch, the same
  *     shape every LSM read path uses);
  *   - COMPACTION, amortized: materialize the composition as a new
  *     base at the top epoch and drop the folded deltas, bounding read
  *     cost. Compaction is crash-safe by ordering: the new base is
  *     written to a temp dir and RENAMED into place (atomic on
  *     HDFS-like stores) BEFORE any delta is deleted, and composition
  *     ignores deltas at-or-below the base epoch — a crash between the
  *     two steps leaves stale deltas that are simply never read again.
  *     (On a rename-less object store, swap the rename for the table
  *     format's manifest commit — the algebra is the operator, not the
  *     directory protocol.)
  *
  * Retried epochs stay idempotent exactly as in the eager sinks: an
  * epoch overwrites its OWN `delta/e=<id>` directory and the
  * composition is insensitive to rewriting identical bytes.
  *
  * Upsert semantics are whole-key replacement (the [[graft.operators
  * .Retrieval.upsertTermFreq]] contract): claiming a key at epoch e
  * hides every older row of that key, so a re-crawl needs no
  * read-modify-write and a tombstone is just a rowless claim.
  */
object StateLog {

  /** Pure-frame composition — the operator itself, independent of any
    * directory layout (the driver-gated `q_tf_log_compose` runs this
    * in-plan against a DuckDB arg-max oracle). `base` is an optional
    * (epoch, rows) pair whose own-set is its rows' distinct keys (a
    * key fully tombstoned before compaction is simply absent); each
    * delta is (epoch, own, rows). Epochs must be distinct; the
    * highest-epoch claim per key wins and contributes its rows.
    */
  def composeFrames(keyCol: String,
                    base: Option[(Long, DataFrame)],
                    deltas: Seq[(Long, DataFrame, DataFrame)]): DataFrame = {
    val rowsTagged =
      base.map { case (e, r) => r.withColumn("_e", lit(e)) }.toSeq ++
        deltas.map { case (e, _, r) => r.withColumn("_e", lit(e)) }
    val ownTagged =
      base.map { case (e, r) =>
        r.select(col(keyCol)).distinct().withColumn("_e", lit(e)) }.toSeq ++
        deltas.map { case (e, o, _) =>
          o.select(col(keyCol)).distinct().withColumn("_e", lit(e)) }
    require(rowsTagged.nonEmpty, "composeFrames: no base and no deltas")
    val winner = ownTagged.reduce(_ unionByName _)
      .groupBy(keyCol).agg(max("_e").as("_e"))
    rowsTagged.reduce(_ unionByName _)
      .join(winner, Seq(keyCol, "_e"))
      .drop("_e")
  }

  /** Write epoch `id`'s delta: O(batch) bytes, overwrite-idempotent on
    * epoch replay. `own` claims keys (upserted or tombstoned); `rows`
    * carries the upserted keys' state rows only.
    */
  def writeDelta(stateDir: String, id: Long,
                 own: DataFrame, rows: DataFrame): Unit = {
    own.write.mode("overwrite").parquet(s"$stateDir/delta/e=$id/own")
    rows.write.mode("overwrite").parquet(s"$stateDir/delta/e=$id/rows")
  }

  /** Compose the on-disk state: the newest base (if any) plus every
    * delta ABOVE it. `emptyRows` seeds the schema when no state exists
    * yet (the limit(0) discipline of the eager sinks).
    */
  def compose(spark: SparkSession, stateDir: String, keyCol: String,
              emptyRows: DataFrame): DataFrame = {
    val baseE = epochs(spark, s"$stateDir/base").sorted.lastOption
    val base = baseE.map(e =>
      e -> spark.read.parquet(s"$stateDir/base/e=$e/rows"))
    val ds = epochs(spark, s"$stateDir/delta")
      .filter(e => baseE.forall(_ < e)).sorted
      .map(e => (e,
        spark.read.parquet(s"$stateDir/delta/e=$e/own"),
        spark.read.parquet(s"$stateDir/delta/e=$e/rows")))
    if (base.isEmpty && ds.isEmpty) emptyRows
    else composeFrames(keyCol, base, ds)
  }

  /** Fold every readable delta into a new base at the top epoch, then
    * drop the folded deltas. Write-to-temp + rename before any delete
    * (see the object scaladoc for the crash-ordering argument); a
    * no-op when there is nothing above the current base.
    */
  def compact(spark: SparkSession, stateDir: String, keyCol: String,
              emptyRows: DataFrame): Unit = {
    val baseE = epochs(spark, s"$stateDir/base").sorted.lastOption
    val ds = epochs(spark, s"$stateDir/delta").filter(e => baseE.forall(_ < e))
    if (ds.isEmpty) return
    val top = ds.max
    val composed = compose(spark, stateDir, keyCol, emptyRows)
    val hfs = fs(spark, stateDir)
    val tmp = new org.apache.hadoop.fs.Path(s"$stateDir/base/.compact_tmp")
    hfs.delete(tmp, true)
    composed.write.mode("overwrite").parquet(s"$stateDir/base/.compact_tmp/rows")
    val dest = new org.apache.hadoop.fs.Path(s"$stateDir/base/e=$top")
    hfs.delete(dest, true)
    require(hfs.rename(tmp, dest),
      s"compact: rename $tmp -> $dest failed — base not committed, deltas kept")
    // only after the new base is visible: retire everything it folded
    // (the old base included — composition reads just the newest base)
    epochs(spark, s"$stateDir/base").filter(_ < top).foreach(e =>
      hfs.delete(new org.apache.hadoop.fs.Path(s"$stateDir/base/e=$e"), true))
    epochs(spark, s"$stateDir/delta").filter(_ <= top).foreach(e =>
      hfs.delete(new org.apache.hadoop.fs.Path(s"$stateDir/delta/e=$e"), true))
  }

  /** `e=<n>` child epochs of `dir` via Hadoop FileSystem (the
    * scheme-correct listing discipline of [[Streams.latestStateVersion]]).
    */
  private def epochs(spark: SparkSession, dir: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val hfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!hfs.exists(p)) Seq.empty
    else hfs.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("e="))
      .map(_.getPath.getName.stripPrefix("e=").toLong)
  }

  private def fs(spark: SparkSession,
                 dir: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
}
