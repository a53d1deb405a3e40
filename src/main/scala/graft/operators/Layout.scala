package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: cluster a table's files on TWO
  * columns at once so min/max footer statistics prune files for
  * predicates on EITHER column — the technique behind Delta/Iceberg
  * `OPTIMIZE ZORDER BY` and classic spatial indexing (Morton 1966).
  *
  * Why it matters at 100 TB: a sort layout on column A gives perfect
  * file skipping for A-predicates and ZERO skipping for B-predicates
  * (every file spans B's full range). Interleaving the bits of both
  * normalized keys makes each file a small axis-aligned box in (A, B)
  * space, so a selective predicate on either column intersects only
  * O(files^(1/2)) of the boxes instead of all of them.
  *
  * Everything is codegen'd column arithmetic — bit spreading uses the
  * standard mask sequence, the normalization is a min/max affine map
  * (one cheap agg, broadcast as literals), and the actual clustering is
  * `repartitionByRange` on the z-value: one range shuffle, identical to
  * what a plain sorted write costs. No UDFs, no driver data path.
  */
object Layout {

  /** Spread the low 16 bits of `x` so bit i lands at position 2i —
    * the classic "interleave with zeros" mask cascade. All long math;
    * stays inside whole-stage codegen.
    */
  private def spread16(x: Column): Column = {
    var v = x.bitwiseAND(lit(0xFFFFL))
    v = v.bitwiseOR(shiftleft(v, 8)).bitwiseAND(lit(0x00FF00FFL))
    v = v.bitwiseOR(shiftleft(v, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    v = v.bitwiseOR(shiftleft(v, 2)).bitwiseAND(lit(0x33333333L))
    v = v.bitwiseOR(shiftleft(v, 1)).bitwiseAND(lit(0x55555555L))
    v
  }

  /** 32-bit Morton code of two 16-bit values: a-bits at even positions,
    * b-bits at odd.
    */
  def morton(a16: Column, b16: Column): Column =
    spread16(a16).bitwiseOR(shiftleft(spread16(b16), 1))

  /** Affine-map a numeric column onto [0, 65535] given its min/max.
    * Min/max (not quantiles) keeps the map order-preserving and exact
    * to recompute; skewed columns still cluster (they just use fewer
    * distinct cells), and the box-pruning property is unaffected.
    */
  def norm16(c: Column, min: Double, max: Double): Column = {
    val span = if (max > min) max - min else 1.0
    least(greatest(((c.cast("double") - lit(min)) / lit(span) * lit(65535.0))
      .cast("long"), lit(0L)), lit(65535L))
  }

  /** Write `df` clustered on the Z-curve of (colA, colB) into `nFiles`
    * range partitions. The two-row min/max agg is the only extra work
    * over a plain sorted write; the range exchange replaces (not adds
    * to) the one a sorted layout needs.
    */
  def zorderWrite(df: DataFrame, colA: String, colB: String,
                  nFiles: Int, path: String): Unit = {
    val mm = df.agg(
      min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double")).head()
    val z = morton(
      norm16(col(colA), mm.getDouble(0), mm.getDouble(1)),
      norm16(col(colB), mm.getDouble(2), mm.getDouble(3)))
    df.withColumn("_z", z)
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }

  /** Redistribute a SMALL input before CPU-heavy per-row fan-out work
    * (tokenize / shingle / n-gram-window kernels that multiply each
    * input row into tens or hundreds of derived rows).
    *
    * Why: file-scan parallelism is floored by the split-size rule
    * `maxSplitBytes = max(openCostInBytes, bytes/minPartitionNum)` — an
    * input smaller than `slots × openCostInBytes` (e.g. a 0.6 MB
    * documents table vs the 4 MB open-cost floor) CANNOT produce more
    * than a handful of scan splits, so the whole explode→partial-agg
    * pipeline of a tokenizing operator runs in ~one task no matter how
    * many cores exist (measured: q_dup_ngrams spent 1.7 s of its 2.4 s
    * in a single-task scan stage on a 32-core box). One cheap
    * round-robin exchange of the raw rows (the input is by definition
    * tiny here) restores full parallelism for the expensive map work.
    *
    * Scale-adaptivity (the round-16 rule: derive from input size, never
    * a constant tuned to one box): the gate compares the optimizer's
    * size estimate against `defaultParallelism × openCostInBytes` —
    * exactly the regime where the split floor caps parallelism below
    * the slot count. Above the gate the input is returned UNTOUCHED: at
    * production scale the scan is already parallel and an extra full
    * shuffle of the payload would be pure waste (guide §2.5 input skew
    * / §8 "move heavy bytes once"). Row-level results are unchanged —
    * callers must only do order-free work downstream (keyed exact
    * aggregation, hashing, joins), which every text/dedup operator
    * here does; do NOT use this in front of order-sensitive float
    * reductions (k-means training sums), where a partitioning change
    * legally perturbs last-ulp results.
    */
  def fanOutSmall(df: DataFrame): DataFrame = {
    val ss = df.sparkSession
    val slots = ss.sparkContext.defaultParallelism
    val gate = slots.toLong *
      ss.sessionState.conf.filesOpenCostInBytes
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes < gate)
      df.repartition(slots)
    else df
  }

  /** Compact a directory of small parquet files into ~targetBytes
    * outputs — the small-files antidote: a streaming/CDC sink that
    * commits per trigger leaves thousands of KB-scale files whose
    * per-file open/footer/task overhead dominates the scan at 100 TB
    * (and strains the metastore/namenode). One round-robin exchange
    * sized from the actual on-disk bytes; returns the file count.
    * Production pipelines run this per partition directory so the
    * exchange never exceeds a partition's data.
    */
  def compact(spark: org.apache.spark.sql.SparkSession,
              inDir: String, outDir: String, targetBytes: Long): Int = {
    // size via the Hadoop FileSystem of the path, not java.io.File:
    // the stated production use is hdfs://, s3a://, … partition dirs,
    // where a local listFiles() returns null and NPEs — and the same
    // reader below already resolves any Hadoop FS. Recursive walk so
    // nested layouts count fully instead of collapsing to n = 1.
    val p = new org.apache.hadoop.fs.Path(inDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var bytes = 0L
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) bytes += f.getLen
    }
    val n = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inDir).repartition(n)
      .write.mode("overwrite").parquet(outDir)
    n
  }
}
