package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{IvfPqKernel, NearestCellsKernel, PqKernel}

/** Save/load for trained ANN indexes — the 100 TB serving shape.
  *
  * Training an index over a production corpus is a once-per-epoch job;
  * serving happens in many later jobs (and on other clusters). Without
  * persistence every serving job re-pays the training scans (Lloyd
  * iterations, PQ codebook training, the full encode pass), which is
  * untenable at corpus scale — so each index family splits into its
  * n-PROPORTIONAL part (the encoded/assigned corpus: ordinary parquet,
  * written cluster-parallel and partitionable like any table) and its
  * DRIVER-SIZED quantizer state. The quantizer is CHUNKED — one parquet
  * row per centroid / codeword plus one small config row — never one
  * row of nlist×dim flattened doubles: at the MaxNlist cap with
  * realistic dims a single flat row is hundreds of MB, which is
  * exactly where parquet row-group and driver single-row limits live.
  * The load still collects driver-sized state (centroids ARE driver
  * state, the canonical k-means exception), but no single row grows
  * with nlist×dim, and every load re-checks completeness loudly
  * (exact row count, no duplicate or out-of-range ids, exact dim).
  *
  * Doubles round-trip parquet bit-exactly (IEEE bits are stored, not
  * decimal renderings), so a LOADED index probes bit-identically to
  * the index that was saved — IndexStoreSpec pins the round-trip for
  * all four families by comparing probe rows.
  *
  * LSH stores no quantizer at all: it is data-oblivious (the
  * hyperplanes are a pure function of (dim, tables, bitsPerTable,
  * seed)), so only the corpus vectors and the configuration persist
  * and the load re-buckets in one scan — the same O(n) cost as
  * reading a pre-banded table, without storing `tables` band rows
  * per vector.
  *
  * Storage note: the IVF/LSH frames carry the ENGINE-FACING double
  * vectors (what `normed`/`lshIndex` produced), so a float-sourced
  * corpus stores at 2× its raw width. Narrowing back to float on save
  * would be exact only when the source really was float — the index
  * does not retain the source schema, and silently halving the
  * precision of a genuinely-double corpus is the wrong default — so
  * the doubles persist as-is; size-sensitive deployments should store
  * the PQ-coded families instead (their n-proportional part is
  * (id, [cell,] code) — no raw vectors at all, which is the point
  * of PQ).
  */
object IndexStore {

  // --------------------------------------------------------- chunk codecs

  /** Write a centroid-major flat matrix as one row per centroid.
    *
    * coalesce(1): this is DRIVER-SIZED quantizer state (k × dim, the
    * canonical k-means exception) — without it the local-relation write
    * fans a few dozen rows across default-parallelism tasks (measured:
    * 32 tasks / ~1.1 s task time / 32 one-row files per save on the
    * serve_persisted rows, then 32 file opens per load). One task and
    * one file is the right layout for a KB-scale config artifact at ANY
    * scale; the n-proportional encoded/assigned corpus frames keep
    * their cluster-parallel writes.
    */
  private def saveChunked(spark: SparkSession, flat: Array[Double],
                          dim: Int, path: String): Unit = {
    import spark.implicits._
    val rows = flat.length / dim
    (0 until rows)
      .map(c => (c, flat.slice(c * dim, (c + 1) * dim).toSeq))
      .toDF("cid", "centroid")
      .coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Reassemble a chunked matrix, loudly checking completeness: exact
    * row count, ids exactly 0 until expected (no duplicates, no gaps),
    * every chunk exactly dim wide — a partial or doubled write must
    * fail here, never probe with a wrong quantizer.
    */
  private def loadChunked(spark: SparkSession, path: String,
                          expected: Int, dim: Int): Array[Double] = {
    val rows = spark.read.parquet(path).collect()
    require(rows.length == expected,
      s"$path must hold exactly $expected centroid rows, found ${rows.length}")
    val flat = new Array[Double](expected * dim)
    val seen = new Array[Boolean](expected)
    rows.foreach { r =>
      val c = r.getInt(r.fieldIndex("cid"))
      require(c >= 0 && c < expected && !seen(c),
        s"$path: duplicate or out-of-range centroid id $c")
      seen(c) = true
      val v = r.getSeq[Double](r.fieldIndex("centroid"))
      require(v.length == dim,
        s"$path: centroid $c has ${v.length} components, expected $dim")
      v.copyToArray(flat, c * dim)
    }
    flat
  }

  /** On-disk layout version, stamped into every config row. Bumped when
    * the layout changes shape (v2 = the chunked-quantizer layout; v1 was
    * the single-flat-row form), so a load of an index saved by another
    * layout fails with an explicit "resave" message instead of a bare
    * fieldIndex/ClassCast error from deep inside Spark's Row.
    */
  private[graft] val FormatVersion = 2

  private def withVersion(df: DataFrame): DataFrame =
    df.withColumn("format_version", lit(FormatVersion))

  private def oneRow(spark: SparkSession, path: String): Row = {
    val row = spark.read.parquet(path).collect() match {
      case Array(r) => r
      case rows => throw new IllegalArgumentException(
        s"$path must hold exactly one configuration row, found ${rows.length}")
    }
    require(row.schema.fieldNames.contains("format_version"),
      s"$path carries no format_version column — this index was saved by " +
        "a pre-chunked (v1) layout this build no longer reads; resave it " +
        "with the current save* method")
    val v = row.getInt(row.fieldIndex("format_version"))
    require(v == FormatVersion,
      s"$path is format version $v, this build reads $FormatVersion — " +
        "resave the index with the current save* method")
    row
  }

  /** PQ codebooks chunk as one row per (subspace, code) under the
    * composite id mi·codes + code — same completeness contract.
    */
  private def savePqBooks(spark: SparkSession, pq: PqKernel,
                          path: String): Unit =
    saveChunked(spark, pq.flat, pq.subDim, path)

  private def loadPqKernel(spark: SparkSession, path: String,
                           m: Int, subDim: Int, nCodes: Int): PqKernel =
    new PqKernel(loadChunked(spark, path, m * nCodes, subDim),
      m, subDim, nCodes)

  // ---------------------------------------------------------------- IVF-PQ

  /** Persist a trained [[Similarity.IvfPqIndex]] under `path`
    * (`path/encoded` = the PQ-encoded corpus; `path/cells` /
    * `path/codebook` = the chunked quantizers; `path/model` = one
    * small config row).
    */
  def saveIvfPq(index: Similarity.IvfPqIndex, path: String): Unit = {
    val spark = index.encoded.sparkSession
    import spark.implicits._
    index.encoded.write.mode("overwrite").parquet(s"$path/encoded")
    val (cells, pq) = (index.fused.cells, index.fused.pq)
    saveChunked(spark, cells.flat, cells.dim, s"$path/cells")
    savePqBooks(spark, pq, s"$path/codebook")
    withVersion(Seq((cells.flat.length / cells.dim, cells.dim, pq.m,
        pq.subDim, pq.nCodes, index.codes))
      .toDF("nlist", "cells_dim", "pq_m", "pq_subdim", "pq_ncodes", "codes"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/model")
  }

  def loadIvfPq(spark: SparkSession, path: String): Similarity.IvfPqIndex = {
    val m = oneRow(spark, s"$path/model")
    val dim = m.getInt(m.fieldIndex("cells_dim"))
    val cells = new NearestCellsKernel(
      loadChunked(spark, s"$path/cells",
        m.getInt(m.fieldIndex("nlist")), dim), dim)
    val pq = loadPqKernel(spark, s"$path/codebook",
      m.getInt(m.fieldIndex("pq_m")), m.getInt(m.fieldIndex("pq_subdim")),
      m.getInt(m.fieldIndex("pq_ncodes")))
    Similarity.IvfPqIndex(spark.read.parquet(s"$path/encoded"),
      new IvfPqKernel(cells, pq), m.getInt(m.fieldIndex("codes")))
  }

  // ------------------------------------------------------------- plain IVF

  /** Persist a trained [[Similarity.IvfIndex]] under `path`
    * (`path/assigned` = the cell-assigned normalized corpus;
    * `path/cells` = the chunked centroid state; `path/model` = one
    * config row). The normalized corpus itself is NOT stored twice:
    * `assigned` carries (nid, nv, nnrm, cell) and the self-kNN query
    * side reconstructs from it by rename.
    */
  def saveIvf(index: Similarity.IvfIndex, path: String): Unit = {
    val spark = index.assigned.sparkSession
    import spark.implicits._
    index.assigned.write.mode("overwrite").parquet(s"$path/assigned")
    saveChunked(spark, index.kernel.flat, index.kernel.dim, s"$path/cells")
    withVersion(Seq((index.kernel.flat.length / index.kernel.dim,
        index.kernel.dim))
      .toDF("nlist", "cells_dim"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/model")
  }

  def loadIvf(spark: SparkSession, path: String): Similarity.IvfIndex = {
    val m = oneRow(spark, s"$path/model")
    val dim = m.getInt(m.fieldIndex("cells_dim"))
    val assigned = spark.read.parquet(s"$path/assigned")
    val corpus = assigned.select(col("nid").as("id"), col("nv").as("v"),
      col("nnrm").as("nrm"))
    Similarity.IvfIndex(assigned, corpus,
      new NearestCellsKernel(
        loadChunked(spark, s"$path/cells",
          m.getInt(m.fieldIndex("nlist")), dim), dim))
  }

  // ---------------------------------------------------------------- flat PQ

  /** Persist a flat-ADC index — the encoded corpus plus its
    * [[Similarity.PQModel]] — under `path` (`path/encoded`,
    * `path/codebook`, `path/model`). The one family that previously
    * retrained per serving job; [[Similarity.pqSearch]] takes the
    * loaded pair directly.
    */
  def savePq(encoded: DataFrame, model: Similarity.PQModel,
             path: String): Unit = {
    val spark = encoded.sparkSession
    import spark.implicits._
    encoded.write.mode("overwrite").parquet(s"$path/encoded")
    savePqBooks(spark, graft.functions.PqOps.kernel(model.codebooks),
      s"$path/codebook")
    withVersion(Seq((model.m, model.subDim, model.codebooks(0).length))
      .toDF("pq_m", "pq_subdim", "pq_ncodes"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/model")
  }

  def loadPq(spark: SparkSession,
             path: String): (DataFrame, Similarity.PQModel) = {
    val m = oneRow(spark, s"$path/model")
    val (pm, subDim, nCodes) = (m.getInt(m.fieldIndex("pq_m")),
      m.getInt(m.fieldIndex("pq_subdim")), m.getInt(m.fieldIndex("pq_ncodes")))
    val flat = loadChunked(spark, s"$path/codebook", pm * nCodes, subDim)
    val books = Array.tabulate(pm, nCodes)((mi, c) =>
      flat.slice((mi * nCodes + c) * subDim, (mi * nCodes + c + 1) * subDim))
    (spark.read.parquet(s"$path/encoded"),
      Similarity.PQModel(pm, subDim, books))
  }

  // ------------------------------------------------------------------ LSH

  /** Persist a bucketed [[Similarity.LshIndex]] under `path`
    * (`path/corpus` = the (id, v) vectors; `path/model` = the
    * hyperplane configuration). Nothing trains in LSH, so the load
    * re-buckets deterministically from the seed.
    */
  def saveLsh(index: Similarity.LshIndex, path: String): Unit = {
    val spark = index.slim.sparkSession
    import spark.implicits._
    index.slim.select(col("id"), col("v")).write.mode("overwrite")
      .parquet(s"$path/corpus")
    withVersion(Seq((index.dim, index.tables, index.bitsPerTable, index.seed))
      .toDF("dim", "tables", "bits_per_table", "seed"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/model")
  }

  def loadLsh(spark: SparkSession, path: String): Similarity.LshIndex = {
    val m = oneRow(spark, s"$path/model")
    Similarity.lshIndex(spark.read.parquet(s"$path/corpus"), "id", "v",
      dim = m.getInt(m.fieldIndex("dim")),
      tables = m.getInt(m.fieldIndex("tables")),
      bitsPerTable = m.getInt(m.fieldIndex("bits_per_table")),
      seed = m.getLong(m.fieldIndex("seed")))
  }
}
