package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * DRIVER-SIZED quantizer state (nlist×dim centroids + m×codes×subDim
  * codebooks, stored as one small parquet row of arrays).
  *
  * Doubles round-trip parquet bit-exactly (IEEE bits are stored, not
  * decimal renderings), so a LOADED index probes bit-identically to
  * the index that was saved — IndexStoreSpec pins the round-trip for
  * all three families by comparing probe rows.
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
  * the IVF-PQ index instead (its n-proportional part is (id, cell,
  * 8-byte code) — no raw vectors at all, which is the point of PQ).
  */
object IndexStore {

  // ---------------------------------------------------------------- IVF-PQ

  /** Persist a trained [[Similarity.IvfPqIndex]] under `path`
    * (`path/encoded` = the PQ-encoded corpus; `path/model` = one row
    * of quantizer arrays).
    */
  def saveIvfPq(index: Similarity.IvfPqIndex, path: String): Unit = {
    val spark = index.encoded.sparkSession
    import spark.implicits._
    index.encoded.write.mode("overwrite").parquet(s"$path/encoded")
    Seq((index.fused.cells.flat.toSeq, index.fused.cells.dim,
        index.fused.pq.flat.toSeq, index.fused.pq.m,
        index.fused.pq.subDim, index.fused.pq.nCodes, index.codes))
      .toDF("cells_flat", "cells_dim", "pq_flat", "pq_m", "pq_subdim",
        "pq_ncodes", "codes")
      .write.mode("overwrite").parquet(s"$path/model")
  }

  def loadIvfPq(spark: SparkSession, path: String): Similarity.IvfPqIndex = {
    val m = spark.read.parquet(s"$path/model").collect() match {
      case Array(row) => row
      case rows => throw new IllegalArgumentException(
        s"$path/model must hold exactly one quantizer row, found ${rows.length}")
    }
    val cells = new NearestCellsKernel(
      m.getSeq[Double](m.fieldIndex("cells_flat")).toArray,
      m.getInt(m.fieldIndex("cells_dim")))
    val pq = new PqKernel(
      m.getSeq[Double](m.fieldIndex("pq_flat")).toArray,
      m.getInt(m.fieldIndex("pq_m")),
      m.getInt(m.fieldIndex("pq_subdim")),
      m.getInt(m.fieldIndex("pq_ncodes")))
    Similarity.IvfPqIndex(spark.read.parquet(s"$path/encoded"),
      new IvfPqKernel(cells, pq), m.getInt(m.fieldIndex("codes")))
  }

  // ------------------------------------------------------------- plain IVF

  /** Persist a trained [[Similarity.IvfIndex]] under `path`
    * (`path/assigned` = the cell-assigned normalized corpus;
    * `path/model` = one row of centroid state). The normalized corpus
    * itself is NOT stored twice: `assigned` carries (nid, nv, nnrm,
    * cell) and the self-kNN query side reconstructs from it by rename.
    */
  def saveIvf(index: Similarity.IvfIndex, path: String): Unit = {
    val spark = index.assigned.sparkSession
    import spark.implicits._
    index.assigned.write.mode("overwrite").parquet(s"$path/assigned")
    Seq((index.kernel.flat.toSeq, index.kernel.dim))
      .toDF("cells_flat", "cells_dim")
      .write.mode("overwrite").parquet(s"$path/model")
  }

  def loadIvf(spark: SparkSession, path: String): Similarity.IvfIndex = {
    val m = spark.read.parquet(s"$path/model").collect() match {
      case Array(row) => row
      case rows => throw new IllegalArgumentException(
        s"$path/model must hold exactly one centroid row, found ${rows.length}")
    }
    val assigned = spark.read.parquet(s"$path/assigned")
    val corpus = assigned.select(col("nid").as("id"), col("nv").as("v"),
      col("nnrm").as("nrm"))
    Similarity.IvfIndex(assigned, corpus,
      new NearestCellsKernel(
        m.getSeq[Double](m.fieldIndex("cells_flat")).toArray,
        m.getInt(m.fieldIndex("cells_dim"))))
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
    Seq((index.dim, index.tables, index.bitsPerTable, index.seed))
      .toDF("dim", "tables", "bits_per_table", "seed")
      .write.mode("overwrite").parquet(s"$path/model")
  }

  def loadLsh(spark: SparkSession, path: String): Similarity.LshIndex = {
    val m = spark.read.parquet(s"$path/model").collect() match {
      case Array(row) => row
      case rows => throw new IllegalArgumentException(
        s"$path/model must hold exactly one configuration row, found ${rows.length}")
    }
    Similarity.lshIndex(spark.read.parquet(s"$path/corpus"), "id", "v",
      dim = m.getInt(m.fieldIndex("dim")),
      tables = m.getInt(m.fieldIndex("tables")),
      bitsPerTable = m.getInt(m.fieldIndex("bits_per_table")),
      seed = m.getLong(m.fieldIndex("seed")))
  }
}
