package graft

import graft.operators.{IndexStore, Similarity}

/** Index persistence must be invisible to the probe: a loaded index
  * probes BIT-IDENTICALLY to the in-session index it was saved from
  * (parquet stores IEEE double bits, not renderings), for every
  * family and both query shapes (external workload; self-kNN).
  */
class IndexStoreSpec extends SparkSpec {

  private val rng = new scala.util.Random(11)

  private def freshDir(name: String): String =
    java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), name)
      .toString

  private lazy val emb = {
    import spark.implicits._
    (0L until 300L)
      .map(i => (i, Seq.fill(16)(rng.nextDouble().toFloat)))
      .toDF("vec_id", "embedding")
  }
  private lazy val ext = {
    import spark.implicits._
    (1000L until 1020L)
      .map(i => (i, Seq.fill(16)(rng.nextDouble().toFloat)))
      .toDF("vec_id", "embedding")
  }

  test("IVF-PQ index round-trips: loaded probe rows == original") {
    val idx = Similarity.ivfPqIndex(emb, "vec_id", "embedding",
      nlist = 8, m = 4, codes = 16)
    val p = freshDir("idx-ivfpq")
    IndexStore.saveIvfPq(idx, p)
    val loaded = IndexStore.loadIvfPq(spark, p)
    val a = Similarity
      .ivfPqProbe(idx, ext, "vec_id", "embedding", k = 5, nprobe = 3)
      .orderBy("qid", "rank").collect().toSeq
    val b = Similarity
      .ivfPqProbe(loaded, ext, "vec_id", "embedding", k = 5, nprobe = 3)
      .orderBy("qid", "rank").collect().toSeq
    assert(a.nonEmpty && a == b)
  }

  test("plain-IVF index round-trips for both query shapes") {
    val idx = Similarity.ivfIndex(emb, "vec_id", "embedding", nlist = 8)
    val p = freshDir("idx-ivf")
    IndexStore.saveIvf(idx, p)
    val loaded = IndexStore.loadIvf(spark, p)
    // external workload
    val a = Similarity.ivfProbeFor(idx, ext, "vec_id", "embedding",
        k = 5, nprobe = 3).orderBy("qid", "rank").collect().toSeq
    val b = Similarity.ivfProbeFor(loaded, ext, "vec_id", "embedding",
        k = 5, nprobe = 3).orderBy("qid", "rank").collect().toSeq
    assert(a.nonEmpty && a == b)
    // self-kNN (exercises the corpus reconstructed from `assigned`)
    val c = Similarity.ivfProbe(idx, k = 5, nprobe = 3)
      .orderBy("qid", "rank").collect().toSeq
    val d = Similarity.ivfProbe(loaded, k = 5, nprobe = 3)
      .orderBy("qid", "rank").collect().toSeq
    assert(c.nonEmpty && c == d)
  }

  test("LSH index round-trips: the seed re-buckets deterministically") {
    val idx = Similarity.lshIndex(emb, "vec_id", "embedding", dim = 16)
    val p = freshDir("idx-lsh")
    IndexStore.saveLsh(idx, p)
    val loaded = IndexStore.loadLsh(spark, p)
    val a = Similarity.lshProbeFor(idx, ext, "vec_id", "embedding", k = 5)
      .orderBy("qid", "rank").collect().toSeq
    val b = Similarity.lshProbeFor(loaded, ext, "vec_id", "embedding", k = 5)
      .orderBy("qid", "rank").collect().toSeq
    assert(a.nonEmpty && a == b)
  }

  test("flat-PQ index round-trips: loaded (encoded, model) probe rows == original") {
    val model = Similarity.pqTrain(emb, "vec_id", "embedding",
      m = 4, codes = 16)
    val encoded = Similarity.pqEncode(emb, "vec_id", "embedding", model)
    val p = freshDir("idx-pq")
    IndexStore.savePq(encoded, model, p)
    val (encL, modelL) = IndexStore.loadPq(spark, p)
    // the codebooks themselves round-trip bit-exactly...
    assert(modelL.m == model.m && modelL.subDim == model.subDim)
    assert(modelL.codebooks.flatten.flatten.toSeq ==
      model.codebooks.flatten.flatten.toSeq)
    // ...and so do the probe rows, for both query shapes
    val a = Similarity.pqSearch(encoded, model, ext, "vec_id", "embedding",
        k = 5).orderBy("qid", "rank").collect().toSeq
    val b = Similarity.pqSearch(encL, modelL, ext, "vec_id", "embedding",
        k = 5).orderBy("qid", "rank").collect().toSeq
    assert(a.nonEmpty && a == b)
    val c = Similarity.pqSearch(encoded, model, emb, "vec_id", "embedding",
        k = 5).orderBy("qid", "rank").collect().toSeq
    val d = Similarity.pqSearch(encL, modelL, emb, "vec_id", "embedding",
        k = 5).orderBy("qid", "rank").collect().toSeq
    assert(c.nonEmpty && c == d)
  }

  test("a corrupted model dir fails loudly, not with a wrong index") {
    import spark.implicits._
    val p = freshDir("idx-bad")
    Seq((1, 2), (3, 4)).toDF("dim", "tables")
      .write.mode("overwrite").parquet(s"$p/model")
    val e = intercept[IllegalArgumentException](IndexStore.loadLsh(spark, p))
    assert(e.getMessage.contains("exactly one"))
  }

  test("a pre-versioned (v1) or future-version model row fails with the resave message") {
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    // v1 layout: a model row with no format_version column (the old
    // single-flat-row era) must fail with the explicit format message,
    // never a bare fieldIndex/ClassCast from inside Spark's Row
    val p1 = freshDir("idx-v1")
    Seq((16, 8, 12, 42L)).toDF("dim", "tables", "bits_per_table", "seed")
      .write.mode("overwrite").parquet(s"$p1/model")
    val e1 = intercept[IllegalArgumentException](IndexStore.loadLsh(spark, p1))
    assert(e1.getMessage.contains("format_version") &&
      e1.getMessage.contains("resave"))
    // a version this build doesn't read fails the same way
    val idx = Similarity.lshIndex(emb, "vec_id", "embedding", dim = 16)
    val p2 = freshDir("idx-vfuture")
    IndexStore.saveLsh(idx, p2)
    spark.read.parquet(s"$p2/model")
      .withColumn("format_version", lit(IndexStore.FormatVersion + 1))
      .write.mode("overwrite").parquet(s"$p2-bump/model")
    spark.read.parquet(s"$p2/corpus").write.mode("overwrite")
      .parquet(s"$p2-bump/corpus")
    val e2 = intercept[IllegalArgumentException](
      IndexStore.loadLsh(spark, s"$p2-bump"))
    assert(e2.getMessage.contains("resave"))
    // ...and the stamped current version loads (the round-trip tests
    // above already prove it; this pins the column is actually written)
    assert(spark.read.parquet(s"$p2/model")
      .select(col("format_version")).collect()(0).getInt(0)
      === IndexStore.FormatVersion)
  }

  test("a corrupted centroid chunk fails loudly: missing, duplicated, or ragged rows") {
    import org.apache.spark.sql.functions.{col, expr, when}
    val idx = Similarity.ivfIndex(emb, "vec_id", "embedding", nlist = 8)
    val p = freshDir("idx-chunk")
    IndexStore.saveIvf(idx, p)
    val good = spark.read.parquet(s"$p/cells")
    // a lost row (partial write) can never load as a smaller quantizer
    good.filter(col("cid") =!= 3).write.mode("overwrite")
      .parquet(s"$p-missing/cells")
    spark.read.parquet(s"$p/model").write.mode("overwrite")
      .parquet(s"$p-missing/model")
    spark.read.parquet(s"$p/assigned").write.mode("overwrite")
      .parquet(s"$p-missing/assigned")
    val miss = intercept[IllegalArgumentException](
      IndexStore.loadIvf(spark, s"$p-missing"))
    assert(miss.getMessage.contains("exactly 8"))
    // a doubled write (same count, duplicate ids) is caught by the id
    // check, not silently resolved by picking one of the copies
    good.filter(col("cid") < 4)
      .union(good.filter(col("cid") < 4))
      .write.mode("overwrite").parquet(s"$p-dup/cells")
    spark.read.parquet(s"$p/model").write.mode("overwrite")
      .parquet(s"$p-dup/model")
    spark.read.parquet(s"$p/assigned").write.mode("overwrite")
      .parquet(s"$p-dup/assigned")
    val dup = intercept[IllegalArgumentException](
      IndexStore.loadIvf(spark, s"$p-dup"))
    assert(dup.getMessage.contains("duplicate or out-of-range"))
    // a ragged centroid (wrong dim) is caught per chunk
    good.select(col("cid"), when(col("cid") === 2,
        expr("slice(centroid, 1, 5)")).otherwise(col("centroid")).as("centroid"))
      .write.mode("overwrite").parquet(s"$p-ragged/cells")
    spark.read.parquet(s"$p/model").write.mode("overwrite")
      .parquet(s"$p-ragged/model")
    spark.read.parquet(s"$p/assigned").write.mode("overwrite")
      .parquet(s"$p-ragged/assigned")
    val rag = intercept[IllegalArgumentException](
      IndexStore.loadIvf(spark, s"$p-ragged"))
    assert(rag.getMessage.contains("components"))
  }
}
