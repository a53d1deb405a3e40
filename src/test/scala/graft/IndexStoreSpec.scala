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

  test("a corrupted model dir fails loudly, not with a wrong index") {
    import spark.implicits._
    val p = freshDir("idx-bad")
    Seq((1, 2), (3, 4)).toDF("dim", "tables")
      .write.mode("overwrite").parquet(s"$p/model")
    val e = intercept[IllegalArgumentException](IndexStore.loadLsh(spark, p))
    assert(e.getMessage.contains("exactly one"))
  }
}
