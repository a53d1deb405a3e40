package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Retrieval, Similarity}

/** Deletion-maintenance invariants across every index family (VERDICT
  * r15 #5): the tombstone op must (a) leave NO trace of an erased id,
  * (b) touch nothing else, and (c) ROUND-TRIP — delete-then-reinsert of
  * the same rows reproduces the original state exactly (every family's
  * encode path is deterministic under frozen quantizers/config, so the
  * round-trip identity is exact, not approximate). The driver-gated
  * q_*_delete rows pin maintenance == rebuild cross-engine; these specs
  * pin the lifecycle algebra the rows cannot see (reinsert, disjoint-id
  * no-ops).
  */
class DeleteSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf).cache()
  private lazy val emb = Tables.embeddings(spark, sf).cache()

  /** multiset equality via two-way exceptAll */
  private def sameRows(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  test("termFreq/postings: delete leaves no trace, reinsert round-trips") {
    val deleted = docs.filter(pmod(col("doc_id"), lit(7)) === 3)
    val tf = Retrieval.termFreq(docs)
    val del = Retrieval.deleteDocs(tf, deleted)
    assert(deleted.count() > 0)
    // (a) no ghost postings, (b) survivors untouched
    assert(del.join(deleted.select("doc_id"), Seq("doc_id")).isEmpty)
    assert(sameRows(del, Retrieval.termFreq(
      docs.filter(pmod(col("doc_id"), lit(7)) =!= 3))))
    // (c) reinserting the erased docs through the upsert restores the
    // original statistic exactly
    assert(sameRows(Retrieval.upsertTermFreq(del, deleted), tf))
    // positional postings ride the same doc_id-keyed maintenance
    val post = Retrieval.positionalPostings(docs)
    val delP = Retrieval.deleteDocs(post, deleted)
    assert(sameRows(
      delP.unionAll(Retrieval.positionalPostings(deleted)), post))
    // deleting ids absent from the corpus is a no-op
    val ghost = spark.range(1).select((lit(-1L)).as("doc_id"))
    assert(sameRows(Retrieval.deleteDocs(tf, ghost), tf))
  }

  test("band state: delete + reinsert round-trips; disjoint ids are a no-op") {
    val deleted = docs.filter(pmod(col("doc_id"), lit(7)) === 3)
    val bands = Dedup.bandRows(docs, "doc_id", "text")
    val del = Dedup.deleteBandRows(bands, deleted, "doc_id")
    assert(del.join(deleted.select(col("doc_id").as("id")), Seq("id")).isEmpty)
    assert(sameRows(Dedup.upsertBandRows(del, deleted, "doc_id", "text"), bands))
  }

  test("IVF: delete + frozen-quantizer reinsert round-trips the inverted file") {
    val deleted = emb.filter(pmod(col("vec_id"), lit(8)) === 1)
    val idx = Similarity.ivfIndex(emb, "vec_id", "embedding", nlist = 4)
    val del = Similarity.ivfDelete(idx, deleted, "vec_id")
    assert(del.assigned
      .join(deleted.select(col("vec_id").as("nid")), Seq("nid")).isEmpty)
    val back = Similarity.ivfUpsert(del, deleted, "vec_id", "embedding")
    assert(sameRows(back.assigned, idx.assigned))
  }

  test("PQ / IVF-PQ: delete + frozen-codebook reinsert round-trips the code table") {
    val deleted = emb.filter(pmod(col("vec_id"), lit(8)) === 1)
    val model = Similarity.pqTrain(emb, "vec_id", "embedding", m = 8, codes = 16)
    val enc = Similarity.pqEncode(emb, "vec_id", "embedding", model)
    val del = Similarity.pqDelete(enc, deleted, "vec_id")
    assert(del.join(deleted.select(col("vec_id").as("id")), Seq("id")).isEmpty)
    assert(sameRows(
      Similarity.pqUpsert(del, model, deleted, "vec_id", "embedding"), enc))
    val ivfpq = Similarity.ivfPqIndex(emb, "vec_id", "embedding",
      nlist = 4, m = 8, codes = 16)
    val del2 = Similarity.ivfPqDelete(ivfpq, deleted, "vec_id")
    assert(sameRows(
      Similarity.ivfPqUpsert(del2, deleted, "vec_id", "embedding").encoded,
      ivfpq.encoded))
  }

  test("LSH: delete equals rebuild over survivors (data-oblivious identity)") {
    val deleted = emb.filter(pmod(col("vec_id"), lit(8)) === 1)
    val idx = Similarity.lshIndex(emb, "vec_id", "embedding", dim = 64,
      tables = 4, bitsPerTable = 6)
    val del = Similarity.lshDelete(idx, deleted, "vec_id")
    val rebuilt = Similarity.lshIndex(
      emb.filter(pmod(col("vec_id"), lit(8)) =!= 1), "vec_id", "embedding",
      dim = 64, tables = 4, bitsPerTable = 6)
    assert(sameRows(del.banded, rebuilt.banded))
    assert(sameRows(del.slim, rebuilt.slim))
    // reinsert restores the original banded state bit-exactly
    val back = Similarity.lshUpsert(del, deleted, "vec_id", "embedding")
    assert(sameRows(back.banded, idx.banded))
  }
}
