package graft

import graft.operators.{AsOfJoin, Components, Dedup, Sampling, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Contract sweep over the custom operator library on DEGENERATE
  * inputs — empty corpora, empty edge sets, single rows. At 100 TB an
  * empty join side or an empty partition of a new tenant's data is an
  * ordinary Tuesday, and the oracle corpus (driver-generated tables,
  * never empty) exercises none of these paths. The contract asserted
  * here: SEARCH/DEDUP/SAMPLING operators are total — empty in, empty
  * out; TRAINING operators (which must learn state from data) fail
  * loudly with a pointed message, never an unexplained arithmetic or
  * out-of-bounds error.
  */
class DegenerateInputsSpec extends SparkSpec {

  private def emptyEmb: DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Seq[Double])].toDF("vec_id", "embedding")
  }
  private def oneEmb: DataFrame = {
    import spark.implicits._
    Seq((1L, Seq.fill(8)(0.5))).toDF("vec_id", "embedding")
  }
  private def emptyDocs: DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  }

  test("search/pair operators: empty corpus in, empty result out") {
    assert(Similarity.bruteForceTopK(emptyEmb, "vec_id", "embedding", k = 3)
      .count() === 0)
    assert(Similarity.lshTopK(emptyEmb, "vec_id", "embedding", k = 3, dim = 8)
      .count() === 0)
    assert(Similarity.cosineNearDupPairs(emptyEmb, "vec_id", "embedding", 0.9)
      .count() === 0)
    assert(Similarity.bruteForceTopKFor(emptyEmb, oneEmb,
      "vec_id", "embedding", k = 3).count() === 0)
    assert(Dedup.nearDupPairs(emptyDocs, "doc_id", "text").count() === 0)
    assert(Dedup.lshCandidates(emptyDocs, "doc_id", "text").count() === 0)
  }

  test("a single-row corpus yields no pairs and no neighbors") {
    assert(Similarity.bruteForceTopK(oneEmb, "vec_id", "embedding", k = 3)
      .count() === 0)
    assert(Similarity.lshTopK(oneEmb, "vec_id", "embedding", k = 3, dim = 8)
      .count() === 0)
    assert(Similarity.cosineNearDupPairs(oneEmb, "vec_id", "embedding", 0.0)
      .count() === 0)
  }

  test("clustering: empty edge set in, empty components out (both variants)") {
    import spark.implicits._
    val noEdges = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Components.connectedComponents(noEdges, "a", "b").count() === 0)
    assert(Components.connectedComponentsStar(noEdges, "a", "b").count() === 0)
  }

  test("as-of join: an empty side yields no matches, not an error") {
    import spark.implicits._
    val left = Seq((1L, 10L)).toDF("id", "ts")
    val empty = Seq.empty[(Long, Long, Long, Double)]
      .toDF("id", "ts", "seq", "px")
    val one = Seq((1L, 5L, 1L, 2.5)).toDF("id", "ts", "seq", "px")
    // empty build side: every left row survives with a null payload
    val out = AsOfJoin.asOf(left, empty, "id", "ts", "seq", Seq("px"))
    assert(out.count() === 1 && out.filter(col("asof_px").isNull).count() === 1)
    // empty probe side: no output rows
    assert(AsOfJoin.asOf(left.limit(0), one, "id", "ts", "seq", Seq("px"))
      .count() === 0)
  }

  test("sampling: empty input passes through the keyed samplers") {
    val e = emptyDocs
    assert(Sampling.hashSample(e, "doc_id", 0.5).count() === 0)
    assert(Sampling.samplePerKey(e.withColumn("g", lit(1)), "g", "doc_id", 2)
      .count() === 0)
    assert(Sampling.withGlobalRank(e, "pos", col("doc_id")).count() === 0)
    // balancedSample LEARNS stratum floors from the data: empty input is
    // a contract error, stated as such
    val err = intercept[IllegalArgumentException] {
      Sampling.balancedSample(e, "text", "doc_id")
    }
    assert(err.getMessage.contains("empty"))
  }

  test("graph operators refuse an empty corpus with a pointed message") {
    // every Graph entry point divides or mods by the vertex count n;
    // n = 0 must be the contract message, not ArithmeticException
    val e = intercept[IllegalArgumentException] {
      graft.operators.Graph.pageRankScores(emptyDocs, n = 0)
    }
    assert(e.getMessage.contains("empty corpus"), e.getMessage)
  }

  test("training operators refuse an empty corpus with a pointed message") {
    // IVF / SemDeDup / PQ must learn centroids or codebooks; empty
    // training data has no answer — the failure must say WHAT is empty,
    // not surface a bare ArithmeticException or index error from the
    // kernel internals.
    val cases = Seq[(String, () => Any)](
      ("ivfTopK", () =>
        Similarity.ivfTopK(emptyEmb, "vec_id", "embedding", k = 3, nlist = 4)),
      ("semDedupPairs", () =>
        Similarity.semDedupPairs(emptyEmb, "vec_id", "embedding",
          threshold = 0.9, nlist = 4)),
      ("pqTrain", () =>
        Similarity.pqTrain(emptyEmb, "vec_id", "embedding", m = 2, codes = 4)))
    for ((name, run) <- cases) {
      val e = intercept[Exception] { run.apply() }
      val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString("; ")
      assert(msgs.toLowerCase.contains("empty"),
        s"$name on empty corpus: wanted a pointed 'empty' message, got: $msgs")
    }
  }
}
