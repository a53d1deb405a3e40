package graft

import graft.operators.Retrieval
import org.apache.spark.sql.functions._

/** BM25 scoring + ranked search (operators.Retrieval).
  *
  * The micro-corpus pin computes the Okapi formula by hand — idf and the
  * length norm from first principles — so a drift in k1/b, the idf
  * variant, or the dl/avgdl bookkeeping turns the suite red independently
  * of the DuckDB oracle (which shares the formula text and would drift
  * WITH a same-sided edit).
  */
class RetrievalSpec extends SparkSpec {

  import spark.implicits._

  // 3 docs, no stopwords, engineered so every statistic is obvious:
  //   d0: "x x y"  (dl=3)   d1: "x z"  (dl=2)   d2: "y y y z"  (dl=4)
  // N=3, ntok=9, avgdl=3.  df: x=2, y=2, z=2.
  private lazy val micro = Seq(
    (0L, "x x y"), (1L, "x z"), (2L, "y y y z")
  ).toDF("doc_id", "text")

  private def handBm25(tf: Long, df: Long, dl: Long,
                       n: Long = 3, avgdl: Double = 3.0): Double = {
    val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    val s = idf * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl))))
    BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("bm25 micro-corpus matches the hand-computed Okapi formula") {
    val got = Retrieval.bm25(micro)
      .collect()
      .map(r => ((r.getLong(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    val expected = Map(
      (0L, "x") -> (2L, 2L, 3L), (0L, "y") -> (1L, 2L, 3L),
      (1L, "x") -> (1L, 2L, 2L), (1L, "z") -> (1L, 2L, 2L),
      (2L, "y") -> (3L, 2L, 4L), (2L, "z") -> (1L, 2L, 4L))
    assert(got.keySet === expected.keySet)
    for ((k, (tf, df, dl)) <- expected) {
      val (gtf, gdf, gdl, score) = got(k)
      assert((gtf, gdf, gdl) === ((tf, df, dl)), s"stats for $k")
      assert(score === handBm25(tf, df, dl), s"score for $k")
    }
  }

  test("bm25 tf saturation and length normalization orderings hold") {
    val sc = Retrieval.bm25(micro).collect()
      .map(r => ((r.getLong(0), r.getString(1)), r.getDouble(5))).toMap
    // same term, same df: tf=2 in the shorter doc beats tf=1
    assert(sc((0L, "x")) > sc((1L, "x")))
    // same (term, tf, df): the shorter doc scores higher (dl norm)
    assert(sc((1L, "z")) > sc((2L, "z")))
    // saturation: tf 3 vs 1 gains less than 3x
    assert(sc((2L, "y")) < 3.0 * sc((0L, "y")))
  }

  test("bm25Search ranks by summed score, excludes self, breaks ties by doc_id") {
    val qs = Seq((0L, "x"), (0L, "y"), (9L, "z")).toDF("q_id", "term")
    val got = Retrieval.bm25Search(micro, qs, k = 2)
      .orderBy("q_id", "rnk")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    // q0 = {x, y}: candidates d1 (x) and d2 (y); d0 excluded (self)
    val q0 = got.filter(_._1 == 0L)
    assert(q0.map(_._3).toSeq === Seq(
      if (handBm25(1, 2, 2) >= handBm25(3, 2, 4)) 1L else 2L,
      if (handBm25(1, 2, 2) >= handBm25(3, 2, 4)) 2L else 1L))
    assert(q0.forall(_._4 == 1L)) // one matched term each
    // q9 = {z}: both z docs rank, d1 (shorter) first
    val q9 = got.filter(_._1 == 9L)
    assert(q9.map(r => (r._2, r._3)).toSeq === Seq((1L, 1L), (2L, 2L)))
    // the emitted score is the exact long-sum / 1e6 of per-term scores
    assert(q9.head._5 === handBm25(1, 2, 2))
  }

  test("upsert maintenance == from-scratch rebuild, incl. the all-stopword edge") {
    // replace d1's text and wipe d2 to pure stopwords: the merged tf must
    // equal re-tokenizing the post-update corpus, d2 vanishing from the
    // postings while still counting in N (avgdl's denominator)
    val changed = Seq((1L, "y y"), (2L, "the of and")).toDF("doc_id", "text")
    val after = Seq((0L, "x x y"), (1L, "y y"), (2L, "the of and"))
      .toDF("doc_id", "text")
    val merged = Retrieval.bm25FromStats(
        Retrieval.upsertTermFreq(Retrieval.termFreq(micro), changed),
        micro.agg(count(lit(1)).as("n")))
      .collect().map(_.toString).sorted.toSeq
    val rebuilt = Retrieval.bm25(after)
      .collect().map(_.toString).sorted.toSeq
    assert(merged.nonEmpty && merged === rebuilt)
    // d2 contributed no postings; d0/d1 rows exist
    assert(!merged.exists(_.startsWith("[2,")))
    assert(merged.exists(_.startsWith("[0,")) && merged.exists(_.startsWith("[1,")))
  }

  test("hybrid RRF: fused rank positions reproduce the tower ranks by hand") {
    val got = SparkEntry.queries("q_hybrid_rrf")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))
    assert(got.nonEmpty)
    val byQ = got.groupBy(_._1)
    // every query emits exactly 3 ranked rows, rnk 1..3, rrf non-increasing
    for ((q, rows) <- byQ) {
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === Seq(1L, 2L, 3L), s"ranks for q=$q")
      assert(sorted.map(_._5).toSeq == sorted.map(_._5).sorted.reverse.toSeq,
        s"rrf monotone for q=$q")
      // self never retrieved by either tower
      assert(rows.forall(r => r._3 != q))
    }
    // rrf values are sums of 1/(60+r) terms with r in [1, 10]: bounds
    assert(got.forall(r => r._5 > 0.0 && r._5 <= 2.0 / 61.0 + 1e-9))
    // a 'both' hit must beat any single-tower hit made from the same
    // ranks, and the corpus (dense covers every doc at this sf) should
    // produce at least one fused verdict of each kind across queries
    val srcs = got.map(_._4).toSet
    assert(srcs.subsetOf(Set("both", "sparse", "dense")))
    assert(srcs.contains("both") || srcs.contains("dense"))
  }

  test("phraseSearch: contiguity, overlap counting, repeated-term phrases") {
    // d0 has "a b a b a": "a b a" occurs at starts 1 and 3 (OVERLAPPING
    // occurrences both count); d1 has the tokens but never contiguously;
    // d2 has one occurrence mid-document.
    val docs = Seq(
      (0L, "a b a b a"),
      (1L, "a x b y a z"),
      (2L, "z z a b a z")
    ).toDF("doc_id", "text")
    val post = Retrieval.positionalPostings(docs)
    val phrase = Seq((9L, "a", 1), (9L, "b", 2), (9L, "a", 3))
      .toDF("q_id", "term", "off")
    val got = Retrieval.phraseSearch(post, phrase, phraseLen = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === Map((9L, 0L) -> 2L, (9L, 2L) -> 1L))
    // bag-of-words would match d1 (all terms present) — adjacency must not
    assert(!got.contains((9L, 1L)))
    // positions are 1-based and stopwords are KEPT (adjacency would
    // break if the indexed positions skipped them)
    val p = post.filter(col("doc_id") === 0L && col("pos") === 1L).collect()
    assert(p.length === 1 && p(0).getString(1) === "a")
  }

  test("bm25Search on the real corpus: every query returns k ranked rows") {
    val docs = Tables.documents(spark, sf)
    val qids = docs.filter(col("doc_id") % 31 === 3)
      .select(col("doc_id").as("q_id"))
    val res = Retrieval.bm25Search(docs,
      Retrieval.probeTerms(docs, qids), k = 3).cache()
    val perQ = res.groupBy("q_id").agg(count(lit(1)).as("n"),
      max("rnk").as("maxr"), min("rnk").as("minr")).collect()
    assert(perQ.nonEmpty)
    // this corpus's vocabulary is tiny, so every query has ≥ 3 candidates
    assert(perQ.forall(r => r.getLong(1) == 3 && r.getLong(2) == 3L && r.getLong(3) == 1L))
    // self-exclusion
    assert(res.filter(col("q_id") === col("doc_id")).count() === 0)
    res.unpersist()
  }

  test("decontaminate drops exactly the docs carrying a planted eval phrase verbatim") {
    // eval phrase "secret eval answer" planted VERBATIM in d1 (head) and
    // d3 (mid-doc); d2 carries all three tokens NON-contiguously (the
    // bag-of-words false positive that must survive); d4 shares no
    // tokens; d0 is the eval doc itself (drops — any doc carrying eval
    // text verbatim is leakage, provenance notwithstanding).
    val docs = Seq(
      (0L, "secret eval answer"),
      (1L, "secret eval answer leaked into the crawl"),
      (2L, "secret words then eval words then answer words"),
      (3L, "prefix tokens secret eval answer suffix"),
      (4L, "completely unrelated clean document")
    ).toDF("doc_id", "text")
    val phrase = Seq((0L, "secret", 1), (0L, "eval", 2), (0L, "answer", 3))
      .toDF("q_id", "term", "off")
    val kept = Retrieval.decontaminate(docs, phrase, phraseLen = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L, 4L))
    // idempotence: decontaminating the survivors again drops nothing
    val again = Retrieval.decontaminate(
        docs.filter(col("doc_id").isin(2L, 4L)), phrase, phraseLen = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again === Set(2L, 4L))
  }
}
