package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large text corpora.
  *
  * Exact dedup is a keyed group-by (hash shuffle on the dedup key — scales
  * linearly, no driver state). Near-dup detection is MinHash + LSH banding:
  * signatures are computed per-row with codegen'd array expressions (NO
  * shuffle), candidate generation is an equi-join on (band, bandHash) (ONE
  * hash shuffle on band keys), and only the tiny candidate set pays the
  * exact-Jaccard verification. This is the standard scale architecture —
  * at 100 TB the all-pairs alternative is O(n²) and impossible, while this
  * path is O(n·k + candidates).
  *
  * Reference scope: the reference repo (swguo/NCHU.BigData) has no dedup
  * operators; these are north-star LLM-pipeline additions mandated by
  * BASELINE.json, built Spark-first from public MinHash/LSH literature
  * (Broder 1997; Leskovec et al., Mining of Massive Datasets ch.3).
  */
object Dedup {

  /** Distinct word n-gram shingles of a text column.
    * Docs shorter than n words yield a single shingle of the whole text,
    * so they still participate in hashing (never an empty/null array).
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val w = split(text, " ")
    when(size(w) >= n,
      array_distinct(transform(
        sequence(lit(0), size(w) - n),
        i => concat_ws(" ", slice(w, i + lit(1), lit(n))))))
      .otherwise(array(text))
  }

  /** 64-bit hash of a string via two 32-bit murmur passes — the shared
    * shingle/token hash basis for [[shingleHashes]], [[minhashBandKeys]]
    * and [[simhash64]]. Deterministic across executors/runs.
    */
  private def hash64(s: String): Long = {
    import scala.util.hashing.MurmurHash3
    val h1 = MurmurHash3.stringHash(s, 0x9747b28c)
    val h2 = MurmurHash3.stringHash(s, 0x85ebca6b)
    (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
  }

  /** Distinct shingle hashes, computed in one compiled pass per row.
    *
    * Semantically `shingles(text).map(hash64).distinct` — same word
    * splitting (`split(" ", -1)`, trailing empties kept, matching Spark's
    * `split` and DuckDB's `string_split`), same short-doc fallback. Join
    * on the hash, not the string: the [[shingles]] expression tree is
    * interpreted (higher-order functions) and gets re-evaluated up to 3×
    * per row when `explode` infers its size/null filter — measured as the
    * dominant cost of the inverted-index join. Hash collisions across
    * distinct shingles are ~2⁻⁶⁴·pairs and oracle-checked downstream.
    */
  def shingleHashes(text: Column, n: Int = 3): Column = {
    val f = udf { (t: String) =>
      if (t == null) Array(0L)
      else {
        val w = t.split(" ", -1)
        if (w.length < n) Array(hash64(t))
        else {
          val seen = new java.util.HashSet[java.lang.Long]()
          val out = new Array[Long](w.length - n + 1)
          var m = 0
          val sb = new java.lang.StringBuilder
          var i = 0
          while (i + n <= w.length) {
            sb.setLength(0)
            var j = 0
            while (j < n) { if (j > 0) sb.append(' '); sb.append(w(i + j)); j += 1 }
            val h = hash64(sb.toString)
            if (seen.add(h)) { out(m) = h; m += 1 }
            i += 1
          }
          java.util.Arrays.copyOf(out, m)
        }
      }
    }
    f(text)
  }

  /** Fixed affine hash family h_i(x) = a_i*x + b_i over a 31-bit base hash,
    * with 31-bit coefficients — products stay < 2^62, so the arithmetic is
    * overflow-free under ANSI mode (no dependence on session config).
    * Coefficients come from a fixed LCG seed so signatures are
    * deterministic across runs/executors.
    */
  def hashCoeffs(k: Int, seed: Long = 42L): IndexedSeq[(Long, Long)] = {
    var x = seed
    def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x >>> 33 }
    IndexedSeq.fill(k)((next() | 1L, next()))
  }

  /** MinHash-LSH band keys straight from the text column: distinct shingle
    * hashes (same shingling as [[shingleHashes]]), the k = bands×rows
    * signature minima, then one 64-bit mix per band of r consecutive
    * signature entries. Two docs share a band key iff that signature slice
    * is identical — P(share ≥1 band | Jaccard=s) = 1-(1-s^r)^bands.
    *
    * ONE Scala UDF per row (narrow, no shuffle, embarrassingly parallel).
    * The expression-tree formulation (k=128 `array_min(transform(...))`
    * subtrees inlined into 32 band-hash expressions, then duplicated across
    * both sides of the candidate self-join) produced a >10 MiB plan that
    * froze Catalyst/codegen for minutes; the closure keeps the plan tiny
    * and does the same O(shingles·k) work in a tight loop.
    */
  def minhashBandKeys(text: Column, shingleN: Int, bands: Int, rows: Int,
                      seed: Long = 42L): Column = {
    val coeffs = hashCoeffs(bands * rows, seed).toArray
    val n = shingleN
    val bandKeys = udf { (t: String) =>
      val k = coeffs.length
      val sig = Array.fill(k)(Long.MaxValue)
      val seen = new java.util.HashSet[java.lang.Long]()
      def feed(h64v: Long): Unit = if (seen.add(h64v)) {
        // Universal hash family (a_i*h + b_i) mod p, p = 2^31-1: the mod is
        // ESSENTIAL — without it a_i*h+b_i is monotone in h, every
        // "permutation" shares one argmin, and the whole signature
        // degenerates to a function of min(h) (recall ≈ J instead of ≈ 1;
        // measured 253/256 pairs at sf0.1). 31-bit h and coeffs keep
        // a*h+b < 2^62 — overflow-free under ANSI, deterministic across
        // executors.
        val h = (h64v & Long.MaxValue) % 2147483647L
        var i = 0
        while (i < k) {
          val v = (coeffs(i)._1 * h + coeffs(i)._2) % 2147483647L
          if (v < sig(i)) sig(i) = v
          i += 1
        }
      }
      if (t == null) feed(0L)
      else {
        val w = t.split(" ", -1)
        if (w.length < n) feed(hash64(t))
        else {
          val sb = new java.lang.StringBuilder
          var i = 0
          while (i + n <= w.length) {
            sb.setLength(0)
            var j = 0
            while (j < n) { if (j > 0) sb.append(' '); sb.append(w(i + j)); j += 1 }
            feed(hash64(sb.toString))
            i += 1
          }
        }
      }
      Array.tabulate(bands) { j =>
        var acc = j.toLong * -7046029254386353131L
        var r = 0
        while (r < rows) {
          acc = (acc ^ sig(j * rows + r)) * -4417276706812531889L
          acc ^= (acc >>> 32)
          r += 1
        }
        acc
      }
    }
    bandKeys(text)
  }

  /** Candidate near-dup pairs from LSH banding.
    * Input: df with an id column and a text column. Output: (a_id, b_id)
    * distinct candidate pairs, a_id < b_id.
    *
    * Scale shape: explode → self-equi-join on the band hash → distinct.
    * The join shuffles by band key only; a true near-dup cluster of size m
    * produces m² pairs inside one bucket, which AQE's skew handling splits
    * if a bucket is pathological (e.g. an empty-string cluster).
    */
  def lshCandidates(df: DataFrame, idCol: String, textCol: String,
                    shingleN: Int = 3, bands: Int = 32, rows: Int = 4,
                    seed: Long = 42L): DataFrame = {
    val keys = minhashBandKeys(col(textCol), shingleN, bands, rows, seed)
    // fan out the (small-scan-gated) input before the per-doc MinHash
    // kernel — see Layout.fanOutSmall (the scan split floor otherwise
    // runs the whole banding in ~1 task on a tiny corpus file)
    val banded = Layout.fanOutSmall(df)
      .select(col(idCol).as("id"), explode(keys).as("bh"))
    banded.as("l").join(banded.as("r"),
        col("l.bh") === col("r.bh") && col("l.id") < col("r.id"))
      .select(col("l.id").as("a_id"), col("r.id").as("b_id"))
      .distinct()
  }

  /** Exact word-n-gram Jaccard similarity for given (a_id, b_id) pairs.
    * Joins the pair list back to per-doc shingle-hash sets (shuffle join on
    * id — broadcast-able when the candidate set is small, which LSH
    * guarantees) and evaluates |A∩B|/|A∪B| with array intersects over the
    * long hashes (cheaper than string arrays; collision-exact in practice).
    */
  def jaccardForPairs(pairs: DataFrame, docs: DataFrame, idCol: String,
                      textCol: String, shingleN: Int = 3): DataFrame = {
    val sets = Layout.fanOutSmall(docs).select(col(idCol).as("id"),
      shingleHashes(col(textCol), shingleN).as("sh"))
    pairs
      .join(sets.withColumnRenamed("sh", "sh_a"), col("a_id") === col("id"))
      .drop("id")
      .join(sets.withColumnRenamed("sh", "sh_b"), col("b_id") === col("id"))
      .drop("id")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("inter")).cast("double"))
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** The n-proportional AT-REST state of the LSH dedup index: the
    * exploded (id, bh) band rows — [[lshCandidates]]' join input,
    * exposed so a pipeline can persist it once per corpus epoch (plain
    * parquet, `bands` rows per doc) and dedup each later crawl
    * increment against it incrementally ([[incrementalNearDupPairs]])
    * instead of re-banding the historical corpus per batch. The same
    * sufficient-statistic role [[graft.operators.Retrieval.termFreq]]
    * plays for the lexical index.
    */
  def bandRows(df: DataFrame, idCol: String, textCol: String,
               shingleN: Int = 3, bands: Int = 32, rows: Int = 4,
               seed: Long = 42L): DataFrame =
    Layout.fanOutSmall(df).select(col(idCol).as("id"),
      explode(minhashBandKeys(col(textCol), shingleN, bands, rows, seed))
        .as("bh"))

  /** Maintain a persisted [[bandRows]] state under re-crawls — the
    * [[graft.operators.Retrieval.upsertTermFreq]] shape: drop every old
    * band row of a re-ingested id (one anti-join on id), append the
    * batch's freshly-computed bands. O(batch + index); the historical
    * corpus is never re-tokenized.
    */
  def upsertBandRows(oldBands: DataFrame, batch: DataFrame,
                     idCol: String, textCol: String,
                     shingleN: Int = 3, bands: Int = 32, rows: Int = 4,
                     seed: Long = 42L): DataFrame =
    oldBands.join(batch.select(col(idCol).as("id")).distinct(),
        Seq("id"), "left_anti")
      .unionAll(bandRows(batch, idCol, textCol, shingleN, bands, rows, seed))

  /** DELETION maintenance for the dedup band state — [[upsertBandRows]]'
    * tombstone twin (build / upsert / DELETE): a retracted or erased
    * document's band rows leave the persisted state by one id-keyed
    * LEFT ANTI join, O(deleted + index). Banding is a pure per-doc
    * function, so the result is BIT-IDENTICAL to re-banding the
    * surviving corpus (q_dedup_delete gates that identity), and
    * delete-then-reinsert round-trips (DeleteSpec).
    */
  def deleteBandRows(oldBands: DataFrame, deletedIds: DataFrame,
                     idCol: String): DataFrame =
    oldBands.join(deletedIds.select(col(idCol).as("id")).distinct(),
      Seq("id"), "left_anti")

  /** INCREMENTAL near-dup detection: all verified pairs TOUCHING a new
    * document batch — batch-vs-historical-corpus plus batch-internal —
    * against a PERSISTED [[bandRows]] state. The at-scale ingest shape:
    * each increment pays O(batch bands) banding plus band-key equi-joins
    * whose left side is batch-sized, never a re-band or self-join of the
    * historical corpus (`oldBands` streams through the join shuffle
    * once). `corpus` supplies the shingle sets for the exact verify —
    * only candidate ids are looked up (the LSH bound keeps that set
    * linear in the batch's true dup count).
    *
    * `oldBands` is the historical corpus's CURRENT band state. Rows it
    * holds for ids that reappear in `batch` (a re-crawl) are harmless:
    * the id-inequality keeps self-pairs out, and every candidate is
    * verified against `corpus`'s current texts — but keeping the state
    * fresh is [[upsertBandRows]]' job, and dedup recall against OTHER
    * re-crawled docs is only as current as the state passed in.
    * Recall: identical s-curve to [[nearDupPairs]] (same bands/rows), so
    * at threshold 0.8 the output equals the true touching-pair set for
    * practical purposes — q_dedup_incr's oracle states exactly that:
    * the all-pairs ground truth restricted to pairs with a batch
    * endpoint.
    */
  def incrementalNearDupPairs(oldBands: DataFrame, batch: DataFrame,
                              idCol: String, textCol: String,
                              corpus: DataFrame, threshold: Double = 0.8,
                              shingleN: Int = 3, bands: Int = 32,
                              rows: Int = 4, seed: Long = 42L): DataFrame = {
    val nb = bandRows(batch, idCol, textCol, shingleN, bands, rows, seed)
    // batch × historical candidates (either orientation) + batch-internal
    val cross = nb.as("l").join(oldBands.as("r"), col("l.bh") === col("r.bh") &&
        col("l.id") =!= col("r.id"))
      .select(least(col("l.id"), col("r.id")).as("a_id"),
        greatest(col("l.id"), col("r.id")).as("b_id"))
    val intra = nb.as("l").join(nb.as("r"),
        col("l.bh") === col("r.bh") && col("l.id") < col("r.id"))
      .select(col("l.id").as("a_id"), col("r.id").as("b_id"))
    jaccardForPairs(cross.unionAll(intra).distinct(), corpus, idCol, textCol,
        shingleN)
      .filter(col("jaccard") >= threshold)
  }

  /** Near-duplicate pairs: LSH candidates re-verified with exact Jaccard ≥
    * threshold. With bands=32/rows=4 the LSH s-curve midpoint is ≈0.42, so
    * recall at threshold 0.8 is 1-(1-0.8⁴)³² ≈ 1-2.6e-11 — the verified
    * output equals the true pair set for practical purposes, which is what
    * makes it oracle-checkable against an all-pairs reference query.
    */
  def nearDupPairs(df: DataFrame, idCol: String, textCol: String,
                   threshold: Double = 0.8, shingleN: Int = 3,
                   bands: Int = 32, rows: Int = 4): DataFrame = {
    val cands = lshCandidates(df, idCol, textCol, shingleN, bands, rows)
    jaccardForPairs(cands, df, idCol, textCol, shingleN)
      .filter(col("jaccard") >= threshold)
  }

  /** Exact all-pairs n-gram Jaccard ≥ threshold, with a STATS-DRIVEN plan
    * choice (AQE-spirited: decide the physical shape from the measured df
    * histogram, not from guesses).
    *
    * One cheap partial-aggregated count finds "hot" shingles (document
    * frequency > hotDf). Two regimes:
    *
    *   - '''No hot shingles''' (flat df — e.g. the testdata: max df 25 at
    *     sf0.1): the count-based inverted-index join IS the optimal exact
    *     plan. Pair-rows are Σ df(h)² ≤ occurrences·hotDf — bounded
    *     linear — and jaccard falls out of the match COUNTS, so no
    *     shingle array ever travels through a shuffle and no verify pass
    *     exists. The self-join is hinted shuffle_hash so both sides are
    *     the IDENTICAL exchange and ReuseExchange runs the shingle UDF
    *     once (a broadcast join would make the sides asymmetric and
    *     re-execute the whole subtree per side — measured 7 scans).
    *   - '''Hot shingles present''': PPJoin-style prefix filtering
    *     (Bayardo et al., WWW'07; Xiao et al., WWW'08). Order each set by
    *     the global total order (isHot, hash); if J(x,y) ≥ t the
    *     globally-smallest common element must sit within the first
    *     |x|−⌈t·|x|⌉+1 elements of BOTH sets (were it in x's suffix, all
    *     common elements would be — but the suffix holds only ⌈t·|x|⌉−1).
    *     ANY total order satisfies the theorem; this one keeps the df²
    *     killers out of candidate generation entirely — a hot shingle
    *     reaches a prefix only in docs that are ≥(1−t) hot, i.e.
    *     near-boilerplate that genuinely is near-duplicate material.
    *     Candidates are then verified against the full sets.
    *
    * Both paths emit exactly the all-pairs ground truth.
    *
    * @param hotDf df threshold splitting the regimes. The driver-side hot
    *   set is bounded by occurrences/hotDf — the stopword-list exception,
    *   like k-means' k×dim centroids.
    */
  def exactJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        threshold: Double, shingleN: Int = 3,
                        hotDf: Int = 256): DataFrame = {
    val sets = Layout.fanOutSmall(df).select(col(idCol).as("id"),
      shingleHashes(col(textCol), shingleN).as("sh"))
    val inv = sets.select(col("id"), size(col("sh")).as("sz"),
      explode(col("sh")).as("h"))
    // Hot detection runs on a deterministic 10% doc sample (xxhash64,
    // never rand()): a shingle with df ≫ hotDf is caught with near
    // certainty, and EXACTNESS never depends on the hot-set choice (the
    // order stays total either way — a borderline df ≈ hotDf miss only
    // relaxes the candidate bound by a small constant). 10× cheaper than
    // an exact df pass, and the cost of the stats job is what makes the
    // adaptive plan choice worth having.
    val hotSet: Set[Long] = df
      .filter(pmod(xxhash64(col(idCol)), lit(10)) === 0)
      .select(explode(shingleHashes(col(textCol), shingleN)).as("h"))
      .groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") > math.max(hotDf / 10, 1))
      .select("h").collect().map(_.getLong(0)).toSet
    if (hotSet.isEmpty) {
      // flat-df regime: count-join, one reused exchange, no arrays shuffled
      inv.as("a").hint("shuffle_hash")
        .join(inv.as("b"),
          col("a.h") === col("b.h") && col("a.id") < col("b.id"))
        .groupBy(col("a.id").as("a_id"), col("b.id").as("b_id"),
          col("a.sz").as("sza"), col("b.sz").as("szb"))
        .agg(count(lit(1)).as("inter"))
        .withColumn("jaccard", col("inter").cast("double") /
          (col("sza") + col("szb") - col("inter")).cast("double"))
        .filter(col("jaccard") >= threshold)
        .select(col("a_id"), col("b_id"), col("jaccard"))
    } else {
      val prefixOf = udf { (sh: Seq[Long]) =>
        val sz = sh.length
        // ceil(sz*t) with an epsilon guard: IEEE can put sz*t a hair
        // ABOVE the true integer (5×0.8 → 4.0000000000000002), which
        // would shorten the prefix and silently lose exactness; the
        // epsilon errs toward a longer prefix, which only adds candidates.
        val px = sz - math.ceil(sz * threshold - 1e-9).toInt + 1
        sh.sortBy(h => (hotSet.contains(h), h)).take(math.max(px, 0)).toArray
      }
      val prefix = sets.select(col("id"),
        explode(prefixOf(col("sh"))).as("h"))
      val cands = prefix.as("a").hint("shuffle_hash")
        .join(prefix.as("b"),
          col("a.h") === col("b.h") && col("a.id") < col("b.id"))
        .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
        .distinct()
      cands
        .join(sets.select(col("id"), col("sh").as("sh_a")), col("a_id") === col("id"))
        .drop("id")
        .join(sets.select(col("id"), col("sh").as("sh_b")), col("b_id") === col("id"))
        .drop("id")
        .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
        .withColumn("jaccard",
          col("inter").cast("double") /
            (size(col("sh_a")) + size(col("sh_b")) - col("inter")).cast("double"))
        .filter(col("jaccard") >= threshold)
        .select(col("a_id"), col("b_id"), col("jaccard"))
    }
  }

  /** Oracle-portable token hash: two independent polynomial rolling hashes
    * over the token's CODEPOINTS (not UTF-16 units — matches external
    * engines' character indexing for all of Unicode), packed into 61 bits
    * as (h1 << 31) | h2. Integer-only arithmetic, bit-identical in any
    * engine: external SQL can replicate it with a list fold over
    * per-character codepoints, which a seeded MurmurHash3 basis cannot.
    * Bits 30/61/62/63 are structurally 0 — constant across docs, so they
    * contribute nothing to SimHash hamming distances (documented, not a
    * correctness issue).
    */
  def polyHash62(s: String): Long = {
    var h1 = 0L
    var h2 = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h1 = (h1 * 131 + cp) % 1000000007L
      h2 = (h2 * 137 + cp) % 998244353L
      i += Character.charCount(cp)
    }
    (h1 << 31) | h2
  }

  /** 64-bit SimHash (Charikar 2002) over a token array, term-frequency
    * weighted. Scala UDF (simple bit loop — not worth a codegen Expression
    * at 64 iterations/token); [[polyHash62]] basis so an external SQL
    * oracle can replicate the fingerprint bit-for-bit.
    */
  def simhash64Value(tokens: Seq[String]): Long = {
    val counts = new Array[Int](64)
    if (tokens != null) tokens.foreach { t =>
      val h = polyHash62(t)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  val simhash64 = udf(simhash64Value _)

  /** SimHash near-dup pairs: band the 64-bit fingerprint into
    * maxHamming+1 chunks (pigeonhole: hamming ≤ maxHamming ⇒ at least one
    * chunk identical — so candidate generation is COMPLETE, not
    * probabilistic), join on chunk equality, verify with
    * bit_count(a^b) ≤ maxHamming. The output is therefore EXACTLY the
    * all-pairs hamming-≤-maxHamming set, which makes it checkable against
    * an all-pairs SQL oracle, while the plan only ever shuffles by chunk
    * key — the same join-on-band scale shape as MinHash LSH.
    */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3): DataFrame = {
    // 0..63: negative died with a bare '/ by zero' below; ≥ 64 cannot
    // be pigeonhole-complete (64 chunks cover ≤ 63 differing bits), so
    // the "EXACTLY the all-pairs hamming set" guarantee would silently
    // break
    require(maxHamming >= 0 && maxHamming < 64,
      s"maxHamming must be in [0, 63], got $maxHamming")
    val fp = Layout.fanOutSmall(df).select(col(idCol).as("id"),
      simhash64(split(col(textCol), " ")).as("fp"))
    val nChunks = math.min(maxHamming + 1, 64)
    val base = 64 / nChunks
    val extra = 64 % nChunks
    val offsets = (0 until nChunks)
      .scanLeft(0)((acc, ci) => acc + base + (if (ci < extra) 1 else 0))
    val chunkCols = (0 until nChunks).map { ci =>
      val w = base + (if (ci < extra) 1 else 0)
      val mask = if (w == 64) -1L else (1L << w) - 1L
      struct(lit(ci).as("ci"), shiftrightunsigned(col("fp"), offsets(ci))
        .bitwiseAND(lit(mask)).as("ck"))
    }
    val chunked = fp.select(col("id"), col("fp"),
      explode(array(chunkCols: _*)).as("c"))
      .select(col("id"), col("fp"), col("c.ci"), col("c.ck"))
    chunked.as("l").join(chunked.as("r"),
        col("l.ci") === col("r.ci") && col("l.ck") === col("r.ck") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("a_id"), col("r.id").as("b_id"),
        col("l.fp").as("fp_a"), col("r.fp").as("fp_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming"))
  }

  /** All contiguous n-word windows of a words-array column, each joined
    * with single spaces — the ONE definition of word n-gram windowing
    * (callers: [[dupNgrams]]; CurationQueries.repExpr), because the
    * unguarded formulation has a sharp edge every copy must remember:
    * for a doc shorter than n words, Spark's sequence(1, size−(n−1))
    * generates a DESCENDING sequence (sequence(1, 0) = [1, 0]) and the
    * i = 0 window then FAILS the whole query in slice ("SQL array
    * indices start at 1" — a loud job error, not silent bogus rows),
    * while e.g. DuckDB's generate_series returns empty for the same
    * bounds. The guard makes short docs contribute no windows, which is
    * both the cross-engine-stable and the semantically right answer.
    */
  def wordNgrams(w: Column, n: Int): Column = {
    require(n >= 1, s"window width must be >= 1, got $n")
    when(size(w) >= n,
      transform(sequence(lit(1), size(w) - (n - 1)),
        i => array_join(slice(w, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Duplicated-substring detection (boilerplate mining) — the
    * SEQUENCE-level counterpart of the document-level operators above:
    * word n-grams appearing in ≥ `minDocs` DISTINCT documents, with doc
    * and occurrence counts as `(ngram, n_docs, n_occ)`. Document-level
    * dedup misses boilerplate shared across otherwise-distinct documents
    * (headers, licenses, templates) — exactly the repeated-substring
    * class Lee et al. 2022 ("Deduplicating Training Data Makes Language
    * Models Better", ExactSubstr) remove at the sequence level;
    * suffix-array ExactSubstr's arbitrary-length spans reduce to a
    * sweep over window widths of this operator.
    *
    * Plan shape: one explode of the per-doc window list, then ONE
    * groupBy(ngram) whose count-distinct rewrite pre-aggregates on
    * (ngram, doc_id) — within-doc repeats collapse map-side before the
    * shuffle — and the `minDocs` filter prunes the singleton tail after
    * the final agg. At 100 TB the same plan holds (the shuffle key is
    * the ngram text; a deployment needing only the hot tail adds a
    * count-min / TopKPerKey pre-pass).
    *
    * Docs shorter than n words contribute NO windows — see
    * [[wordNgrams]] for why the guard is load-bearing.
    */
  def dupNgrams(df: DataFrame, idCol: String, textCol: String,
                n: Int = 8, minDocs: Int = 2): DataFrame = {
    require(minDocs >= 1, s"minDocs must be >= 1, got $minDocs")
    val grams = wordNgrams(split(col(textCol), " "), n)
    Layout.fanOutSmall(df)
      .select(col(idCol).as("doc_id"), explode(grams).as("ngram"))
      .groupBy("ngram")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"))
      .filter(col("n_docs") >= minDocs)
  }

  /** Duplicated-span REMOVAL — the actual Lee et al. 2022 ExactSubstr
    * deliverable ([[dupNgrams]] only DETECTS): rewrite each document
    * with every occurrence of a cross-document duplicated n-word span
    * excised, overlapping spans merged. Removing (not just flagging)
    * repeated sequences is what the paper shows improves the trained
    * model — boilerplate shared across otherwise-distinct documents
    * survives document-level dedup entirely.
    *
    * Span semantics: a word window of width `n` is duplicated when its
    * ngram occurs in ≥ `minDocs` DISTINCT documents; EVERY occurrence
    * (in every holding doc) is removed, the paper's symmetric rule —
    * dropping "all but one" would need an arbitrary survivor pick that
    * the next crawl would reshuffle. Overlap merging needs no interval
    * algebra: each duplicated start expands to its n covered word
    * positions (a bounded ×n explode) and the covered-position UNION
    * (`distinct`) IS the merged span set — adjacent/overlapping spans
    * cover one contiguous run.
    *
    * Plan shape (all-relational, every step linear in corpus size):
    * tokenize with positions (one posexplode), window starts (one
    * explode), ONE groupBy(ngram) with a map-side-combining distinct
    * count for the duplicated-ngram set, an equi-join of windows
    * against that set, the ×n covered-position expansion, one LEFT ANTI
    * equi-join on (doc_id, pos), and a final groupBy(doc_id) that
    * reassembles surviving words in position order. No window function,
    * no range join, no per-doc state beyond the doc itself — the same
    * shuffle keys (ngram, then doc_id) at 100 TB. Docs whose every word
    * is covered still ship (empty text, n_kept 0) via the left join
    * back to the corpus — silently dropping a fully-boilerplate doc
    * would misreport the corpus row count downstream.
    *
    * Output: (doc_id, text, n_words, n_kept) — `text` the cleaned doc,
    * `n_words` the pre-removal width, so n_words − n_kept is the
    * per-doc removal count and their corpus sums are the audit totals.
    */
  // --- shared plumbing of the two span-removal operators -------------
  // One definition of the tokenize/window/reassemble stages so the two
  // removal rules (cross-doc, intra-doc) differ ONLY in how they derive
  // the covered-position set — a tokenizer or audit-contract change
  // cannot silently diverge between them.

  /** (doc_id, ws): the per-doc word array both removals window over. */
  private def wordsOf(df: DataFrame, idCol: String, textCol: String) =
    Layout.fanOutSmall(df)
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("ws"))

  /** (doc_id, pos, word), pos 1-based — one narrow posexplode. */
  private def positionedTokens(base: DataFrame): DataFrame = base
    .select(col("doc_id"), posexplode(col("ws")).as(Seq("p", "word")))
    .select(col("doc_id"), (col("p") + 1).as("pos"), col("word"))

  /** (doc_id, start, h, h2): window starts keyed by a 128-bit n-gram
    * fingerprint — TWO independent xxhash64 values (the second seeded by
    * a salt column). Window EQUALITY runs on the fingerprint, never the
    * ~n-word string: the duplicated-window detection is the
    * corpus-dominant shuffle (one row per window), and a 16-byte key vs
    * a ~50-byte string is still most of its exchange volume. 64 bits
    * alone are NOT enough for an operator documented as exact (VERDICT
    * r15 advice): at the 100 TB target (~10^13 windows) birthday
    * collisions under 2^-64 are expected in the MILLIONS of pairs, each
    * silently excising a non-duplicated span. At 2^-128 per pair the
    * corpus-wide expectation is C(10^13,2)/2^128 ≈ 1.5e-13 false merges
    * — zero for any real run, with no string carried through the
    * shuffle and no second-pass confirm join.
    */
  private def hashedWindows(base: DataFrame, n: Int): DataFrame = base
    .select(col("doc_id"), posexplode(wordNgrams(col("ws"), n))
      .as(Seq("p", "ngram")))
    .select(col("doc_id"), (col("p") + 1).as("start"),
      xxhash64(col("ngram")).as("h"),
      xxhash64(lit("graft.substr.salt"), col("ngram")).as("h2"))

  /** Expand (doc_id, `c`) starts to their n covered positions, deduped —
    * the union IS the merged span set, no interval algebra.
    */
  private def spanPositions(starts: DataFrame, c: String, n: Int): DataFrame =
    starts.select(col("doc_id"),
        explode(sequence(col(c), col(c) + lit(n - 1))).as("pos"))
      .distinct()

  /** Drop covered positions, reassemble survivors in position order, and
    * re-attach every corpus doc (fully-covered docs ship as empty rows —
    * silently dropping one would misreport the corpus row count).
    * Output: (doc_id, text, n_words, n_kept) — n_words − n_kept is the
    * per-doc removal count and their corpus sums are the audit totals.
    */
  private def removeCovered(base: DataFrame, tokens: DataFrame,
                            covered: DataFrame): DataFrame = {
    val kept = tokens.join(covered, Seq("doc_id", "pos"), "left_anti")
      .groupBy("doc_id")
      .agg(array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("word")))),
            x => x("word")), " ").as("kept_text"),
        count(lit(1)).as("n_kept"))
    base.select(col("doc_id"), size(col("ws")).cast("long").as("n_words"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("kept_text"), lit("")).as("text"),
        col("n_words"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  def exactSubstrRemoval(df: DataFrame, idCol: String, textCol: String,
                         n: Int = 8, minDocs: Int = 2): DataFrame = {
    require(n >= 1, s"window width must be >= 1, got $n")
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val base = wordsOf(df, idCol, textCol)
    val wins = hashedWindows(base, n)
    val dups = wins.groupBy("h", "h2")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select("h", "h2")
    val covered = spanPositions(wins.join(dups, Seq("h", "h2")), "start", n)
    removeCovered(base, positionedTokens(base), covered)
  }

  /** INTRA-document repetition removal — the loop-collapse curation
    * step [[exactSubstrRemoval]]'s cross-document rule cannot express:
    * within each document, material belonging to a repeated n-gram's
    * LATER occurrences is excised while the FIRST occurrence survives
    * intact (scraped lyrics/menus/pagination loops repeat a span dozens
    * of times inside one doc; removing every copy — the cross-doc rule —
    * would delete content that legitimately appears once).
    *
    * Exact rule: a word position is removed iff it lies inside some
    * repeated window's NON-FIRST occurrence and inside NO repeated
    * window's first occurrence (the subtraction is what keeps a
    * tight loop's first span whole: in "a a a a a" with n=2 the later
    * starts 2..4 cover positions 2..5, but position 2 belongs to the
    * first occurrence and survives → "a a"). Deterministic — first =
    * min(start) — and overlap/adjacency merging again falls out of the
    * covered-position set algebra, no interval scan.
    *
    * Plan shape, all-relational and linear like the cross-doc variant:
    * windows keyed by (doc_id, 128-bit ngram fingerprint) — 24-byte
    * shuffle keys, same collision bound documented there — one
    * groupBy for (first, n_occ), one self-equi-join for later starts,
    * two bounded ×n expansions, one LEFT ANTI between them, one LEFT
    * ANTI against the tokens, position-ordered reassembly. Shuffle keys
    * are doc-scoped, so at 100 TB every stage co-partitions on doc_id
    * after the first exchange.
    *
    * Output: (doc_id, text, n_words, n_kept) — same audit contract as
    * [[exactSubstrRemoval]].
    */
  def selfSubstrRemoval(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 8, minOcc: Int = 2): DataFrame = {
    require(n >= 1, s"window width must be >= 1, got $n")
    require(minOcc >= 2, s"minOcc must be >= 2, got $minOcc")
    val base = wordsOf(df, idCol, textCol)
    val wins = hashedWindows(base, n)
    val rep = wins.groupBy("doc_id", "h", "h2")
      .agg(min("start").as("first"), count(lit(1)).as("n_occ"))
      .filter(col("n_occ") >= minOcc)
    val later = wins.join(rep, Seq("doc_id", "h", "h2"))
      .filter(col("start") > col("first"))
      .select("doc_id", "start")
    val covered = spanPositions(later, "start", n)
      .join(spanPositions(rep.select("doc_id", "first"), "first", n),
        Seq("doc_id", "pos"), "left_anti")
    removeCovered(base, positionedTokens(base), covered)
  }
}
