package graft.operators

/** Corpus-cardinality-derived operating points for the IVF / PQ ANN
  * family — the rule that replaces the fixed constants the repo's own
  * history proved decay with scale (round 5: a fixed 50-deep candidate
  * list that passed at 500 vectors fell to 0.448 candidate recall at
  * 2000 — under the contractual 0.5 floor — because a CONSTANT depth is
  * a shrinking FRACTION of a growing scanned set; SURVEY §2C).
  *
  * The three knobs and their scaling laws:
  *
  *   - '''nlist''' (coarse cells): ⌈√n⌉, capped at 65536 — the
  *     published IVF sizing guidance (Jégou et al. PAMI 2011 §V; the
  *     FAISS manual's nlist ≈ √n .. 4√n). Cells then hold ≈√n vectors
  *     each, so BOTH the per-cell scan and the quantizer's codebook stay
  *     sub-linear in n. No lower clamp: ⌈√n⌉ stays trainable at any n
  *     (a 1/sampleMod hash-sample holds ≥√n rows for n ≥ sampleMod², and
  *     the trainers fail loudly below that), where an artificial floor
  *     would demand more seed vectors than a tiny corpus's sample can
  *     supply. The cap keeps the centroid set (driver state, nlist×dim
  *     doubles) bounded — 65536×64 doubles = 32 MB, the same canonical
  *     bounded-state exception as any k-means.
  *   - '''nprobe''': ⌈ρ·nlist⌉ for a caller-owned probe fraction ρ.
  *     ρ governs CELL recall (probability the true neighbor's cell is
  *     probed) and is a property of the data distribution, not of n:
  *     near-random embeddings (this repo's oracle corpus — background
  *     cosine ≈ 0.5) need the grid-measured ρ = 0.625 because no
  *     quantizer separates what isn't clustered; real clustered corpora
  *     run ρ ≈ 0.01–0.1 (the FAISS regime). Holding ρ fixed while nlist
  *     grows as √n keeps the scanned fraction of the corpus constant —
  *     recall does not silently thin as the corpus grows.
  *   - '''candK''' (ADC candidate depth before the exact re-rank):
  *     max(floor, ⌈γ·ρ·n⌉) — a fixed fraction γ of the EXPECTED SCANNED
  *     SET ρ·n. This is the knob the round-5 incident was about: a true
  *     neighbor's ADC rank among scanned candidates degrades linearly
  *     with how many distractors are scanned (code precision fixes the
  *     per-distractor beat probability; the count of scanned distractors
  *     is ρ·n), so constant candidate RECALL requires depth proportional
  *     to ρ·n. γ is grid-measured once per code configuration
  *     (graft.RecallGrid; γ = 0.10 at m=8/codes=64 holds every measured
  *     band with ≥0.04 margin to its edge) and then survives any n. The
  *     floor keeps small corpora at the depth their bands were measured
  *     at.
  *
  * All three are monotone non-decreasing in n (AnnParamsSpec
  * property-checks this): deliberately defined on n and the CONFIGURED ρ
  * rather than the realized nprobe/nlist ratio, whose ceil-boundary
  * wobble would make candK non-monotone across nlist steps.
  *
  * Flat ADC ([[Similarity.pqSearch]]) scans the WHOLE corpus (ρ ≡ 1),
  * so its depth is [[flatCandK]]: max(floor, ⌈γflat·n⌉).
  *
  * Used by the q_ann_pq / q_ann_ivfpq oracle queries
  * (graft.queries.PipelineQueries), which derive (nlist, nprobe, candK)
  * from `embeddings.count()` instead of hard-coding bench-scale
  * constants; their oracle bands are re-measured per scale by
  * graft.RecallGrid whenever γ/ρ or the code shape changes.
  */
object AnnParams {

  /** Grid-measured defaults for the near-random oracle corpus at
    * m=8 / codes=64 (see RecallGrid): the probe fraction, the
    * scanned-set candidate fraction, and the small-corpus depth floors.
    */
  val ProbeFrac = 0.625
  val CandFrac = 0.10
  val CandFloor = 80
  val FlatCandFrac = 0.05
  val FlatCandFloor = 50

  /** Probe fraction for plain IVF ([[Similarity.ivfTopK]]): exact
    * scoring inside probed cells means cell recall is the ONLY recall
    * term, so the band depends on this fraction, not on any absolute
    * count. Grid-measured at 0.46 (recall@5 0.872/0.840/0.843 across
    * the three testdata scales — one shared 0.8 band with ≥0.028 edge
    * distance everywhere, which is what the cardinality-CASE'd oracle
    * needs: the two n=500 datasets must land in the SAME band). Same
    * near-random-corpus caveat as [[ProbeFrac]].
    */
  val IvfProbeFrac = 0.46

  /** Grid-measured LSH operating point for the near-random oracle
    * corpus ([[Similarity.lshTopK]]): the table count and the target
    * candidate FRACTION the hash space is sized for (see [[lshBits]] —
    * at these values the rule derives the 5-bit tables the bands were
    * measured at: recall@5 0.768/0.768/0.771 across the three testdata
    * scales, ONE constant 0.7 band with ≥0.068 edge margin everywhere;
    * the near-identical recall at n = 500 and n = 2000 is the
    * fraction-invariance the rule exists for — the one-bit-deeper
    * 0.25-fraction point measures 0.616/0.628/0.597, brushing a band
    * edge at 0.003, and is what [[AnnCalibrate.calibrateLsh]] finds
    * when a caller only needs the 0.5 floor). The fraction, not any
    * bucket count, is the caller-owned cost/recall knob — the same
    * contract as [[ProbeFrac]]: near-random data needs a coarse 0.5
    * (hyperplane signs barely separate what isn't clustered);
    * genuinely clustered corpora run far smaller fractions at the
    * same recall.
    */
  val LshTables = 16
  val LshCandFrac = 0.5

  /** Bits-per-table ceiling: buckets pack into one long per table. */
  val MaxLshBits = 62

  val MaxNlist = 65536

  /** Candidate-depth ceiling. The ∝n depth rule is the honest cost of
    * CONSTANT candidate recall in the near-random regime, but the depth
    * also sizes per-task state (the top-k operator's bounded heaps and
    * the exact re-rank's per-query row count), so it gets the same kind
    * of hard ceiling as the centroid set: 65536 × ~16 bytes ≈ 1 MB per
    * in-flight query. Past the cap — which the rule reaches near n ≈
    * 10^6 at the oracle corpus's fractions — constant recall on
    * adversarially random data is simply not affordable, and the
    * measured bands no longer apply; real clustered corpora run γ·ρ
    * orders of magnitude smaller (distractors rarely beat true
    * neighbors under 64-code ADC when the data has structure), so the
    * cap is the designed behavior there, not a silent truncation.
    */
  val MaxCandK = 65536

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private def requirePositive(n: Long): Unit =
    require(n > 0, s"corpus cardinality must be positive, got $n")

  // -------------------------------------------------------------------
  // Ceiling-bind messages. Each documented cap silently changes the
  // operating REGIME when it binds (per-cell scan cost resumes growing
  // with n; candidate recall on near-random data decays below the
  // measured bands; SemDeDup's pair space turns quadratic again), so the
  // derivation methods warn once per call when that happens. The
  // conditions are pure `private[graft]` functions returning the message
  // — the testable surface (the IterCkpt.dirMismatch precedent:
  // AnnParamsSpec asserts each fires exactly past its boundary, never
  // at it) — and the public methods just log them.
  // -------------------------------------------------------------------

  private[graft] def nlistClampMsg(n: Long): Option[String] = {
    val want = math.ceil(math.sqrt(n.toDouble)).toLong
    if (want > MaxNlist) Some(
      s"AnnParams.nlist: ⌈√n⌉ = $want for n = $n exceeds MaxNlist = $MaxNlist " +
        s"— cells now hold ~n/$MaxNlist vectors each, so per-probe scan cost " +
        "resumes growing linearly with n (the √n regime ends here). Raise " +
        "MaxNlist consciously (driver centroid state = nlist × dim doubles) " +
        "or shard the corpus before indexing.")
    else None
  }

  private[graft] def candKClampMsg(n: Long, probeFrac: Double,
                                   candFrac: Double, which: String): Option[String] = {
    val want = math.ceil(candFrac * probeFrac * n.toDouble).toLong
    if (want > MaxCandK) Some(
      s"AnnParams.$which: ∝n candidate depth $want for n = $n exceeds " +
        s"MaxCandK = $MaxCandK — candidate recall on near-random data decays " +
        "below the grid-measured bands past this point (a capped depth is a " +
        "shrinking fraction of the scanned set). Raise MaxCandK consciously " +
        "(per-task heap ≈ 16 B × candK per in-flight query) — real clustered " +
        "corpora run far smaller γ·ρ and are unaffected.")
    else None
  }

  private[graft] def semDedupClampMsg(n: Long, targetCellSize: Int): Option[String] = {
    val want = math.ceil(n.toDouble / targetCellSize).toLong
    if (want > MaxNlist) Some(
      s"AnnParams.semDedupNlist: ⌈n/$targetCellSize⌉ = $want for n = $n exceeds " +
        s"MaxNlist = $MaxNlist — per-cell size now grows as n/$MaxNlist, so the " +
        "pair space degrades from the paper's linear n·cellSize bound toward " +
        s"O(n²/$MaxNlist). Raise MaxNlist consciously (driver centroid state) " +
        "or shard the corpus before deduping.")
    else None
  }

  private[graft] def maxLshBitsClampMsg(tables: Int,
                                        targetCandFrac: Double): Option[String] = {
    val want = math.max(1L, ceilLog2(tables / targetCandFrac))
    if (want > MaxLshBits) Some(
      s"AnnParams.lshBits: the fraction-derived depth $want bits exceeds " +
        s"MaxLshBits = $MaxLshBits (table signatures pack into one long) — " +
        "the returned depth is capped, so the expected candidate fraction " +
        s"will exceed the requested $targetCandFrac (it is ~tables/2^depth " +
        "at whichever of this cap and the ⌈log2(n)⌉ occupancy bound ends up " +
        "binding — for any corpus under 2^62 vectors the occupancy bound is " +
        "the lower one and logs its own message). Requesting a fraction " +
        s"this small has no effect a coarser target would not also have.")
    else None
  }

  private[graft] def lshClampMsg(n: Long, tables: Int,
                                 targetCandFrac: Double): Option[String] = {
    val want = lshBitsUnclamped(tables, targetCandFrac)
    val occupancy = occupancyBits(n)
    if (want > occupancy) Some(
      s"AnnParams.lshBits: the fraction-derived depth $want bits exceeds the " +
        s"occupancy bound ⌈log2(n)⌉ = $occupancy at n = $n — deeper tables " +
        "shatter buckets below unit occupancy (pure recall loss, no further " +
        "pruning), so the bound wins. Expected candidate fraction is " +
        s"~$tables/2^$occupancy instead of the requested $targetCandFrac; " +
        "at this corpus size consider the exact blocked paths instead.")
    else None
  }

  /** Random-co-cell baseline ≈ 1/nlist falls below this → the near-
    * background guidance message fires (see [[semDedupLowBandMsg]]).
    */
  val SemDedupBackgroundBaseline = 0.1

  /** Guidance for [[Similarity.semDedupPairs]] callers whose threshold
    * sits near the corpus's BACKGROUND similarity (pairs not tightly
    * clustered — the measured sf0.1 oracle regime, pair recall 0.215):
    * for such pairs the two endpoints land in the same k-means cell
    * roughly at random, so expected pair recall is bounded near the
    * random co-cell baseline ≈ 1/nlist (balanced cells: Σ(|cell|/n)²).
    * Once that baseline drops below [[SemDedupBackgroundBaseline]], the
    * message states it and names the exhaustive alternative
    * ([[Similarity.cosineNearDupPairs]]). Genuine near-duplicates
    * (cos ≈ 0.95+) co-cluster by construction and are unaffected — this
    * is informational guidance, not an error.
    */
  private[graft] def semDedupLowBandMsg(n: Long, nlist: Int): Option[String] =
    if (nlist >= 1 && 1.0 / nlist < SemDedupBackgroundBaseline) Some(
      f"semDedupPairs: with $nlist cells over $n vectors, the random " +
        f"co-cell baseline is ~${1.0 / nlist}%.4f — if your similarity " +
        "threshold sits near the corpus's background similarity (pairs " +
        "NOT tightly clustered), expected pair recall is bounded near " +
        "that baseline; use the exact cosineNearDupPairs for exhaustive " +
        "recall in that regime. Tight near-duplicates co-cluster and " +
        "are unaffected.")
    else None

  /** Every ceiling-bind message that fires at this cardinality and
    * configuration, in the file's declaration order — the input to
    * [[observeClamps]] and the one list a caller can log wholesale.
    */
  private[graft] def clampMessages(n: Long,
                                   probeFrac: Double = ProbeFrac,
                                   candFrac: Double = CandFrac,
                                   flatCandFrac: Double = FlatCandFrac,
                                   tables: Int = LshTables,
                                   targetCandFrac: Double = LshCandFrac,
                                   semDedupCellSize: Int = 64): Seq[String] =
    Seq(nlistClampMsg(n),
      candKClampMsg(n, probeFrac, candFrac, "candK"),
      candKClampMsg(n, probeFrac = 1.0, flatCandFrac, "flatCandK"),
      semDedupClampMsg(n, semDedupCellSize),
      maxLshBitsClampMsg(tables, targetCandFrac),
      lshClampMsg(n, tables, targetCandFrac)).flatten

  /** Surface the ceiling-bind warnings as JOB METRICS, not just driver
    * log lines: the clamp messages go to log.warn, which a cluster
    * job's driver log may never be read for — a deployment watching
    * only job metrics would miss the regime change entirely (per-cell
    * scan cost resuming linear growth; candidate recall decaying below
    * the measured bands). This attaches every message that fires at
    * (n, config) to the result frame as an
    * `org.apache.spark.sql.Observation` (the IterCkpt/Components
    * convergence-count precedent): `caps_bound` = how many caps bind,
    * `cap_messages` = the joined texts, both filled when the frame's
    * first action runs. A caller that KEEPS the returned Observation
    * handle reads them from `Observation.get`; a caller that only
    * returns the DataFrame (the shipped q_ann_ivfpq row — a query
    * signature has nowhere to carry the handle) still surfaces them to
    * every QueryExecutionListener and the SQL event log under the
    * observation name "ann_param_clamps", which is the job-metrics
    * visibility this exists for. When NOTHING binds — every corpus below
    * the caps, including all tested scales — the frame is returned
    * UNTOUCHED (no CollectMetrics node, no metric noise on the common
    * path) and the Observation is None. The metrics are lit-aggregates
    * (the bind condition is a pure function of (n, config), not of the
    * data), so the observation costs nothing beyond the node itself;
    * an empty result frame reports null metrics, as any Observation
    * over zero rows does.
    */
  def observeClamps(df: org.apache.spark.sql.DataFrame, n: Long,
                    probeFrac: Double = ProbeFrac,
                    candFrac: Double = CandFrac,
                    flatCandFrac: Double = FlatCandFrac,
                    tables: Int = LshTables,
                    targetCandFrac: Double = LshCandFrac,
                    semDedupCellSize: Int = 64)
      : (org.apache.spark.sql.DataFrame, Option[org.apache.spark.sql.Observation]) = {
    val msgs = clampMessages(n, probeFrac, candFrac, flatCandFrac, tables,
      targetCandFrac, semDedupCellSize)
    if (msgs.isEmpty) (df, None)
    else {
      import org.apache.spark.sql.functions.{lit, max}
      // NAMED so listener/event-log consumers can key on it (an unnamed
      // Observation gets an opaque generated name per instance)
      val obs = org.apache.spark.sql.Observation("ann_param_clamps")
      (df.observe(obs, max(lit(msgs.length)).as("caps_bound"),
        max(lit(msgs.mkString(" | "))).as("cap_messages")), Some(obs))
    }
  }

  // the 1e-9 guards exact powers of two from FP noise in log2 (e.g.
  // log2(64) evaluating to 6.000000000000001 and ceiling to 7) — the
  // same edge-guard recallContract's band bucketization uses
  private def ceilLog2(x: Double): Long =
    math.ceil(math.log(x) / math.log(2.0) - 1e-9).toLong

  // the MaxLshBits ceiling warns when it binds ([[maxLshBitsClampMsg]],
  // fired from lshBits) — every other cap in this file does, and a
  // silently clamped extreme tables/targetCandFrac request would
  // otherwise degrade with no signal
  private def lshBitsUnclamped(tables: Int, targetCandFrac: Double): Int =
    math.max(1L, ceilLog2(tables / targetCandFrac))
      .min(MaxLshBits.toLong).toInt

  private def occupancyBits(n: Long): Int =
    math.max(1L, ceilLog2(n.toDouble)).min(MaxLshBits.toLong).toInt

  /** Bits per LSH table ([[Similarity.lshTopK]] / lshIndex): the depth
    * at which the hash space prunes candidates to a target FRACTION of
    * the corpus — the rule that replaces the last fixed ANN constant
    * (a hard-coded bitsPerTable is a FIXED 2^bits-bucket space per
    * table; its per-pair collision probability is a constant, so the
    * caller has no fraction-denominated knob and no derivation tying
    * the operating point to a measurable invariant — the same defect
    * class as the pre-derivation fixed nlist/candK).
    *
    * Derivation: under the idealized uniform-bucket model a random
    * pair collides in one table w.p. 2^-bits, so the expected
    * per-query candidate fraction across tables is ≤ tables·2^-bits
    * (union bound). Setting that equal to the target fraction gives
    * bits = ⌈log2(tables / targetCandFrac)⌉ — the candidate FRACTION,
    * not count, is the invariant, exactly as candK derives from γ:
    * holding the fraction fixed keeps recall constant as n grows,
    * at the honest linear per-query cost every constant-recall
    * architecture pays on near-random data (the IVF ρ contract). On
    * real sign-LSH the per-bit agreement probability exceeds 1/2 for
    * correlated data, so the REALIZED fraction is larger than the
    * target — the target is the model-denominated knob whose realized
    * value [[AnnCalibrate.calibrateLsh]] measures (the grid-measured
    * default [[LshCandFrac]] = 0.5 at [[LshTables]] = 16 derives the
    * 5-bit tables whose bands the q_ann_lsh oracle pins — measured
    * realized fractions on the oracle corpus: 0.405 at n = 500 and
    * 0.403 at n = 2000 against the 0.5 model, so on this
    * near-orthogonal corpus the model is honest and slightly
    * conservative (the union bound overcounts table overlap), and
    * the n-invariance of the realized fraction is the rule's claim
    * measured directly, not inferred from recall stability).
    *
    * The n-derived bound: bits beyond ⌈log2(n)⌉ drop expected bucket
    * occupancy below one vector — every further bit is pure recall
    * loss with no pruning left to buy — so the occupancy bound wins
    * (warning when it binds; monotone non-decreasing in n, so a
    * growing corpus can only deepen its tables, never coarsen them).
    */
  def lshBits(n: Long, tables: Int = LshTables,
              targetCandFrac: Double = LshCandFrac): Int = {
    requirePositive(n)
    require(tables >= 1, s"tables must be >= 1, got $tables")
    require(targetCandFrac > 0 && targetCandFrac <= 1,
      s"target candidate fraction must be in (0, 1], got $targetCandFrac")
    maxLshBitsClampMsg(tables, targetCandFrac).foreach(log.warn(_))
    lshClampMsg(n, tables, targetCandFrac).foreach(log.warn(_))
    math.min(lshBitsUnclamped(tables, targetCandFrac), occupancyBits(n))
  }

  /** Coarse-cell count: ⌈√n⌉ capped at [[MaxNlist]] (warns when the cap
    * binds — the regime change is silent otherwise).
    */
  def nlist(n: Long): Int = {
    requirePositive(n)
    nlistClampMsg(n).foreach(log.warn(_))
    math.min(MaxNlist.toLong,
      math.max(1L, math.ceil(math.sqrt(n.toDouble)).toLong)).toInt
  }

  /** Probed cells: ⌈ρ·nlist⌉, clamped to [1, nlist]. */
  def nprobe(n: Long, probeFrac: Double = ProbeFrac): Int = {
    requirePositive(n)
    require(probeFrac > 0 && probeFrac <= 1,
      s"probe fraction must be in (0, 1], got $probeFrac")
    val cells = nlist(n)
    math.min(cells.toLong, math.max(1L, math.ceil(probeFrac * cells).toLong)).toInt
  }

  /** IVF-PQ candidate depth: max(floor, ⌈γ·ρ·n⌉) capped at
    * [[MaxCandK]], never below k.
    */
  def candK(n: Long, k: Int, probeFrac: Double = ProbeFrac,
            candFrac: Double = CandFrac, floor: Int = CandFloor): Int = {
    requirePositive(n)
    require(k >= 1, s"k must be >= 1, got $k")
    candKClampMsg(n, probeFrac, candFrac, "candK").foreach(log.warn(_))
    math.max(k.toLong,
      math.max(floor.toLong, math.ceil(candFrac * probeFrac * n.toDouble).toLong)
        .min(MaxCandK.toLong))
      .min(Int.MaxValue).toInt
  }

  /** Flat-ADC candidate depth (scanned set = the whole corpus):
    * max(floor, ⌈γflat·n⌉) capped at [[MaxCandK]], never below k.
    */
  def flatCandK(n: Long, k: Int, candFrac: Double = FlatCandFrac,
                floor: Int = FlatCandFloor): Int = {
    requirePositive(n)
    require(k >= 1, s"k must be >= 1, got $k")
    candKClampMsg(n, probeFrac = 1.0, candFrac, "flatCandK").foreach(log.warn(_))
    math.max(k.toLong,
      math.max(floor.toLong, math.ceil(candFrac * n.toDouble).toLong)
        .min(MaxCandK.toLong))
      .min(Int.MaxValue).toInt
  }

  /** Block count for the exact blocked-grid paths
    * ([[Similarity.bruteForceTopK]] / bruteForceTopKFor /
    * cosineNearDupPairs): ⌈2n / targetRowsPerTask⌉ floored at 8 and
    * capped at 1024. A block-pair group holds ≤ 2n/blocks vectors — the
    * per-task memory bound — so a FIXED block count lets task memory
    * grow linearly with the corpus (the recall-audit shape runs a query
    * SAMPLE against ALL candidates, so the candidate side is
    * corpus-sized even when the work is affordable). The default target
    * of 262144 rows ≈ 128 MB of 64-dim doubles per task. Blocks affect
    * only partitioning, never results, so deriving this needs no oracle
    * re-measurement; the floor keeps small corpora at the historically
    * tested task shape, and the cap (≈ 500k block-pair tasks) marks
    * where O(n²) exact work has outgrown single-job affordability —
    * shard or sample first past it.
    */
  def bruteBlocks(n: Long, targetRowsPerTask: Int = 262144): Int = {
    // n = 0 is allowed, unlike the training-dependent knobs: an empty
    // corpus has a well-defined block count (the floor), and the exact
    // paths' empty-in-empty-out contract (DegenerateInputsSpec) must
    // survive a caller deriving blocks from count()
    require(n >= 0, s"corpus cardinality must be non-negative, got $n")
    require(targetRowsPerTask >= 1,
      s"targetRowsPerTask must be >= 1, got $targetRowsPerTask")
    math.min(1024L,
      math.max(8L, math.ceil(2.0 * n / targetRowsPerTask).toLong)).toInt
  }

  /** Cluster count for SemDeDup ([[Similarity.semDedupPairs]]):
    * ⌈n / targetCellSize⌉, clamped to [1, [[MaxNlist]]]. SemDeDup's
    * whole scale trick is that clustering bounds the pair space at
    * nlist·|cell|² = n·targetCellSize comparisons — LINEAR in n for a
    * fixed target cell size — so nlist must grow LINEARLY with the
    * corpus (the paper dedups LAION-440M with 50k clusters ≈ 9k
    * vectors/cell); a fixed nlist silently degrades to |cell| = n/nlist
    * → n²/nlist total comparisons, the quadratic blow-up the operator
    * exists to avoid. targetCellSize is the recall/cost knob the caller
    * owns (bigger cells → fewer boundary-straddling pairs missed, more
    * work); the default 64 reproduces the measured oracle configuration
    * at the small testdata scales. Past the [[MaxNlist]] clamp
    * (driver-state ceiling) per-cell size grows again — at that corpus
    * scale, raise the clamp consciously or shard the corpus first.
    */
  def semDedupNlist(n: Long, targetCellSize: Int = 64): Int = {
    requirePositive(n)
    require(targetCellSize >= 1,
      s"targetCellSize must be >= 1, got $targetCellSize")
    semDedupClampMsg(n, targetCellSize).foreach(log.warn(_))
    math.min(MaxNlist.toLong,
      math.max(1L, math.ceil(n.toDouble / targetCellSize).toLong)).toInt
  }
}
