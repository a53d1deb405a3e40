package graft

import graft.operators.{AnnCalibrate, AnnParams}

/** Runtime recall calibration must agree with the offline grid it
  * replaces: on THE ORACLE CORPUS (the one RecallGrid measured the
  * AnnParams constants on), the calibrated fractions must land within
  * one grid step of the offline points, meet the requested target, and
  * return the CHEAPEST such operating point. These are deterministic
  * measurements (keyed hash sample, deterministic seeding/training,
  * exact arithmetic), so exact pins are stable; the one-knob-step
  * assertions are the contract, the == pins record the measured values
  * (RecallGrid prints matching CALIB lines at all three scales).
  */
class AnnCalibrateSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf)

  test("ivfpq calibration reproduces the offline grid's rho within one knob step") {
    val c = AnnCalibrate
      .calibrateIvfPq(emb, "vec_id", "embedding", recallTarget = 0.8)
      .getOrElse(fail("target 0.8 must be reachable on the oracle corpus"))
    assert(c.recall >= 0.8)
    // the offline point is ProbeFrac = 0.625 (chosen with cross-scale
    // band margin); the cheapest rung meeting 0.8 here measures 0.5 —
    // one grid step below. Both the step contract and the exact pin:
    val grid = AnnCalibrate.DefaultRhoGrid
    assert(math.abs(grid.indexOf(c.rho) - grid.indexOf(AnnParams.ProbeFrac)) <= 1,
      s"calibrated rho ${c.rho} not within one knob step of ${AnnParams.ProbeFrac}")
    assert(c.rho === 0.5)
    assert(c.nprobe === AnnParams.nprobe(500, 0.5))
    // at n = 500 every gamma rung sits under the small-corpus candidate
    // floor except the deepest, so the floor depth must come back
    // attributed to the smallest gamma (the dedupe-per-rung rule)
    assert(c.candK === AnnParams.CandFloor)
    assert(c.gamma === AnnCalibrate.DefaultGammaGrid.min)
  }

  test("ivf calibration brackets the offline IvfProbeFrac from below") {
    val c = AnnCalibrate
      .calibrateIvf(emb, "vec_id", "embedding", recallTarget = 0.8)
      .getOrElse(fail("target 0.8 must be reachable on the oracle corpus"))
    assert(c.recall >= 0.8)
    // offline point 0.46 sits between grid rungs 0.35 and 0.5; the
    // cheapest rung meeting 0.8 measures 0.35 (recall 0.832 — the same
    // nprobe=9 point the GRID ivf neighbor sweep shows at 0.8320)
    assert(c.rho === 0.35)
    assert(c.nprobe === AnnParams.nprobe(500, 0.35))
    // never costlier than the rung just above the offline fraction
    assert(c.rho <= 0.5)
  }

  test("the q_ann_calibrate gate target selects the margin-swept rung") {
    // the driver-gated row (PipelineQueries q_ann_calibrate) pins its
    // oracle on target 0.71 selecting ρ = 0.35 at EVERY scale — the
    // margin-swept constant (≥0.05 from each adjacent rung everywhere;
    // see the row comment). This is the same expectation as that oracle,
    // pinned here at test scale so a grid or target change fails fast.
    val c = AnnCalibrate
      .calibrateIvf(emb, "vec_id", "embedding", recallTarget = 0.71)
      .getOrElse(fail("target 0.71 must be reachable on the oracle corpus"))
    assert(c.rho === 0.35 && c.recall >= 0.71)
    assert(c.nprobe === AnnParams.nprobe(500, 0.35))
  }

  test("flat-PQ calibration reproduces the offline FlatCandFrac depth") {
    val c = AnnCalibrate
      .calibrateFlatPq(emb, "vec_id", "embedding", recallTarget = 0.75)
      .getOrElse(fail("target 0.75 must be reachable on the oracle corpus"))
    // the offline depth (flatCandK = 50 at n = 500, where the measured
    // grid reads 0.776) is exactly what the cheapest rung reaches: at
    // this n every gamma <= 0.1 collapses to the 50-floor
    assert(c.candK === AnnParams.FlatCandFloor)
    assert(c.gamma === AnnCalibrate.DefaultGammaGrid.min)
    assert(c.recall >= 0.75)
    // a stiffer target must buy a deeper rung, not fail
    val deep = AnnCalibrate
      .calibrateFlatPq(emb, "vec_id", "embedding", recallTarget = 0.8)
      .getOrElse(fail("0.8 must be reachable with a deeper candidate list"))
    assert(deep.candK > c.candK && deep.recall >= 0.8)
  }

  test("semdedup calibration walks cell sizes cheapest-first and matches the grid") {
    // grid-measured pair recall at n = 500 / threshold 0.45 (RecallGrid):
    // nlist 16 -> 0.1429, 8 -> 0.2857, 4 -> 0.7143. Target 0.7 must
    // walk past the cheap rungs and land on cellSize 128 (nlist 4);
    // target 0.25 stops at the offline default 64 (nlist 8).
    val c7 = AnnCalibrate
      .calibrateSemDedup(emb, "vec_id", "embedding", 0.45, pairRecallTarget = 0.7)
      .getOrElse(fail("0.7 must be reachable at cellSize 128 (measured 0.7143)"))
    assert(c7.targetCellSize === 128 && c7.nlist === 4)
    assert(c7.pairRecall >= 0.7)
    // walk-past-the-cheap-rung behavior pinned on measured numbers:
    // cellSize 32 (nlist 16, measured 0.1429) misses 0.25, cellSize 64
    // (nlist 8, the offline default, measured 0.2857) meets it. (The
    // full default grid's cheapest rung cellSize 16 ALSO happens to
    // meet 0.25 on this 7-pair corpus — recall moves in 1/7 steps and
    // is not monotone in cell count at this size, which is exactly why
    // calibration measures instead of assuming.)
    val c25 = AnnCalibrate
      .calibrateSemDedup(emb, "vec_id", "embedding", 0.45,
        pairRecallTarget = 0.25, cellSizeGrid = Seq(32, 64, 128))
      .getOrElse(fail("0.25 must be reachable at the offline default cellSize 64"))
    assert(c25.targetCellSize === 64 && c25.nlist === 8)
    // a threshold with NO exact pairs calibrates vacuously at the
    // cheapest rung (recall 1.0 of an empty set)
    val none = AnnCalibrate
      .calibrateSemDedup(emb, "vec_id", "embedding", threshold = 0.99,
        pairRecallTarget = 0.9, cellSizeGrid = Seq(16, 64))
      .getOrElse(fail("no exact pairs at 0.99 — must calibrate vacuously"))
    assert(none.targetCellSize === 16 && none.pairRecall === 1.0)
  }

  test("a provided anchor reproduces the self-computed calibration and stays caller-owned") {
    // same measurement, anchor computed once by the caller: the result
    // must be identical to the self-computed path (the ivf pin above),
    // and the anchor must come back still persisted — it is the
    // caller's to free, not the calibration's
    val a = AnnCalibrate.anchorFor(emb, "vec_id", "embedding")
    try {
      val c = AnnCalibrate
        .calibrateIvf(emb, "vec_id", "embedding", recallTarget = 0.8,
          anchor = Some(a))
        .getOrElse(fail("anchored calibration must reach 0.8 like the self-computed one"))
      assert(c.rho === 0.35 && c.nprobe === AnnParams.nprobe(500, 0.35))
      assert(a.bf.storageLevel.useMemory,
        "calibration must not unpersist a caller-provided anchor")
      // an anchor measuring a different contract is rejected loudly,
      // before any job runs
      intercept[IllegalArgumentException](
        AnnCalibrate.calibrateIvfPq(emb, "vec_id", "embedding",
          recallTarget = 0.8, k = 3, anchor = Some(a)))
    } finally a.bf.unpersist(blocking = false)
    val p = AnnCalibrate.pairAnchorFor(emb, "vec_id", "embedding", 0.45)
    try {
      val c25 = AnnCalibrate
        .calibrateSemDedup(emb, "vec_id", "embedding", 0.45,
          pairRecallTarget = 0.25, cellSizeGrid = Seq(32, 64, 128),
          anchor = Some(p))
        .getOrElse(fail("anchored semdedup calibration must reach 0.25 at cellSize 64"))
      assert(c25.targetCellSize === 64 && c25.nlist === 8)
      assert(p.exactPairs.storageLevel.useMemory,
        "calibration must not unpersist a caller-provided pair anchor")
      intercept[IllegalArgumentException](
        AnnCalibrate.calibrateSemDedup(emb, "vec_id", "embedding", 0.5,
          pairRecallTarget = 0.25, anchor = Some(p)))
    } finally p.exactPairs.unpersist(blocking = false)
  }

  test("sub-corpus calibration transfers: fractions within one knob step of full-corpus") {
    // THE 100 TB path (AnnCalibrate scaladoc): calibrate on a
    // hash-sampled sub-corpus, carry the FRACTIONS to the full corpus
    // where AnnParams re-derives the absolute knobs from the real n.
    // Pinned on the oracle corpus at corpusFrac = 0.5 (n = 250):
    val sub = operators.Sampling.hashSample(emb, "vec_id", 0.5)
    val ivf = AnnCalibrate
      .calibrateIvf(sub, "vec_id", "embedding", recallTarget = 0.8)
      .getOrElse(fail("0.8 must be reachable on the half corpus"))
    assert(ivf.rho === 0.35, "half-corpus rho_ivf must reproduce the full-corpus 0.35")
    val pq = AnnCalibrate
      .calibrateIvfPq(sub, "vec_id", "embedding", recallTarget = 0.8)
      .getOrElse(fail("0.8 must be reachable on the half corpus"))
    // one knob step below the full-corpus 0.5 — a smaller corpus is
    // slightly easier; the scaladoc's transfer-margin guidance exists
    // because of exactly this measurement
    val grid = AnnCalibrate.DefaultRhoGrid
    assert(math.abs(grid.indexOf(pq.rho) - grid.indexOf(0.5)) <= 1,
      s"half-corpus rho ${pq.rho} not within one knob step of the full-corpus 0.5")
    assert(pq.rho === 0.35 && pq.recall >= 0.8)
    // below the PQ codebook minimum the sample is rejected loudly, not
    // calibrated on an undertrained quantizer
    val tiny = operators.Sampling.hashSample(emb, "vec_id", 0.25) // n = 126 < 4*64
    intercept[IllegalArgumentException](
      AnnCalibrate.calibrateIvfPq(tiny, "vec_id", "embedding", recallTarget = 0.8))
  }

  test("an anchor over an EXTERNAL query workload calibrates the serving path") {
    // qids disjoint from the corpus: shift a 50-query sample out of the
    // id space. Both probe paths must measure THE ANCHOR'S queries — a
    // re-derived corpus sample would share no qids with the anchor and
    // read recall 0 everywhere. Exactness points make the pins sharp:
    // plain IVF at rho = 1.0 probes every cell (exact), and IVF-PQ at
    // (rho, gamma) = (1, 1) has candK = n (the candidate set is the
    // whole corpus, the exact re-rank IS the brute force), so both must
    // return recall exactly 1.0.
    import org.apache.spark.sql.functions._
    val S = graft.operators.Similarity
    val workload = emb.filter(col("vec_id") < 50)
      .select((col("vec_id") + 10000L).as("vec_id"), col("embedding"))
    val n = emb.count()
    val bf = S.bruteForceTopKFor(workload, emb, "vec_id", "embedding",
      k = 5, blocks = AnnParams.bruteBlocks(n)).persist()
    val a = AnnCalibrate.TopKAnchor(workload, bf, n, 5, 0.1)
    try {
      val ivf = AnnCalibrate
        .calibrateIvf(emb, "vec_id", "embedding", recallTarget = 1.0,
          rhoGrid = Seq(1.0), anchor = Some(a))
        .getOrElse(fail("full probe on an external workload must be exact"))
      assert(ivf.recall === 1.0)
      val pq = AnnCalibrate
        .calibrateIvfPq(emb, "vec_id", "embedding", recallTarget = 1.0,
          rhoGrid = Seq(1.0), gammaGrid = Seq(1.0), anchor = Some(a))
        .getOrElse(fail("full-depth IVF-PQ on an external workload must be exact"))
      assert(pq.recall === 1.0)
    } finally bf.unpersist(blocking = false)
  }

  test("lsh calibration walks fractions cheapest-first and brackets the default") {
    // grid-measured at n = 500 (RecallGrid): bits 6 (frac 0.25) reads
    // 0.616, bits 5 (frac 0.5, the shipped LshCandFrac default) reads
    // 0.768. A caller needing only the 0.5 floor gets the CHEAPER
    // 0.25-fraction point — one bit deeper than the default, half the
    // expected candidates; the default's own 0.7-band regime needs the
    // full 0.5 fraction. Both pins move only with RecallGrid.
    val cheap = AnnCalibrate
      .calibrateLsh(emb, "vec_id", "embedding", recallTarget = 0.5)
      .getOrElse(fail("target 0.5 must be reachable on the oracle corpus"))
    assert(cheap.candFrac === 0.25 && cheap.bits === 6)
    assert(cheap.recall === 0.616)
    val deep = AnnCalibrate
      .calibrateLsh(emb, "vec_id", "embedding", recallTarget = 0.7)
      .getOrElse(fail("target 0.7 must be reachable at the shipped default"))
    assert(deep.candFrac === AnnParams.LshCandFrac && deep.bits === 5)
    assert(deep.recall === 0.768)
    assert(deep.bits === AnnParams.lshBits(500),
      "the 0.7-target rung must be the operating point q_ann_lsh ships")
  }

  test("rho rungs dedupe by (nprobe, deepest candK), never by nprobe alone") {
    // n = 500 → nlist 23: rho 0.5 and 0.52 both ceil to nprobe 12, but
    // their deepest gamma = 0.4 depths differ (100 vs 104) — deduping
    // on nprobe alone would silently drop the deeper same-probe-cost
    // rung (the smallest-(rho, gamma) contract violation)
    val kept = AnnCalibrate.ivfPqRhoRungs(500L, 5,
      rhoGrid = Seq(0.5, 0.52), gammaGrid = Seq(0.4))
    assert(kept === Seq((0.5, 12), (0.52, 12)))
    // when BOTH derived knobs collapse (every depth under the
    // small-corpus floor), identical-cost rungs measure once,
    // attributed to the cheapest fraction
    val collapsed = AnnCalibrate.ivfPqRhoRungs(500L, 5,
      rhoGrid = Seq(0.5, 0.52), gammaGrid = Seq(0.025))
    assert(collapsed === Seq((0.5, 12)))
    // ...and the key is the FULL per-gamma depth vector: rho 0.496 and
    // 0.5 at n = 500 agree on nprobe (12) AND on the deepest gamma's
    // candK (0.4 → ⌈99.2⌉ = 100 = ⌈100⌉), but ceil-wobble apart at the
    // intermediate 0.35 (⌈86.8⌉ = 87 vs ⌈87.5⌉ = 88) — a deepest-only
    // key would drop the 0.5 rung and return a one-candidate-deeper
    // gamma label than the true cheapest point
    val wobble = AnnCalibrate.ivfPqRhoRungs(500L, 5,
      rhoGrid = Seq(0.496, 0.5), gammaGrid = Seq(0.35, 0.4))
    assert(wobble === Seq((0.496, 12), (0.5, 12)))
  }

  test("calibrated fractions fed back through AnnParams reproduce the target end-to-end") {
    // THE deployment contract: calibrate once, then derive every
    // absolute knob from the returned fractions via AnnParams at query
    // time. The derivations must agree with what calibration measured,
    // and a probe run at the derived point must meet the target ON THE
    // SAME anchor — each half was pinned separately before; this is
    // the composed guarantee a serving deployment actually relies on.
    import org.apache.spark.sql.functions._
    val S = graft.operators.Similarity
    val a = AnnCalibrate.anchorFor(emb, "vec_id", "embedding")
    try {
      val c = AnnCalibrate
        .calibrateIvfPq(emb, "vec_id", "embedding", recallTarget = 0.8,
          anchor = Some(a))
        .getOrElse(fail("target 0.8 must be reachable on the oracle corpus"))
      // the fractions re-derive exactly the knobs calibration measured
      assert(AnnParams.nprobe(a.n, c.rho) === c.nprobe)
      assert(AnnParams.candK(a.n, 5, probeFrac = c.rho, candFrac = c.gamma)
        === c.candK)
      // ...and an independently trained probe at that derived point
      // meets the target on the same anchor (deterministic training:
      // this is the exact serving configuration)
      val idx = S.ivfPqIndex(emb, "vec_id", "embedding",
        AnnParams.nlist(a.n), m = 8, codes = 64)
      val cand = S.ivfPqProbe(idx, a.queries, "vec_id", "embedding",
          AnnParams.candK(a.n, 5, probeFrac = c.rho, candFrac = c.gamma),
          AnnParams.nprobe(a.n, c.rho))
        .filter(col("qid") =!= col("id"))
      val r = AnnCalibrate.recallOf(a.bf,
        AnnCalibrate.exactReRank(emb, "vec_id", "embedding", cand, 5,
          querySrc = Some(a.queries)))
      assert(r === c.recall, "the derived point must replay the measured recall")
      assert(r >= 0.8)
    } finally a.bf.unpersist(blocking = false)
  }

  test("an unreachable target returns None, not the closest miss") {
    assert(AnnCalibrate.calibrateIvfPq(emb, "vec_id", "embedding",
      recallTarget = 0.99, rhoGrid = Seq(0.2), gammaGrid = Seq(0.025)).isEmpty)
  }

  test("full probe is exact for plain IVF: recall target 1.0 is reachable at rho = 1.0") {
    // nprobe = nlist probes every cell — the candidate set is the whole
    // corpus and exact scoring makes recall exactly 1; calibration must
    // find it (and not before rho = 1.0 on this near-random corpus)
    val c = AnnCalibrate
      .calibrateIvf(emb, "vec_id", "embedding", recallTarget = 1.0,
        rhoGrid = Seq(0.5, 1.0))
      .getOrElse(fail("rho = 1.0 probes every cell — recall 1.0 must be reachable"))
    assert(c.rho === 1.0 && c.recall === 1.0)
  }

  test("calibrateLsh's dim probe rejects degenerate corpora with the contract message") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // empty corpus: loud message, not head()'s bare NoSuchElement
    val empty = Seq.empty[(Long, Array[Double])].toDF("vec_id", "embedding")
    val e1 = intercept[IllegalArgumentException](
      AnnCalibrate.calibrateLsh(empty, "vec_id", "embedding", recallTarget = 0.5))
    assert(e1.getMessage.contains("corpus is empty"))
    // null first vector: loud message, not a negative array size deep in
    // the hyperplane kernel (size(null) is null/-1, never a dim)
    val nullVec = Seq((1L, null: Array[Double]), (2L, Array(1.0, 0.0)))
      .toDF("vec_id", "embedding").orderBy("vec_id")
    val e2 = intercept[IllegalArgumentException](
      AnnCalibrate.calibrateLsh(nullVec, "vec_id", "embedding", recallTarget = 0.5))
    assert(e2.getMessage.contains("null or empty"))
    // empty first vector: same contract
    val emptyVec = Seq((1L, Array.empty[Double])).toDF("vec_id", "embedding")
    val e3 = intercept[IllegalArgumentException](
      AnnCalibrate.calibrateLsh(emptyVec, "vec_id", "embedding", recallTarget = 0.5))
    assert(e3.getMessage.contains("null or empty"))
  }

  test("degenerate calibration inputs fail loudly") {
    intercept[IllegalArgumentException](
      AnnCalibrate.calibrateIvfPq(emb, "vec_id", "embedding", recallTarget = 0.0))
    intercept[IllegalArgumentException](
      AnnCalibrate.calibrateIvf(emb, "vec_id", "embedding", recallTarget = 1.5))
    intercept[IllegalArgumentException](
      AnnCalibrate.calibrateIvf(emb, "vec_id", "embedding", recallTarget = 0.8,
        rhoGrid = Seq.empty))
    intercept[IllegalArgumentException](
      AnnCalibrate.calibrateLsh(emb, "vec_id", "embedding", recallTarget = 0.0))
    intercept[IllegalArgumentException](
      AnnCalibrate.calibrateLsh(emb, "vec_id", "embedding", recallTarget = 0.8,
        fracGrid = Seq.empty))
  }
}
