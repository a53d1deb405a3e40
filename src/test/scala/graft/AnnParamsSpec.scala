package graft

import graft.operators.AnnParams

/** The ANN operating-point rule is pure arithmetic — only the
  * Observation surface at the bottom touches Spark. What must hold:
  * every knob is monotone non-decreasing in corpus cardinality
  * (the whole point of replacing fixed constants: a bigger corpus may
  * never get a SHALLOWER index or candidate list), the clamps and floors
  * bind where documented, the values at the three measured testdata
  * scales are exactly the ones the oracle bands were grid-measured at —
  * a silent rule change must turn this red before it silently invalidates
  * the bands — and the ceiling-bind warnings surface as observable job
  * metrics past each cap, never below it.
  */
class AnnParamsSpec extends SparkSpec {

  test("all three knobs are monotone non-decreasing in corpus size") {
    val rng = new scala.util.Random(7)
    // dense small range + random log-scale pairs up to 10^11 (the stated
    // 100 TB corpus shape) — the ceil boundaries live in the small range
    val ns = (1L to 3000L) ++
      Seq.fill(2000)(math.pow(10, rng.nextDouble() * 11).toLong max 1L)
    val sorted = ns.distinct.sorted
    sorted.sliding(2).foreach { case Seq(n1, n2) =>
      assert(AnnParams.nlist(n1) <= AnnParams.nlist(n2), s"nlist at $n1 vs $n2")
      assert(AnnParams.nprobe(n1) <= AnnParams.nprobe(n2), s"nprobe at $n1 vs $n2")
      assert(AnnParams.nprobe(n1, AnnParams.IvfProbeFrac) <=
        AnnParams.nprobe(n2, AnnParams.IvfProbeFrac), s"ivf nprobe at $n1 vs $n2")
      assert(AnnParams.candK(n1, 5) <= AnnParams.candK(n2, 5), s"candK at $n1 vs $n2")
      assert(AnnParams.flatCandK(n1, 5) <= AnnParams.flatCandK(n2, 5),
        s"flatCandK at $n1 vs $n2")
      assert(AnnParams.semDedupNlist(n1) <= AnnParams.semDedupNlist(n2),
        s"semDedupNlist at $n1 vs $n2")
      assert(AnnParams.bruteBlocks(n1) <= AnnParams.bruteBlocks(n2),
        s"bruteBlocks at $n1 vs $n2")
      assert(AnnParams.lshBits(n1) <= AnnParams.lshBits(n2),
        s"lshBits at $n1 vs $n2")
    case _ => ()
    }
  }

  test("lshBits derives the hash depth from the target candidate fraction") {
    // the grid-measured operating point (tables = 16, frac = 0.5)
    // derives exactly the 5-bit tables the q_ann_lsh bands were
    // measured at, at every tested cardinality — rule and bands pinned
    // together, the same contract as the (nlist, nprobe, candK) pins
    assert(AnnParams.lshBits(500) === 5)
    assert(AnnParams.lshBits(2000) === 5)
    assert(AnnParams.lshBits(100000000000L) === 5)
    // fraction-denominated: halving the target fraction buys one bit
    assert(AnnParams.lshBits(2000, 16, 0.25) === 6)
    assert(AnnParams.lshBits(2000, 16, 1.0) === 4)
    // more tables at a fixed fraction need a finer space per table
    assert(AnnParams.lshBits(2000, 32, 0.5) === 6)
    // exact power-of-two ratios sit ON the boundary, not past it (the
    // FP log2 guard: 16/0.25 = 64 must read as 6 bits, never 7)
    assert(AnnParams.lshBits(1L << 40, 8, 0.125) === 6)
    // occupancy bound: bits beyond ⌈log2(n)⌉ shatter buckets below one
    // vector each — the n-derived clamp wins on tiny corpora
    assert(AnnParams.lshBits(8, 16, 0.25) === 3)
    assert(AnnParams.lshBits(1) === 1)
    // ...and the clamp message fires exactly when the bound binds
    assert(AnnParams.lshClampMsg(8, 16, 0.25).nonEmpty)
    assert(AnnParams.lshClampMsg(64, 16, 0.25).isEmpty)
    assert(AnnParams.lshClampMsg(500, 16, 0.25).isEmpty)
    // the MaxLshBits ceiling warns when it binds too (warn-on-bind is
    // the file's convention): 16 tables / 2^-59 frac wants 63 bits —
    // one past the 62-bit packed-long ceiling; at 2^-58 it wants
    // exactly 62 and stays silent
    assert(AnnParams.maxLshBitsClampMsg(16, math.pow(2, -59)).nonEmpty)
    assert(AnnParams.maxLshBitsClampMsg(16, math.pow(2, -59)).get
      .contains("MaxLshBits"))
    assert(AnnParams.maxLshBitsClampMsg(16, math.pow(2, -58)).isEmpty)
    assert(AnnParams.maxLshBitsClampMsg(16, 0.5).isEmpty)
    // the derivation still returns the capped depth when it fires
    assert(AnnParams.lshBits(1L << 62, 16, math.pow(2, -59)) ===
      AnnParams.MaxLshBits)
    // degenerate inputs are loud
    intercept[IllegalArgumentException](AnnParams.lshBits(0))
    intercept[IllegalArgumentException](AnnParams.lshBits(100, tables = 0))
    intercept[IllegalArgumentException](
      AnnParams.lshBits(100, targetCandFrac = 0.0))
    intercept[IllegalArgumentException](
      AnnParams.lshBits(100, targetCandFrac = 1.5))
  }

  test("clamps and floors bind where documented") {
    // no lower nlist clamp: ⌈√n⌉ keeps tiny corpora trainable (a floor
    // of 16 demanded 16 seed vectors from a ~n/4-row sample, so corpora
    // of roughly 17-63 vectors could never train at all)
    assert(AnnParams.nlist(1) === 1)
    assert(AnnParams.nlist(40) === 7)
    assert(AnnParams.candK(1, 5) === AnnParams.CandFloor)
    assert(AnnParams.flatCandK(1, 5) === AnnParams.FlatCandFloor)
    // the driver-state ceiling: 10^11 vectors still cap at 65536 cells
    assert(AnnParams.nlist(100000000000L) === AnnParams.MaxNlist)
    // ...and candidate depth caps at the per-task-memory ceiling instead
    // of deriving a heap-sized Int from the ∝n rule
    assert(AnnParams.candK(100000000000L, 5) === AnnParams.MaxCandK)
    assert(AnnParams.flatCandK(100000000000L, 5) === AnnParams.MaxCandK)
    // a requested k above the cap still wins (the caller asked for it)
    assert(AnnParams.candK(100000000000L, k = 100000) === 100000)
    // nprobe never exceeds the cell count at any fraction
    assert(AnnParams.nprobe(1000000L, probeFrac = 1.0) ===
      AnnParams.nlist(1000000L))
    // candidate depth never shrinks below the requested k
    assert(AnnParams.candK(100, k = 200) === 200)
    // exact blocked grid: the floor keeps the measured testdata scales
    // at the historically tested 8-block shape (results are
    // block-count-invariant, so no oracle depends on this), the rule
    // bounds per-task rows at the 128 MB target, the cap marks where
    // O(n²) exact work outgrew a single job
    assert(AnnParams.bruteBlocks(2000) === 8)
    assert(AnnParams.bruteBlocks(10000000) === 77)
    assert(AnnParams.bruteBlocks(1000000000) === 1024)
    // n = 0 is VALID here (unlike the training-dependent knobs): the
    // exact paths' empty-in-empty-out contract must survive a caller
    // deriving blocks from count()
    assert(AnnParams.bruteBlocks(0) === 8)
    // semdedup: nlist ∝ n for a fixed cell size, clamped at the
    // driver-state ceiling
    assert(AnnParams.semDedupNlist(64) === 1)
    assert(AnnParams.semDedupNlist(6400) === 100)
    assert(AnnParams.semDedupNlist(1000000000000L) === AnnParams.MaxNlist)
    // degenerate inputs are loud, not silently clamped
    intercept[IllegalArgumentException](AnnParams.nlist(0))
    intercept[IllegalArgumentException](AnnParams.nprobe(100, probeFrac = 0.0))
    intercept[IllegalArgumentException](AnnParams.candK(100, k = 0))
    intercept[IllegalArgumentException](AnnParams.semDedupNlist(100, targetCellSize = 0))
  }

  test("ceiling-bind messages fire exactly past each documented cap, never at it") {
    // MaxNlist = 65536 binds at ⌈√n⌉ > 65536, i.e. n > 65536²
    val nlistEdge = 65536L * 65536L
    assert(AnnParams.nlistClampMsg(nlistEdge).isEmpty)
    assert(AnnParams.nlistClampMsg(nlistEdge + 1).nonEmpty)
    assert(AnnParams.nlistClampMsg(2000).isEmpty)
    // the message names the regime and the knob to raise
    val m = AnnParams.nlistClampMsg(nlistEdge + 1).get
    assert(m.contains("MaxNlist") && m.contains("linearly"))
    // MaxCandK = 65536 binds at ⌈γ·ρ·n⌉ > 65536: at the oracle fractions
    // γ·ρ = 0.0625, the boundary is n = 65536/0.0625 = 2^20 exactly
    val candEdge = (AnnParams.MaxCandK / (AnnParams.CandFrac * AnnParams.ProbeFrac)).toLong
    assert(AnnParams.candKClampMsg(candEdge, AnnParams.ProbeFrac,
      AnnParams.CandFrac, "candK").isEmpty)
    assert(AnnParams.candKClampMsg(candEdge + 16, AnnParams.ProbeFrac,
      AnnParams.CandFrac, "candK").nonEmpty)
    val mc = AnnParams.candKClampMsg(candEdge + 16, AnnParams.ProbeFrac,
      AnnParams.CandFrac, "candK").get
    assert(mc.contains("MaxCandK") && mc.contains("recall"))
    // flat path: ρ ≡ 1, boundary at 65536/0.05
    val flatEdge = (AnnParams.MaxCandK / AnnParams.FlatCandFrac).toLong
    assert(AnnParams.candKClampMsg(flatEdge, 1.0,
      AnnParams.FlatCandFrac, "flatCandK").isEmpty)
    assert(AnnParams.candKClampMsg(flatEdge + 32, 1.0,
      AnnParams.FlatCandFrac, "flatCandK").nonEmpty)
    // semdedup: ⌈n/64⌉ > 65536 ⇔ n > 64·65536
    val sdEdge = 64L * 65536L
    assert(AnnParams.semDedupClampMsg(sdEdge, 64).isEmpty)
    assert(AnnParams.semDedupClampMsg(sdEdge + 1, 64).nonEmpty)
    assert(AnnParams.semDedupClampMsg(sdEdge + 1, 64).get.contains("n²"))
    // the derivation methods still return the documented capped values
    // when the message fires (warning, not a behavior change)
    assert(AnnParams.nlist(nlistEdge + 1) === AnnParams.MaxNlist)
    assert(AnnParams.candK(candEdge + 16, 5) === AnnParams.MaxCandK)
    assert(AnnParams.semDedupNlist(sdEdge + 1) === AnnParams.MaxNlist)
  }

  test("semdedup near-background guidance fires when the co-cell baseline is low") {
    // baseline 1/nlist: 8 cells (the 500-vector sfs) → 0.125, above the
    // 0.1 bar → silent; 32 cells (sf0.1, the measured 0.215 low-band
    // regime) → 0.031 → guidance fires and names the exhaustive tool
    assert(AnnParams.semDedupLowBandMsg(500, 8).isEmpty)
    val msg = AnnParams.semDedupLowBandMsg(2000, 32)
    assert(msg.nonEmpty && msg.get.contains("cosineNearDupPairs"))
    // boundary: 1/10 is NOT below the 0.1 bar; 1/11 is
    assert(AnnParams.semDedupLowBandMsg(640, 10).isEmpty)
    assert(AnnParams.semDedupLowBandMsg(704, 11).nonEmpty)
  }

  test("ceiling-bind warnings surface as an Observation past each cap, identity below") {
    val df = spark.range(4).toDF("id")
    // below every cap (all tested scales): the frame comes back
    // UNTOUCHED — no CollectMetrics node, no metric noise
    val (same, none) = AnnParams.observeClamps(df, 2000L)
    assert(none.isEmpty && (same eq df))
    // past the nlist cap, n > MaxNlist² also binds candK, flatCandK,
    // and semDedupNlist at the default fractions — all four messages
    // ride the observation and fill on the first action
    val nBig = 65536L * 65536L + 1
    assert(AnnParams.clampMessages(nBig).length === 4)
    val (obsDf, obsOpt) = AnnParams.observeClamps(df, nBig)
    val obs = obsOpt.getOrElse(fail("expected an observation past the caps"))
    // one action fills the metrics AND proves the rows are untouched
    assert(obsDf.collect().toSeq === df.collect().toSeq)
    val m = obs.get
    assert(m("caps_bound") === 4)
    val txt = m("cap_messages").toString
    assert(txt.contains("MaxNlist") && txt.contains("MaxCandK") &&
      txt.contains("semDedupNlist"))
    // the LSH occupancy bound fires through the same surface (tiny
    // corpus, fraction-derived depth past ⌈log2(n)⌉)
    val (lshDf, lshOpt) = AnnParams.observeClamps(df, 8L)
    val lshObs = lshOpt.getOrElse(fail("expected the occupancy bind at n = 8"))
    lshDf.collect()
    assert(lshObs.get("caps_bound") === 1)
    assert(lshObs.get("cap_messages").toString.contains("occupancy"))
  }

  test("derived values at the measured testdata scales match the grid-measured configuration") {
    // n = 500 (sf0.001 / sf0.01 embeddings) and n = 2000 (sf0.1): the
    // oracle CASE bands in PipelineQueries were measured at EXACTLY these
    // operating points (RecallGrid) — pin them so a rule tweak and the
    // bands can only move together
    assert((AnnParams.nlist(500), AnnParams.nprobe(500), AnnParams.candK(500, 5))
      === ((23, 15, 80)))
    assert((AnnParams.nlist(2000), AnnParams.nprobe(2000), AnnParams.candK(2000, 5))
      === ((45, 29, 125)))
    assert(AnnParams.flatCandK(500, 5) === 50)
    assert(AnnParams.flatCandK(2000, 5) === 100)
    // plain IVF probes at its own grid-measured fraction
    assert(AnnParams.nprobe(500, AnnParams.IvfProbeFrac) === 11)
    assert(AnnParams.nprobe(2000, AnnParams.IvfProbeFrac) === 21)
    // semdedup cell counts: 8 at both 500-vector sfs (the historically
    // measured config), 32 at 2000
    assert(AnnParams.semDedupNlist(500) === 8)
    assert(AnnParams.semDedupNlist(2000) === 32)
  }
}
