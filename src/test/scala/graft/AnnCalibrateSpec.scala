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

  test("degenerate calibration inputs fail loudly") {
    intercept[IllegalArgumentException](
      AnnCalibrate.calibrateIvfPq(emb, "vec_id", "embedding", recallTarget = 0.0))
    intercept[IllegalArgumentException](
      AnnCalibrate.calibrateIvf(emb, "vec_id", "embedding", recallTarget = 1.5))
    intercept[IllegalArgumentException](
      AnnCalibrate.calibrateIvf(emb, "vec_id", "embedding", recallTarget = 0.8,
        rhoGrid = Seq.empty))
  }
}
