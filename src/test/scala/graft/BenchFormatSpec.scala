package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** The bench metrics line is the round's perf artifact: a malformed or
  * over-budget line nulls the round (it nulled rounds 1-3). These tests
  * machine-check every tier's invariants — parseability, the tail
  * budget, key-style consistency between the queries and spread maps,
  * total reconciliation, and error-proof sweep walls — without a Spark
  * run.
  */
class BenchFormatSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private def parse(s: String) = mapper.readTree(s)
  private def keys(n: com.fasterxml.jackson.databind.JsonNode): Set[String] =
    n.fieldNames().asScala.toSet

  /** Deterministic synthetic corpus: n queries across a few families,
    * reps sweep-times each, mild per-sweep jitter.
    */
  private def corpus(n: Int, reps: Int = 3): BenchInput = {
    val names = (0 until n).map(i => s"q_fam${i % 7}_op$i")
    // per-sweep jitter grows with the query index so some queries
    // clear the 0.05 s spread floor and others stay under it
    val times = names.zipWithIndex.map { case (nm, i) =>
      nm -> List.tabulate(reps)(r => 0.2 + (i % 13) * 0.11 + r * 0.01 * (i % 9))
    }.toMap
    BenchInput(names, times, Map.empty, reps, "/root/testdata/sf0.1")
  }

  test("small corpus: full tier — prefixed keys, spread correlates, sweeps present") {
    val in = corpus(8)
    val line = BenchFormat.metricsLine(in)
    val j = parse(line)
    assert(j.get("unit").asText() === "sec")
    assert(!j.has("note"), "small corpus must get the full tier")
    val qk = keys(j.get("queries"))
    assert(qk === in.names.toSet, "full tier keeps the q_ prefix")
    assert(j.get("sweeps").size() === in.reps)
    // spread keys must be a subset of the queries map's keys — the
    // round-8 review found them stripped while queries were not
    if (j.has("spread"))
      assert(keys(j.get("spread")).subsetOf(qk))
    val total = in.names.map(n => in.timesOf(n).min).sum
    assert(math.abs(j.get("value").asDouble() - total) < 0.01)
  }

  test("every corpus size emits a parseable line within the tail budget") {
    for (n <- Seq(1, 40, 90, 110, 150, 220, 300)) {
      val line = BenchFormat.metricsLine(corpus(n))
      assert(line.length <= 1850, s"n=$n line ${line.length} chars")
      val j = parse(line) // throws on malformed JSON
      assert(j.get("metric").asText() === "total", s"n=$n")
    }
  }

  test("family-rollup tier: value reconciles with queries + rest") {
    val in = corpus(300)
    val j = parse(BenchFormat.metricsLine(in))
    assert(j.has("rest"), "300 queries must hit the rollup tier")
    assert(j.get("qunit").asText() === "cs")
    val qSum = j.get("queries").elements().asScala.map(_.asLong()).sum
    val rSum = j.get("rest").elements().asScala.map(_.asLong()).sum
    // the sub-0.3s family tail may be folded into one self-describing
    // bucket — its cs participates in the reconciliation
    val oSum = if (j.has("rest_other")) j.get("rest_other").get("cs").asLong() else 0L
    val oN = if (j.has("rest_other")) j.get("rest_other").get("n").asInt() else 0
    val entries = j.get("queries").size() + j.get("rest").size() + oN
    // each entry rounds independently to a centisecond
    assert(math.abs(j.get("value").asDouble() - (qSum + rSum + oSum) / 100.0)
      <= 0.005 * entries + 0.01)
    // the reserved spread map must have survived the budget fit
    assert(j.has("spread"), "rollup tier reserves top-3 spread entries")
    val stripped = keys(j.get("queries")) ++ keys(j.get("rest"))
    assert(keys(j.get("spread")).forall(k => !k.startsWith("q_")),
      "stripped tiers strip spread keys too")
    assert(stripped.forall(k => !k.startsWith("q_")))
  }

  test("rollup tier folds the sub-0.3s family tail into a self-describing bucket") {
    // 240 queries: 2 big families carry the time, 200 single-query tiny
    // families are the long tail that crowded every per-query minimum
    // out of the r13 artifact ("top 0/237"). The fold must keep the
    // line in budget, leave REAL per-query minima in `queries`, state
    // its own size, and reconcile.
    val bigNames = (0 until 40).map(i => s"q_big${i % 2}_op$i")
    val tinyNames = (0 until 200).map(i => s"q_tiny${i}_x")
    val names = bigNames ++ tinyNames
    val times = (bigNames.map(_ -> List(2.0, 2.0, 2.0)) ++
      tinyNames.map(_ -> List(0.05, 0.05, 0.05))).toMap
    val in = BenchInput(names, times, Map.empty, 3, "/root/testdata/sf0.1")
    val line = BenchFormat.metricsLine(in)
    assert(line.length <= 1850)
    val j = parse(line)
    assert(j.has("rest_other") && j.get("rest_other").get("n").asInt() >= 3)
    assert(j.get("note").asText().contains("rest_other"))
    assert(j.get("queries").size() > 0,
      "the fold exists to put per-query minima back in the artifact")
    val qSum = j.get("queries").elements().asScala.map(_.asLong()).sum
    val rSum = j.get("rest").elements().asScala.map(_.asLong()).sum
    val oSum = j.get("rest_other").get("cs").asLong()
    val entries = j.get("queries").size() + j.get("rest").size() +
      j.get("rest_other").get("n").asInt()
    assert(math.abs(j.get("value").asDouble() - (qSum + rSum + oSum) / 100.0)
      <= 0.005 * entries + 0.01)
  }

  test("many mid-size families: fold floor escalates, line fits, minima survive") {
    // the REAL r15 shape that shipped a 1959-char line with zero
    // per-query minima: 283 queries across ~60 distinct families, most
    // families over the old fixed 0.3 s fold floor, reps=1 (no spread to
    // shrink), loadavg + degraded fields present
    val names = (0 until 283).map(i => s"q_fam${i % 60}_op$i")
    val times = names.zipWithIndex.map { case (nm, i) =>
      nm -> List(0.35 + (i % 17) * 0.13)
    }.toMap
    val in = BenchInput(names, times, Map.empty, 1, "/root/testdata/sf0.1",
      warmup = 1, loads = Seq(0.5, 1.9, 1.2), degraded = Seq("reps3->1"))
    val line = BenchFormat.metricsLine(in)
    assert(line.length <= 1850, s"line ${line.length} chars")
    val j = parse(line)
    assert(j.get("queries").size() >= 10,
      "per-query minima are what perf triage reads — the fold floor must escalate to fit them")
    assert(j.get("degraded").asText() === "reps3->1")
    // total reconciles through whatever fold level was chosen
    val qSum = j.get("queries").elements().asScala.map(_.asLong()).sum
    val rSum = j.get("rest").elements().asScala.map(_.asLong()).sum
    val oSum = if (j.has("rest_other")) j.get("rest_other").get("cs").asLong() else 0L
    val oN = if (j.has("rest_other")) j.get("rest_other").get("n").asInt() else 0
    val entries = j.get("queries").size() + j.get("rest").size() + oN
    assert(math.abs(j.get("value").asDouble() - (qSum + rSum + oSum) / 100.0)
      <= 0.005 * entries + 0.01)
  }

  test("mid-size corpus keeps dispersion in the stripped tiers") {
    // the round-8 review's gap: compact/centi previously dropped the
    // spread map entirely
    val in = corpus(95)
    val j = parse(BenchFormat.metricsLine(in))
    assert(j.has("note") && !j.has("rest"), "95 queries: a stripped flat tier")
    assert(j.has("spread"))
    assert(keys(j.get("spread")).subsetOf(keys(j.get("queries"))))
  }

  test("reps=1 emits no spread map") {
    val j = parse(BenchFormat.metricsLine(corpus(8, reps = 1)))
    assert(!j.has("spread"))
  }

  test("a query failing mid-run is excluded from every sweep wall") {
    val names = Seq("q_a_1", "q_b_2", "q_c_3")
    val times = Map(
      "q_a_1" -> List(1.0, 1.0, 1.0),
      "q_b_2" -> List(5.0), // failed in sweep 1
      "q_c_3" -> List(2.0, 2.0, 2.0))
    val in = BenchInput(names, times,
      Map("q_b_2" -> "boom"), 3, "/root/testdata/sf0.1")
    // walls must be like-for-like: the failed query contributes to NO
    // wall, so all three agree instead of stepping 8 -> 3 -> 3
    assert(BenchFormat.sweepWalls(in) === IndexedSeq(3.0, 3.0, 3.0))
    val j = parse(BenchFormat.metricsLine(in))
    assert(j.get("errors").get("q_b_2").asText() === "boom")
    val d = parse(BenchFormat.detailLine(in))
    assert(d.get("errors").get("q_b_2").asText() === "boom")
    assert(d.get("queries").get("q_b_2").size() === 1)
  }

  test("fuzz: random corpora always emit a parseable line inside the budget") {
    // seeded-Random fuzz (house style): sizes, reps, magnitudes, error
    // mixes, and name lengths all vary — the invariants may not
    val rng = new scala.util.Random(11)
    for (trial <- 0 until 200) {
      val n = 1 + rng.nextInt(400)
      val reps = 1 + rng.nextInt(4)
      // family count varies 1..80: the r15 overflow hid behind a fuzz
      // corpus that only ever drew 9 families
      val nFam = 1 + rng.nextInt(80)
      val names = (0 until n).map(i =>
        s"q_f${rng.nextInt(nFam)}_${"x" * rng.nextInt(12)}$i")
      val errQs = names.filter(_ => rng.nextDouble() < 0.03).toSet
      val times = names.map { nm =>
        val full = List.fill(reps)(rng.nextDouble() * 9)
        nm -> (if (errQs(nm)) full.take(rng.nextInt(reps)) else full)
      }.toMap
      val errors = errQs.map(_ -> "err \"quoted\"\nline").toMap
      // half the trials carry loadavg context (the post-r9 shape) so the
      // tail-budget invariant covers the wider line too
      val loads = if (rng.nextBoolean())
        Seq.fill(reps + 2)(rng.nextDouble() * 40) else Nil
      val in = BenchInput(names, times, errors, reps, "/root/testdata/sf0.1",
        warmup = if (loads.isEmpty) 0 else 1, loads = loads)
      val line = BenchFormat.metricsLine(in)
      assert(line.length <= 1850, s"trial $trial: ${line.length} chars at n=$n")
      val j = parse(line)
      assert(j.get("metric").asText() === "total", s"trial $trial")
      assert(j.get("sweeps").size() === reps, s"trial $trial")
      if (errQs.nonEmpty && j.has("errors"))
        assert(keys(j.get("errors")).nonEmpty)
      parse(BenchFormat.detailLine(in))
    }
  }

  test("detail line records every rep in sweep order") {
    val in = corpus(8)
    val d = parse(BenchFormat.detailLine(in))
    assert(d.get("qunit").asText() === "cs")
    assert(d.get("sweep_wall_s").size() === in.reps)
    for (n <- in.names) {
      val reps = d.get("queries").get(n)
      assert(reps.size() === in.reps)
      val expect = in.timesOf(n).map(t => math.round(t * 100))
      assert(reps.elements().asScala.map(_.asLong()).toList === expect)
    }
  }

  test("detail line carries warm-up count and per-sweep loadavg context") {
    val in = corpus(4).copy(warmup = 1, loads = Seq(2.53, 1.1, 1.0, 0.9, 0.8))
    val d = parse(BenchFormat.detailLine(in))
    assert(d.get("warmup").asInt() === 1)
    // warmup + reps + 1 boundary samples, 1-decimal rendering
    assert(d.get("loadavg").size() === 5)
    assert(d.get("loadavg").get(0).asDouble() === 2.5)
    // warm-up sweeps are DISCARDED: per-query rep lists and walls still
    // count only the measured sweeps
    assert(d.get("sweep_wall_s").size() === in.reps)
    // the metrics line carries the loadavg context too (VERDICT r9 #4:
    // the shipped artifact must describe the box state on its own) but
    // stays warm-up-count-agnostic
    val j = parse(BenchFormat.metricsLine(in))
    assert(!j.has("warmup"))
    assert(j.get("loadavg").size() === 5)
    assert(j.get("loadavg").get(0).asDouble() === 2.5)
    // loads omitted entirely → no loadavg key (old-artifact shape)
    assert(!parse(BenchFormat.detailLine(corpus(4))).has("loadavg"))
    assert(!parse(BenchFormat.metricsLine(corpus(4))).has("loadavg"))
  }

  test("settle wait appears in both artifacts only when the run actually waited") {
    // VERDICT r10 #3: the bench now waits (bounded) for the box to go
    // quiet before its first sweep; the artifact records the wait so a
    // timed-out settle into a busy box stays attributable from JSON
    val waited = corpus(4).copy(settleS = 95)
    assert(parse(BenchFormat.metricsLine(waited)).get("settle").asInt() === 95)
    assert(parse(BenchFormat.detailLine(waited)).get("settle_s").asInt() === 95)
    // quiet box (settleS = 0, the common case): no key, no bytes spent
    assert(!parse(BenchFormat.metricsLine(corpus(4))).has("settle"))
    assert(!parse(BenchFormat.detailLine(corpus(4))).has("settle_s"))
    // survives tier compression under budget on a big corpus
    val big = corpus(300).copy(settleS = 120)
    val line = BenchFormat.metricsLine(big)
    assert(parse(line).get("settle").asInt() === 120)
    assert(line.length <= 1850)
  }

  test("metrics line self-flags sweep walls that disagree >5%") {
    // VERDICT r9 #5: the 2.2%-replication close-out discipline lived in
    // commit messages; the artifact now says it itself. Agreeing walls
    // carry no warn; a 43%-spread r8-shaped run does.
    val names = Seq("q_a_1", "q_b_2")
    val quiet = BenchInput(names,
      Map("q_a_1" -> List(5.0, 5.1, 4.95), "q_b_2" -> List(2.0, 2.02, 2.0)),
      Map.empty, 3, "/root/testdata/sf0.1")
    assert(!parse(BenchFormat.metricsLine(quiet)).has("warn"))
    val noisy = BenchInput(names,
      Map("q_a_1" -> List(8.0, 5.0, 4.8), "q_b_2" -> List(2.0, 1.9, 1.9)),
      Map.empty, 3, "/root/testdata/sf0.1")
    val j = parse(BenchFormat.metricsLine(noisy))
    assert(j.get("warn").asText().contains(">5%"))
    // the warn survives tier compression on a big corpus
    val big = corpus(300)
    val bigNoisy = big.copy(times = big.times.map { case (k, ts) =>
      k -> ts.zipWithIndex.map { case (t, i) => if (i == 0) t * 1.3 else t } })
    val jb = parse(BenchFormat.metricsLine(bigNoisy))
    assert(jb.has("rest") && jb.get("warn").asText().contains(">5%"))
    assert(BenchFormat.metricsLine(bigNoisy).length <= 1850)
  }

  test("replacement sweeps are recorded in both artifacts, only when they ran") {
    // VERDICT r12 #5: a busy window now costs one extra sweep, recorded
    // as `resweeps` — the artifact must say a replacement happened (the
    // shipped walls are not the raw first three), and stay silent when
    // none did.
    val names = Seq("q_a_1", "q_b_2")
    val base = BenchInput(names,
      Map("q_a_1" -> List(5.0, 5.1, 4.95), "q_b_2" -> List(2.0, 2.02, 2.0)),
      Map.empty, 3, "/root/testdata/sf0.1")
    assert(!parse(BenchFormat.metricsLine(base)).has("resweeps"))
    assert(!parse(BenchFormat.detailLine(base)).has("resweeps"))
    val reswept = base.copy(resweeps = 1)
    assert(parse(BenchFormat.metricsLine(reswept)).get("resweeps").asInt() === 1)
    assert(parse(BenchFormat.detailLine(reswept)).get("resweeps").asInt() === 1)
    // agreeing walls after a replacement: resweeps present, no warn —
    // the dodge worked and the artifact says so
    assert(!parse(BenchFormat.metricsLine(reswept)).has("warn"))
    // a replacement that did NOT restore agreement ships BOTH fields:
    // the honest residual warn plus the record that a retry was spent
    val stillNoisy = reswept.copy(times =
      Map("q_a_1" -> List(8.0, 5.0, 4.8), "q_b_2" -> List(2.0, 1.9, 1.9)))
    val j = parse(BenchFormat.metricsLine(stillNoisy))
    assert(j.get("resweeps").asInt() === 1 && j.get("warn").asText().contains(">5%"))
    // the field survives tier compression within budget
    val big = corpus(300).copy(resweeps = 2)
    val jb = parse(BenchFormat.metricsLine(big))
    assert(jb.get("resweeps").asInt() === 2)
    assert(BenchFormat.metricsLine(big).length <= 1850)
  }

  test("entries displaced by a replacement sweep still bound per-query minima") {
    // a busy window can open AFTER a query ran its fastest rep in the
    // outlier sweep: replacing that sweep must not raise the query's
    // reported min — the displaced entry came from a real run and stays
    // evidence (additive noise: any observed run bounds the true cost)
    val names = Seq("q_a_1", "q_b_2")
    val in = BenchInput(names,
      // q_a_1's shipped sweeps min to 1.0, but the displaced entry from
      // the replaced sweep was its true fastest run at 0.8
      Map("q_a_1" -> List(1.0, 1.0, 1.1), "q_b_2" -> List(2.0, 2.0, 2.0)),
      Map.empty, 3, "/root/testdata/sf0.1",
      resweeps = 1, displaced = Map("q_a_1" -> 0.8))
    assert(in.minOf("q_a_1") === Some(0.8))
    assert(in.minOf("q_b_2") === Some(2.0))
    val j = parse(BenchFormat.metricsLine(in))
    assert(j.get("queries").get("q_a_1").asDouble() === 0.8)
    // walls stay the SHIPPED sweeps only (a min-merged wall would
    // fabricate a sweep that never ran)
    assert(BenchFormat.sweepWalls(in).map(math.round) === IndexedSeq(3L, 3L, 3L))
    // the detail artifact records the displaced entries for triage
    val d = parse(BenchFormat.detailLine(in))
    assert(d.get("displaced").get("q_a_1").asLong() === 80L)
  }

  test("replacement-sweep-only failures stay out of `errors` but reach the detail artifact") {
    // r13 ADVICE: a query that errors ONLY during a replacement sweep
    // carries a complete measured rep set — flagging it in `errors`
    // would show a reader both a real min and an error for the same
    // query. Bench routes it to resweepErrors; the stdout line stays
    // error-free and the detail artifact records the failure for triage.
    val names = Seq("q_a_1", "q_b_2")
    val in = BenchInput(names,
      Map("q_a_1" -> List(1.0, 1.0, 1.0), "q_b_2" -> List(2.0, 2.0, 2.0)),
      Map.empty, 3, "/root/testdata/sf0.1",
      resweeps = 1, resweepErrors = Map("q_b_2" -> "boom"))
    val j = parse(BenchFormat.metricsLine(in))
    assert(!j.has("errors"))
    assert(j.get("queries").get("q_b_2").asDouble() === 2.0)
    val d = parse(BenchFormat.detailLine(in))
    assert(!d.has("errors"))
    assert(d.get("resweep_errors").get("q_b_2").asText() === "boom")
    // absent when empty — every detail field stays self-describing
    assert(!parse(BenchFormat.detailLine(in.copy(resweepErrors = Map.empty)))
      .has("resweep_errors"))
  }
}
