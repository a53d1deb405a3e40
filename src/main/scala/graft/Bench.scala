package graft

import java.nio.file.{Files, Paths}

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR with a noop sink and emits ONE JSON metrics line.
  *
  * Integrity contract: a query that throws is recorded in an `errors`
  * map (name → exception) and makes the process exit non-zero — a broken
  * query must never masquerade as a fast success. The JSON is emitted as
  * the final stdout lines (bare + sentinel-prefixed; build.sbt's
  * run/outputStrategy := StdoutOutput keeps sbt from adding an `[info] `
  * prefix) and also written to `target/bench.json`.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    // HARD wall budget (VERDICT r14 #3): r14 shipped NO bench artifact —
    // the corpus grew 16%, per-sweep wall hit ~300-345 s, and the worst
    // case (settle + warm-up + 3 reps + 2 resweeps) crossed the driver's
    // timeout, which killed the run with rc=124 and parsed:null. The
    // budget is measured from here (settle + every sweep counts) and the
    // loop DEGRADES deterministically to fit — drop resweeps, then
    // remaining reps, then promote the warm-up sweep to measured — so a
    // tight budget ships a smaller-rep artifact instead of none.
    val bench0 = System.nanoTime()
    def elapsedS: Double = (System.nanoTime() - bench0) / 1e9
    val maxWall = sys.env.get("SPARK_GRAFT_MAX_WALL_S").flatMap(_.toIntOption)
      .filter(_ > 0).getOrElse(1140)
    def remainS: Double = maxWall - elapsedS
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(master = s"local[$cpus]",
      appName = "graft-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up codegen/JIT, the parquet reader, and the noop-sink write
    // path on a real fact table so the first timed query doesn't absorb
    // ~10s of one-time startup cost (JIT, codegen compiler, committer)
    spark.range(2000000).selectExpr("sum(id * 2)").collect()
    try {
      spark.read.parquet(s"$sfDir/nation.parquet")
        .write.format("noop").mode("overwrite").save()
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count()
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }
    // optional comma-separated name filter for local iteration; the
    // driver sets no filter and measures everything
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet).filter(_.nonEmpty)
    // Repetitions per query, reported time = MIN across reps. One rep per
    // query (rounds 1-4) cannot distinguish a real regression from GC /
    // page-cache / JIT noise — round 4's q_unpivot read 2.35x slower with
    // zero code change and nobody could prove it was noise from the
    // artifact. The minimum is the standard noise filter: noise is
    // strictly additive (a rep can only be slowed down, never sped up
    // below the true cost), so min converges on the true cost as reps
    // grow. A failing query is not retried — its first error is recorded
    // and the remaining reps are skipped.
    val reps = sys.env.get("SPARK_GRAFT_REPS").flatMap(_.toIntOption)
      .filter(_ >= 1).getOrElse(3)
    // Discarded warm-up sweeps before the measured ones. Min-of-N does
    // not defend against a cold FIRST sweep inflating minima corpus-wide
    // when N is small: r8's artifact had sweep walls 242.7/182.4/170.2 s
    // (JIT + page-cache warm-up leaking into the measurement) and its
    // min-of-3 total disagreed with a quiet-box run of the same HEAD by
    // 5.7%. One full discarded sweep pays ~1/4 more wall time to make
    // every measured sweep start JIT-warm and cache-warm. ab.sh opts out
    // (SPARK_GRAFT_WARMUP=0): its cross-JVM interleaving is the noise
    // defense there, and per-run warm-ups would double its cost.
    val warm = sys.env.get("SPARK_GRAFT_WARMUP").flatMap(_.toIntOption)
      .filter(_ >= 0).getOrElse(1)
    // Reps are interleaved as FULL SWEEPS (run the whole corpus, then
    // run it again), not back-to-back per query: session transients —
    // a major GC, a JIT deopt storm as 120 codegen'd plans fill the
    // code cache — last seconds, so three consecutive reps of one query
    // can all land inside the same bad window and min() keeps the
    // inflated number (observed: a query timing 6.2 s min-of-3
    // consecutive but 0.8 s in isolation). Across sweeps minutes apart,
    // a transient would have to recur at the same query three times.
    val names = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // ALL rep times are kept (sweep order), not just the min: min is
    // the reported cost, but without per-query dispersion a regression
    // can't be triaged from the artifact alone — r7's q_ann_lsh moved
    // +51% round-over-round and nothing in the JSON said whether its
    // three reps agreed (real change) or straddled a bad sweep (noise).
    val times = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    val firstErr = scala.collection.mutable.Map[String, String]()
    // 1-min system loadavg at each sweep boundary (warm-up included):
    // box-load context for the artifact, so a sweep-wall disagreement
    // can be attributed to machine state instead of guessed at.
    val loads = scala.collection.mutable.ArrayBuffer[Double]()
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    // VERDICT r10 #3: all three r10 artifact runs self-flagged >5% wall
    // disagreement with loadavg up to 2.2 — background load the bench
    // started into. Use the instrumentation instead of hoping: wait
    // (bounded) for the 1-min loadavg to fall below
    // SPARK_GRAFT_SETTLE_LOAD (default 1.0) before the first sweep, up
    // to SPARK_GRAFT_SETTLE_S seconds (default 120; 0 disables — ab.sh
    // style interleaved runs want back-to-back starts). The wait is
    // recorded in both artifacts ("settle"), so a run that timed out
    // into a still-busy box stays attributable from the JSON alone.
    val settleLoad = sys.env.get("SPARK_GRAFT_SETTLE_LOAD")
      .flatMap(_.toDoubleOption).getOrElse(1.0)
    // settle never eats more than 1/8 of the wall budget: waiting for a
    // quiet box is pointless if the wait itself forces a rep drop
    val settleMax = math.min(
      sys.env.get("SPARK_GRAFT_SETTLE_S").flatMap(_.toIntOption).getOrElse(120),
      maxWall / 8)
    val settle0 = System.nanoTime()
    while (settleMax > 0 && osBean.getSystemLoadAverage >= settleLoad &&
           (System.nanoTime() - settle0) / 1e9 < settleMax) {
      // sleep only to the deadline: a fixed quantum could overshoot the
      // documented settleMax cap by up to 5 s
      val remainMs = settleMax * 1000L - (System.nanoTime() - settle0) / 1000000L
      Thread.sleep(math.max(1L, math.min(5000L, remainMs)))
    }
    val settledS = math.round((System.nanoTime() - settle0) / 1e9).toInt
    // Degradation ledger: every budget-forced deviation from the
    // requested (warm, reps, resweeps) plan is recorded and shipped in
    // both artifacts so a smaller-than-usual rep count stays explained.
    val degraded = scala.collection.mutable.ArrayBuffer[String]()
    // Entries displaced by an accepted replacement. They came from a
    // REAL measured run, so they stay evidence for each query's min
    // (min is the additive-noise filter — any observed run bounds the
    // true cost from above) even though the sweep they belonged to no
    // longer ships as a wall. Without this, a replacement could RAISE a
    // query's reported min: the outlier sweep's busy window may have
    // opened after some query ran its fastest rep.
    val displaced = scala.collection.mutable.Map[String, Double]()
    // LAST-RESORT artifact emission (VERDICT r14 #3, r15 #2): if anything
    // kills the JVM before the normal emit — the driver's timeout
    // foremost — a shutdown hook ships the best data measured so far,
    // flagged "killed-partial", instead of the rc=124/parsed:null hole
    // r14 shipped. Every mutation of the shared state happens under
    // `stateLock`, because the hook runs on its own thread: an
    // unsynchronized HashMap resize mid-append would throw inside the
    // hook's toMap, the catch would swallow it, and the run would ship
    // NOTHING — the exact hole the hook exists to close.
    @volatile var effRepsNow = 1
    @volatile var resweepsNow = 0
    val stateLock = new Object
    def mut[A](body: => A): A = stateLock.synchronized(body)
    // PER-QUERY partial-sweep state (VERDICT r15 #2): r15's degradation
    // ladder bottomed out at "promote the warm-up", but a warm-up that
    // never finishes yields nothing — the driver box cannot complete
    // even ONE 284-query sweep inside its budget, so two rounds shipped
    // zero per-query data. `pending` collects the in-flight sweep at
    // query granularity; `partialBest` is the largest partial (or the
    // latest COMPLETE, which always wins — it is a real measured run)
    // seen so far, the promotion source when no measured sweep fits.
    val pending = scala.collection.mutable.Map[String, Double]()
    var partialBest: Map[String, Double] = Map.empty
    var partialBestComplete = false
    // The one shippable truth at any instant, built the same way by the
    // normal emit, the shutdown hook, and the per-query disk checkpoint:
    // complete measured sweeps when any exist (with the resweep-only
    // error partition the normal path uses — the r15 hook re-flagged
    // those as real errors and zeroed resweeps, making a killed artifact
    // read WORSE than what was measured), else the largest partial as a
    // single flagged rep.
    // Set when promotion built `times` from warm/partial data: the
    // resweep-only partition below is then meaningless (effRepsNow=1 by
    // fiat, so a query that FAILED in the real measured attempt but has
    // a promoted warm time would classify as "resweep-only" and the run
    // would exit 0 with a genuinely broken query — violating the
    // header's masquerade contract). In promoted mode every first error
    // ships as a real error.
    @volatile var promotedMode = false
    def snapshotInput(extra: Seq[String]): BenchInput = mut {
      if (times.nonEmpty) {
        val (resweepOnly, real) =
          if (promotedMode) (Map.empty[String, String], firstErr.toMap)
          else firstErr.toMap.partition { case (n, _) =>
            times(n).length == effRepsNow }
        BenchInput(names.map(_._1), times.toMap, real, effRepsNow, sfDir,
          warm, loads.toSeq, settledS, resweepsNow, displaced.toMap,
          resweepOnly, degraded.toSeq ++ extra)
      } else {
        val flag =
          if (partialBest.isEmpty) Seq("measured-nothing")
          else if (partialBestComplete) Seq("warmup-promoted")
          else Seq(s"partial-sweep@${partialBest.size}/${names.size}")
        BenchInput(names.map(_._1),
          partialBest.map { case (n, t) => n -> List(t) },
          firstErr.toMap, 1, sfDir, warm, loads.toSeq, settledS,
          resweepsNow, Map.empty, Map.empty, degraded.toSeq ++ flag ++ extra)
      }
    }
    val emitted = new java.util.concurrent.atomic.AtomicBoolean(false)
    // Atomic artifact writes: the checkpoint fires after EVERY query, and
    // a driver that copies target/bench.json at kill time must never see
    // a torn half-line — write-to-temp + ATOMIC_MOVE. The writes are
    // SERIALIZED under emitLock: the shutdown hook runs on its own
    // thread, and an unserialized hook emit racing the main thread's
    // per-query checkpoint on the SHARED tmp paths could publish a
    // 'checkpoint'-flagged line as the final artifact, split the
    // json/detail pair across two snapshots, or lose the hook's move to
    // a swallowed NoSuchFileException. checkpoint() re-checks `emitted`
    // INSIDE the lock, so once the final emit (normal or emergency) has
    // claimed the slot no later checkpoint can overwrite it.
    val emitLock = new Object
    def writeArtifacts(metrics: String, detail: String): Unit =
      emitLock.synchronized {
        import java.nio.file.StandardCopyOption.{ATOMIC_MOVE, REPLACE_EXISTING}
        Files.createDirectories(Paths.get("target"))
        val t1 = Paths.get("target/.bench.json.tmp")
        Files.writeString(t1, metrics + "\n")
        Files.move(t1, Paths.get("target/bench.json"), ATOMIC_MOVE, REPLACE_EXISTING)
        val t2 = Paths.get("target/.bench_detail.json.tmp")
        Files.writeString(t2, detail + "\n")
        Files.move(t2, Paths.get("target/bench_detail.json"), ATOMIC_MOVE, REPLACE_EXISTING)
      }
    // DISK checkpoint (VERDICT r15 #2 + advice): the shutdown hook cannot
    // fire on SIGKILL — the usual follow-up to an expired TERM grace or
    // an OOM kill — so the artifact is also persisted at every query
    // boundary. A hard kill then leaves the last checkpoint on disk
    // (flagged, so a reader knows it is not a final emit). Costs ~1 ms
    // of string building per query against ~1 s of query run.
    def checkpoint(): Unit = {
      try {
        // snapshot under stateLock FIRST, then write under emitLock with
        // the emitted guard re-checked inside it — never stateLock nested
        // inside emitLock (the hook path acquires them sequentially in
        // the same snapshot-then-write order, so no lock-order inversion)
        val snap = snapshotInput(Seq("checkpoint"))
        val m = BenchFormat.metricsLine(snap)
        val dt = BenchFormat.detailLine(snap)
        emitLock.synchronized { if (!emitted.get) writeArtifacts(m, dt) }
      } catch { case _: Throwable => () }
    }
    def emergencyEmit(): Unit = if (emitted.compareAndSet(false, true)) {
      try {
        val snap = snapshotInput(Seq("killed-partial"))
        val j = BenchFormat.metricsLine(snap)
        writeArtifacts(j, BenchFormat.detailLine(snap))
        System.out.println(s"GRAFT_BENCH_JSON $j")
        System.out.println(j)
        System.out.flush()
      } catch { case _: Throwable => () }
    }
    Runtime.getRuntime.addShutdownHook(new Thread(() => emergencyEmit()))
    // One full corpus sweep; returns (name -> seconds) for the queries
    // that ran, plus whether the sweep COMPLETED (a sweep stops early
    // when the wall budget is nearly spent — 5 s reserve for the emit
    // path — so the artifact always ships). noop sink, not count():
    // count() lets Catalyst prune projections entirely for narrow
    // queries, under-measuring expression work; noop materializes every
    // output column.
    def runSweep(): (Map[String, Double], Boolean) = {
      mut { loads += osBean.getSystemLoadAverage; pending.clear() }
      var complete = true
      for ((name, fn) <- names if !firstErr.contains(name)) {
        if (complete && remainS < 5) {
          System.err.println(f"[bench] wall budget spent at $elapsedS%.0f s — aborting sweep")
          complete = false
        }
        if (complete) {
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            mut {
              pending(name) = (System.nanoTime() - t0) / 1e9
              // a larger partial displaces a smaller one; a COMPLETE
              // sweep (set at the boundary below) is never displaced by
              // a partial — it is strictly better evidence
              if (!partialBestComplete && pending.size > partialBest.size)
                partialBest = pending.toMap
            }
            checkpoint()
          } catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: $e")
            mut { firstErr(name) = e.toString.replaceAll("[\\r\\n\\t]", " ").take(300) }
          }
        }
      }
      mut {
        val res = pending.toMap
        // the LATEST complete sweep wins (it is the warmest); only warm
        // sweeps can reach the fallback — a complete measured sweep puts
        // `times` non-empty and the snapshot never consults partialBest
        if (complete) { partialBest = res; partialBestComplete = true }
        pending.clear()
        (res, complete)
      }
    }
    // warm-up sweeps: their per-query times are kept (complete OR
    // partial) so a budget too tight for even one measured sweep can
    // PROMOTE the best warm-up data to measured (last-resort degrade —
    // a real measured run, just colder / shorter)
    for (_ <- 0 until warm) runSweep()
    // measured sweeps: stop adding when the last completed sweep's wall
    // no longer fits the remaining budget (×1.15 headroom — sweeps drift)
    var repsDone = 0
    var stop = false
    var lastWall = mut(partialBest.values.sum)
    while (repsDone < reps && !stop) {
      if (repsDone >= 1 && remainS < lastWall * 1.15) {
        mut { degraded += s"reps$reps->$repsDone" }; stop = true
      } else {
        val (res, complete) = runSweep()
        if (complete) {
          mut {
            for ((n, t) <- res) times(n) = times(n) :+ t
            effRepsNow = repsDone + 1
          }
          lastWall = res.values.sum
          repsDone += 1
        } else {
          // an aborted measured sweep ships no rep of its own once a
          // complete rep exists (ragged rep lists would poison
          // sweepWalls' like-for-like reading) — but its per-query
          // times stay candidates for the partialBest promotion below
          // when NO sweep ever completed
          mut { degraded += s"sweep-aborted@$repsDone" }; stop = true
        }
      }
    }
    // Promotion when no measured sweep fit the budget (VERDICT r15 #2):
    // the best warm/aborted-sweep data becomes the single measured rep.
    // A COMPLETE warm sweep ships as "warmup-promoted" (the r14 rung); a
    // partial ships the queries it did measure, flagged
    // "partial-sweep@k/N" — a too-tight budget now always yields a
    // per-query artifact instead of measured-nothing.
    if (repsDone == 0) {
      val (cand, candComplete) = mut { (partialBest, partialBestComplete) }
      if (cand.nonEmpty) {
        mut {
          for ((n, t) <- cand) times(n) = times(n) :+ t
          effRepsNow = 1
          promotedMode = true
          degraded += (if (candComplete) "warmup-promoted"
                       else s"partial-sweep@${cand.size}/${names.size}")
        }
        repsDone = 1
        System.err.println(if (candComplete)
          "[bench] budget too tight for a measured sweep — promoted the warm-up"
        else
          s"[bench] no sweep completed — shipping partial (${cand.size}/${names.size} queries)")
      }
    }
    val effReps = math.max(repsDone, 1)
    // Warn-PROOFING, not just warn-awareness (VERDICT r12 #5): the
    // settle wait dodges a busy START, but a busy window OPENING mid-run
    // still inflated one sweep's wall in three shipped artifacts. When
    // the measured walls disagree >5% (the exact warn condition), re-run
    // ONE full sweep and replace the worst (max-wall) sweep's entries —
    // noise is additive, so the inflated sweep is the slow one, and a
    // replacement drawn minutes later samples a different machine state.
    // Bounded (default 1, SPARK_GRAFT_RESWEEPS) and recorded in both
    // artifacts as `resweeps`, so a run that still disagrees after its
    // budget ships the honest warn instead of retrying forever.
    // Default 2 (VERDICT r13 #5): the r13 driver run spent its single
    // retry into another busy window and shipped the warn; a second
    // retry costs one extra sweep ONLY when the first also lands busy,
    // and the improve-only acceptance rule already makes extra retries
    // regression-proof.
    val maxResweeps = sys.env.get("SPARK_GRAFT_RESWEEPS").flatMap(_.toIntOption)
      .filter(_ >= 0).getOrElse(2)
    def wallsNow: IndexedSeq[Double] = BenchFormat.sweepWalls(BenchInput(
      names.map(_._1), times.toMap, firstErr.toMap, effReps, sfDir))
    var resweeps = 0
    var keepGoing = true
    while (keepGoing && resweeps < maxResweeps) {
      // ONE walls computation per iteration drives both the stop
      // decision and the outlier pick — two separate computations would
      // silently couple only by luck if anything ever mutated between
      val w = wallsNow
      if (!(w.size >= 2 && w.min > 0 && (w.max - w.min) / w.min > 0.05))
        keepGoing = false
      else if (remainS < lastWall * 1.15) {
        // budget-first degrade order (VERDICT r14 #3): resweeps are the
        // FIRST thing dropped — the honest >5% warn is cheaper than a
        // timeout-killed artifact
        mut { degraded += s"resweeps$maxResweeps->$resweeps" }
        keepGoing = false
      } else {
        val bad = w.indexOf(w.max)
        System.err.println(s"[bench] walls disagree >5% — re-running sweep $bad")
        val (res, resweepComplete) = runSweep()
        if (!resweepComplete) mut { degraded += s"resweep-aborted@$resweeps" }
        // the replacement is taken ONLY if it improves on the outlier's
        // wall — a retry that lands in the same (or a new) busy window
        // must not make the shipped walls worse than what was measured.
        // Walls compare over the full-rep query set only (a query that
        // errors DURING the replacement keeps its measured reps; the
        // failure ships as `resweep_errors` in the detail artifact, not
        // in `errors` — see the partition below); the spent retry is
        // recorded either way.
        val fullRep = times.toSeq.filter(_._2.length == effReps)
        val newWall = fullRep.flatMap { case (n, _) => res.get(n) }.sum
        if (res.nonEmpty && fullRep.forall { case (n, _) => res.contains(n) } &&
            newWall < w(bad)) {
          mut {
            for ((n, ts) <- fullRep; t <- res.get(n)) {
              displaced(n) = math.min(ts(bad), displaced.getOrElse(n, Double.MaxValue))
              times(n) = ts.updated(bad, t)
            }
          }
        } else {
          System.err.println(
            f"[bench] replacement wall $newWall%.1f s did not improve on " +
              f"${w(bad)}%.1f s — keeping the measured sweep")
          // a rejected replacement leaves the walls unchanged, but the
          // box state it sampled is minutes newer than the sweep it
          // tried to replace — a remaining budget entry retries against
          // yet another machine state (the r13 driver run spent its one
          // retry into a still-busy window; the budget, not an early
          // stop, is the loop bound). EXCEPT when a full-rep query
          // errored during this replacement: runSweep skips firstErr
          // queries permanently, so no later replacement can ever cover
          // the full-rep set again — acceptance is mathematically
          // impossible and each further retry would burn a whole corpus
          // sweep on a guaranteed rejection. Stop instead.
          if (fullRep.exists { case (nm, _) => firstErr.contains(nm) })
            keepGoing = false
        }
        resweeps += 1
        resweepsNow = resweeps
      }
    }
    mut { loads += osBean.getSystemLoadAverage }
    // A run that measured NOTHING (budget below even a partial sweep,
    // or every query errored) still ships its artifact — but flagged,
    // and with a non-zero exit: an all-zero total from a green process
    // would read as an impossible perf result instead of a failed run.
    // With the partial-sweep promotion above this now requires a budget
    // too tight for even ONE query.
    val measuredNothing = mut(times.isEmpty)
    if (measuredNothing)
      System.err.println("[bench] not even a partial sweep fit the wall budget — artifact carries no timings")
    // A query that failed ONLY during a replacement sweep still carries a
    // complete, valid measured rep set (runSweep skips errored queries,
    // so times(name).length == reps proves every measured sweep
    // succeeded). Shipping it in `errors` would flag numbers that are
    // actually whole — snapshotInput records those separately (detail
    // artifact + stderr) and keeps `errors` (and the non-zero exit) for
    // queries whose shipped numbers are genuinely incomplete.
    val input = snapshotInput(Nil)
    if (input.resweepErrors.nonEmpty)
      System.err.println("[bench] failed only in a replacement sweep " +
        s"(measured reps complete): ${input.resweepErrors.keys.toSeq.sorted.mkString(", ")}")
    // Claim the emission slot BEFORE writing: a kill landing between the
    // writes and the claim would otherwise let the shutdown hook
    // OVERWRITE this complete artifact with a killed-partial one —
    // strictly worse data replacing strictly better. If the hook
    // already fired, the JVM is dying — do nothing.
    if (emitted.compareAndSet(false, true)) {
      val json = BenchFormat.metricsLine(input)
      writeArtifacts(json, BenchFormat.detailLine(input))
      spark.stop()
      // Emit metrics after spark.stop's shutdown chatter: a sentinel-
      // prefixed copy any line-scanner can strip, then the bare JSON line
      // (sbt no longer prefixes it — build.sbt sets run/outputStrategy :=
      // StdoutOutput). These are the last application-emitted lines; sbt
      // itself still appends a "[success] Total time" epilogue, which the
      // tail budget above accounts for. System.out directly, not
      // Console.out, in case anything rebound Console.
      System.out.println(s"GRAFT_BENCH_JSON $json")
      System.out.println(json)
      System.out.flush()
      if (json.length > 1850)
        System.err.println(s"[bench] WARNING metrics line ${json.length} chars — nearing the 2000-char tail budget")
    }
    if (input.errors.nonEmpty || measuredNothing) sys.exit(1)
  }
}
