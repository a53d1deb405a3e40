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
    for (sweep <- 0 until reps; (name, fn) <- names
         if !firstErr.contains(name)) {
      val t0 = System.nanoTime()
      // noop sink, not count(): count() lets Catalyst prune projections
      // entirely for narrow queries, under-measuring expression work;
      // noop materializes every output column.
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        times(name) = times(name) :+ dt
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: $e")
        firstErr(name) = e.toString.replaceAll("[\\r\\n\\t]", " ").take(300)
      }
    }
    // Sweep walls are computed over queries with a FULL rep set only: a
    // query that fails in sweep k would otherwise contribute to walls
    // 0..k-1 but not k.. — a compositional step change the documented
    // reading ("do the sweeps agree?") would misread as machine-state
    // drift. Errored queries are visible in `errors`; the walls stay a
    // pure like-for-like drift signal.
    val sweepWall: IndexedSeq[Double] = (0 until reps).map { s =>
      names.iterator.map { case (n, _) => times(n) }
        .collect { case ts if ts.length == reps => ts(s) }.sum
    }
    val results = names.map { case (name, _) =>
      (name, times(name).minOption.getOrElse(0.0), firstErr.get(name))
    }
    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"
                  case c if c < ' ' => " "; case c => c.toString }
    // Compact seconds: 2 decimals, trailing zeros trimmed ("1.50"->"1.5",
    // "2.00"->"2"). The harness captures only the LAST 2000 chars of
    // stdout, and the sbt epilogue line consumes ~70 of them — the whole
    // metrics line must fit in what remains or its head gets truncated
    // and never parses (this is exactly what nulled rounds 1-3). At ~90
    // queries × ~20 chars/entry the 2-decimal form stays under budget.
    def sec(v: Double): String = {
      val s = f"$v%.2f"
      if (s.contains('.')) s.reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse else s
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + sec(v) }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) =>
      "\"" + k + "\":\"" + esc(e) + "\"" }.mkString("{", ",", "}")
    // total = sum of per-query minima: the steady-state cost of one full
    // sweep, comparable round-over-round without warm-up skew
    val total = results.map(_._2).sum
    // omit the errors map when empty — every byte counts against the tail
    val errPart = if (errs == "{}") "" else s""","errors":$errs"""
    // Dispersion (VERDICT r7): per-sweep wall totals — three numbers
    // that say whether the sweeps agreed at all (~25 chars) — plus a
    // per-query "spread" map, (max-min) across reps in cs, for the
    // widest-spread queries. A regressed query with near-zero spread is
    // a real change; one whose spread swamps the delta is sweep noise.
    // integer seconds: sweep totals are a did-they-agree signal, not a
    // measurement — sub-second precision is not worth the bytes
    val sweepsPart =
      s""","sweeps":[${sweepWall.map(v => math.round(v)).mkString(",")}]"""
    // `strip` follows the tier's queries-map key style: full keeps the
    // q_ prefix, the stripped tiers strip — spread keys must correlate
    // 1:1 with the adjacent queries map either way.
    def spreadJson(k: Int, strip: Boolean): String =
      names.flatMap { case (n, _) =>
        val ts = times(n)
        if (ts.length >= 2 && ts.max - ts.min >= 0.05)
          Some((n, math.round((ts.max - ts.min) * 100))) else None
      }.sortBy(-_._2).take(k)
        .map { case (n, cs) =>
          "\"" + (if (strip) n.stripPrefix("q_") else n) + "\":" + cs }
        .mkString("{", ",", "}")
    // omit an empty spread map (reps=1, or no query over the 0.05 s floor)
    def spreadPartOf(k: Int, strip: Boolean = true): String = {
      val sj = if (k == 0) "{}" else spreadJson(k, strip)
      if (sj == "{}") "" else s""","spread":$sj"""
    }
    def full(sk: Int) = s"""{"metric":"total","value":${sec(total)},"unit":"sec","reps":$reps$sweepsPart${spreadPartOf(sk, strip = false)},"queries":$qs$errPart,"sf":"$sfDir"}"""
    // Failsafes when the corpus outgrows the tail budget (at 100+
    // queries the full form exceeds it every run): tier 2 re-emits with
    // the uniform "q_" name prefix stripped (recoverable -- every query
    // name has it) and 1-decimal seconds; tier 3 (below) goes to integer
    // centiseconds.
    val sfShort = sfDir.split('/').last
    def compact(sk: Int) = {
      val qs1 = results.map { case (k, v, _) =>
        "\"" + k.stripPrefix("q_") + "\":" + {
          val s = f"$v%.1f"
          if (s.endsWith(".0")) s.dropRight(2) else s
        }
      }.mkString("{", ",", "}")
      // every byte counts here: short note, basename-only sf
      s"""{"metric":"total","value":${sec(total)},"unit":"sec","reps":$reps$sweepsPart${spreadPartOf(sk)},"note":"q_ prefix stripped","queries":$qs1$errPart,"sf":"$sfShort"}"""
    }
    // Last-resort tier: per-query times as integer CENTISECONDS
    // ("qunit":"cs"); total stays in seconds. Saves ~2 chars per
    // sub-second entry over the 1-decimal form.
    def centi(sk: Int) = {
      val qs2 = results.map { case (k, v, _) =>
        "\"" + k.stripPrefix("q_") + "\":" + math.round(v * 100)
      }.mkString("{", ",", "}")
      s"""{"metric":"total","value":${sec(total)},"unit":"sec","reps":$reps$sweepsPart${spreadPartOf(sk)},"qunit":"cs","note":"q_ stripped; queries in centisec","queries":$qs2$errPart,"sf":"$sfShort"}"""
    }
    // Final fallback for a corpus too large for ANY full per-query map
    // (at 120 queries even centiseconds overflow the tail): keep the
    // slowest queries individually — they are what perf judgment reads —
    // and roll the remainder up PER FAMILY (the stripped name's first
    // '_' token: "tpch", "fuzzagg", "window", …) as a "rest" cs map, so
    // every centisecond in the line stays round-over-round comparable
    // at family granularity or better — an opaque scalar remainder
    // (rounds ≤6 emitted "other_cs") hid ~27% of the total from
    // regression triage. The total still reconciles: value ≈
    // Σqueries + Σrest. Greedy by descending time until the line fits.
    def topTier(budget: Int): String = {
      val sorted = results.sortBy(-_._2)
      def render(keep: Int, sk: Int): String = {
        val (top, rest) = sorted.splitAt(keep)
        val qs3 = top.map { case (k, v, _) =>
          "\"" + k.stripPrefix("q_") + "\":" + math.round(v * 100)
        }.mkString("{", ",", "}")
        val fams = rest
          .groupBy { case (k, _, _) => k.stripPrefix("q_").takeWhile(_ != '_') }
          .map { case (f, xs) => (f, math.round(xs.map(_._2).sum * 100)) }
          .toSeq.sortBy(t => (-t._2, t._1))
        val famJson = fams.map { case (f, cs) => "\"" + f + "\":" + cs }
          .mkString("{", ",", "}")
        val spreadPart = spreadPartOf(sk)
        val note = s"q_ stripped;cs;top ${top.size}/${results.size};rest=family" +
          (if (spreadPart.nonEmpty) ";spread=max-min" else "")
        s"""{"metric":"total","value":${sec(total)},"unit":"sec","reps":$reps$sweepsPart,"qunit":"cs","note":"$note","queries":$qs3$spreadPart,"rest":$famJson$errPart,"sf":"$sfShort"}"""
      }
      // Per-query minima are THE artifact the perf judgment reads, but
      // at 220 queries they alone consume the whole budget and the
      // spread map never appears — which was the r7 verdict's exact
      // complaint. Reserve the top-3 spread entries (the queries whose
      // round-over-round moves are most likely noise — ~70 chars, ≈4
      // individual slots whose times stay family-visible in `rest`),
      // fit the query list around them, then grow spread into any
      // leftover budget. Full per-rep dispersion: bench_detail.json.
      var keep = sorted.length
      var out = render(keep, 3)
      while (out.length > budget && keep > 0) {
        // shrink in steps proportional to the overflow (~18 chars/entry)
        keep = math.max(0, keep - math.max(1, (out.length - budget) / 18))
        out = render(keep, 3)
      }
      var sk = 3
      while (out.length > budget && sk > 0) { sk -= 1; out = render(keep, sk) }
      while (sk < 10 && {
        val t = render(keep, sk + 1)
        if (t.length <= budget) { out = t; true } else false
      }) sk += 1
      out
    }
    // Tier selection tries each form WITH its spread map first, then
    // without — a mid-size corpus landing in compact/centi used to lose
    // per-query dispersion entirely (the exact r7 triage gap), while
    // the tiers on either side of them carried it.
    val json =
      Seq(full(10), full(3), full(0)).find(_.length <= 1800)
        .orElse(Seq(compact(3), compact(0), centi(3), centi(0))
          .find(_.length <= 1850))
        .getOrElse(topTier(1780))
    Files.createDirectories(Paths.get("target"))
    Files.writeString(Paths.get("target/bench.json"), json + "\n")
    // Full dispersion record, free of the stdout tail budget: EVERY
    // rep of EVERY query in sweep order (cs) — the file tools/ab.sh
    // and any regression triage read instead of the compressed line.
    val detail = {
      val qd = names.map { case (n, _) =>
        "\"" + n + "\":[" + times(n).map(t => math.round(t * 100)).mkString(",") + "]"
      }.mkString("{", ",", "}")
      s"""{"reps":$reps,"qunit":"cs","order":"sweep","sweep_wall_s":[${sweepWall.map(v => f"$v%.2f").mkString(",")}],"queries":$qd$errPart,"sf":"$sfDir"}"""
    }
    Files.writeString(Paths.get("target/bench_detail.json"), detail + "\n")
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
    if (results.exists(_._3.isDefined)) sys.exit(1)
  }
}
