package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic sampling/splitting/shuffling for training pipelines.
  *
  * Everything here is keyed integer arithmetic — NEVER `rand()`: a random
  * split is not reproducible across runs, breaks under Spark task retry /
  * speculative execution (the same row can land in both splits), and
  * cannot be verified by an external oracle. The Knuth multiplicative
  * hash `(key * 2654435761) mod 2^32` is uniform enough for split work,
  * evaluated overflow-free for ANY key under ANSI mode (split partial
  * products — see [[bucketOf]]), and replicable in one line of SQL on
  * any engine — which is what makes these the only sampling primitives
  * in the engine with a full hash-verified oracle.
  *
  * All three are narrow, per-row column expressions (no shuffle except
  * the explicit sort in [[epochShuffle]]) — they run unchanged on 100 TB.
  *
  * Reference scope: not in the reference repo; north-star training-data
  * pipeline additions (BASELINE.json).
  */
object Sampling {

  private val KnuthA = 2654435761L // 2^32 * golden-ratio conjugate
  private val M = 4294967296L      // 2^32

  /** Multiplier for a given seed: seed 0 is the canonical Knuth
    * constant; other seeds derive a DIFFERENT odd 32-bit multiplier via
    * a splitmix64 finalizer, so each seed is a genuinely different hash
    * function. The previous `(key + seed)·A` form was affine in the
    * seed — b_s(k) = b_0(k) + s·A (mod 2^32) — so every "independent"
    * assignment was a constant rotation of seed 0's: epoch shuffles
    * were cyclic rotations of each other, and two same-fraction samples
    * at different seeds could be fully disjoint where independence
    * predicts proportional overlap. A single LCG step (the r8 form)
    * fixed that but kept a soft spot: its high word has no avalanche,
    * so an unlucky seed could yield a near-zero multiplier whose
    * "shuffle" is nearly key-ordered. The full splitmix64 mix
    * (Steele et al., OOPSLA 2014 — the JDK SplittableRandom finalizer)
    * avalanches every seed bit into the kept word. Oracles replicate a
    * given seed by inlining this multiplier value (interpolated, never
    * hand-copied).
    */
  private[graft] def mixedMultiplier(seed: Long): Long =
    if (seed == 0L) KnuthA
    else {
      var z = seed * 6364136223846793005L + 1442695040888963407L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^= z >>> 31
      ((z >>> 32) | 1L) & 0xFFFFFFFFL // odd, 32-bit
    }

  /** Uniform bucket in [0, 2^32) from an integer key column; `seed`
    * selects an independent hash function ([[mixedMultiplier]] — the
    * per-row expression is still one multiply + mod with a literal
    * multiplier).
    *
    * ANSI-safe at ANY key value: the key is pre-reduced mod 2^32 and
    * the multiply is split into 16-bit-bounded partial products (each
    * < 2^48), because the session runs Spark 4's default ANSI mode,
    * where the former single `key·a` multiply is an ARITHMETIC_OVERFLOW
    * error for keys ≳ 2^63/a ≈ 3.5e9 rather than a harmless wrap.
    * Values are IDENTICAL to the single-multiply form for every key
    * (exact congruence mod 2^32), so seed-0 oracles spell the plain
    * `(key·a) % 2^32` in wider integer arithmetic (DuckDB HUGEINT) as
    * before.
    */
  def bucketOf(key: Column, seed: Long = 0L): Column = {
    val a = mixedMultiplier(seed)
    val x = pmod(key.cast("long"), lit(M))
    // bitwise split, NOT `/`: Column `/` is DOUBLE division in Spark SQL
    val xlo = x.bitwiseAND(lit(65535L))
    val xhi = shiftrightunsigned(x, 16)
    pmod(xlo * lit(a) + (xhi * lit(a)).bitwiseAND(lit(65535L)) * lit(65536L),
      lit(M))
  }

  /** The [[hashSample]] keep-decision as a key-column predicate — the
    * ONE definition of `bucket < fraction·2^32`, exposed so call sites
    * that must apply the SAME sample on a different side of a plan
    * (the ANN queries' `queryPred`, calibration's query restriction)
    * share it instead of re-deriving the bound inline: a future bound
    * or seeding revision that misses a hand-rolled copy would silently
    * desynchronize a sample from its anchor.
    */
  def samplePred(fraction: Double, seed: Long = 0L): Column => Column =
    key => bucketOf(key, seed) < lit((fraction * M).toLong)

  /** Deterministic Bernoulli-style sample: keeps a row iff its key's
    * bucket falls under `fraction` ([[samplePred]]). Same key → same
    * decision, on every run, every engine, every retry.
    */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double,
                 seed: Long = 0L): DataFrame =
    df.filter(samplePred(fraction, seed)(col(keyCol)))

  /** Deterministic WEIGHTED Bernoulli sample: row i is kept with
    * probability `weight_i` (clamped to [0,1]) — quality-weighted corpus
    * selection, where high-quality documents are (almost) always kept
    * and low-quality ones are kept at their score. Same keyed-hash
    * discipline as [[hashSample]]: the decision is a pure function of
    * (key, seed, weight), so it replays identically across runs, task
    * retries, and external engines, and it stays a narrow per-row filter
    * at any corpus size. The inclusion check multiplies the weight up to
    * bucket space (exact in double for weights with ≤ 32 significant
    * bits) rather than dividing the bucket down — one fewer rounding.
    */
  def weightedSample(df: DataFrame, keyCol: String, weight: Column,
                     seed: Long = 0L): DataFrame = {
    val w = least(greatest(weight.cast("double"), lit(0.0)), lit(1.0))
    df.filter(bucketOf(col(keyCol), seed) < (w * lit(M.toDouble)))
  }

  /** Deterministic fixed-k sample PER GROUP (reservoir-sampling's job,
    * done scalably): within each group, keep the k rows whose keyed
    * Knuth-hash buckets sort lowest (ties by key). Because the hash is
    * uniform over keys, the kept set is an unbiased k-subset of each
    * group — unlike a "k lowest ids" cap, which biases toward early
    * rows — yet fully replayable across runs, retries, and engines
    * (same bucket arithmetic as [[hashSample]]). ONE shuffle on the
    * group column; the per-group window never sorts globally.
    */
  def samplePerKey(df: DataFrame, groupCol: String, keyCol: String, k: Int,
                   seed: Long = 0L): DataFrame = {
    require(!df.columns.contains("_spk_rn"),
      "samplePerKey: input already has a _spk_rn column")
    val w = Window.partitionBy(groupCol)
      .orderBy(bucketOf(col(keyCol), seed), col(keyCol))
    df.withColumn("_spk_rn", row_number().over(w))
      .filter(col("_spk_rn") <= k)
      .drop("_spk_rn")
  }

  /** Train/validation/test split label from cumulative fractions, e.g.
    * `fractions = Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)`.
    * Labels are assigned by half-open bucket ranges, so the split is a
    * partition of the data (no row lost, none duplicated).
    */
  def splitLabel(key: Column, fractions: Seq[(String, Double)],
                 seed: Long = 0L): Column = {
    val b = bucketOf(key, seed)
    val cuts = fractions.scanLeft(0.0) { case (acc, (_, f)) => acc + f }
    // the documented contract is a PARTITION of the data, and the last
    // cut below is pinned to 2^32 to absorb float-sum shortfall — that
    // pin must never silently absorb a genuinely partial fraction list
    // (0.25/0.25 would relabel the unallocated half as the last label)
    require(math.abs(cuts.last - 1.0) < 1e-9,
      s"splitLabel fractions sum to ${cuts.last}, not 1 — the split " +
        "must partition the data")
    // The LAST label's upper cut is pinned to 2^32 exactly: a float
    // cumulative sum can land just under 1.0 (0.7+0.2+0.1 sums to
    // 0.999…89), which would leave the maximum bucket matching no
    // half-open range — a silent NULL label, violating the documented
    // "partition of the data" contract (oracle CASE expressions use a
    // final ELSE, i.e. the same pinned semantics).
    val n = fractions.length
    fractions.zip(cuts.zip(cuts.tail)).zipWithIndex
      .foldLeft(lit(null).cast("string")) {
        case (acc, (((label, _), (lo, hi)), i)) =>
          val hiCut = if (i == n - 1) M else (hi * M).toLong
          when(b >= lit((lo * M).toLong) && b < lit(hiCut), lit(label))
            .otherwise(acc)
      }
  }

  /** Deterministic stratified downsample that EQUALIZES stratum sizes —
    * the "source/language balancing" step of corpus mixing: every
    * stratum is Bernoulli-sampled at rate min_count/stratum_count, so
    * each lands at ≈ the smallest stratum's size. Selection is keyed
    * ([[bucketOf]]) — reproducible across runs/retries/engines — and the
    * rate comparison is EXACT integer cross-multiplication
    * (bucket·cnt < min·2^32 in decimal arithmetic), never a float
    * division, so an external oracle replays bit-identical decisions.
    * Costs one cheap counting agg (k strata, broadcast back) plus a
    * narrow filter on the main scan — no shuffle of the data itself.
    */
  def balancedSample(df: DataFrame, stratumCol: String, keyCol: String,
                     seed: Long = 0L): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(20, 0)
    // Internal count column: fail fast on collision rather than silently
    // shadowing (or being shadowed by) a caller column of the same name.
    val cntCol = "__graft_balanced_cnt"
    require(!df.columns.contains(cntCol),
      s"balancedSample: input already has a '$cntCol' column")
    // One counting pass, collected: stratum counts are k rows (languages,
    // sources — the canonical bounded-driver-state exception, like k-means
    // centroids). Re-shipped as a broadcast LocalRelation so the main scan
    // pays ONE narrow hash-join probe and the count subtree is never
    // re-evaluated; min is derived driver-side from the same k rows.
    val cntsDf = df.groupBy(stratumCol).agg(count(lit(1)).as(cntCol))
    val rows = cntsDf.collect()
    require(rows.nonEmpty, "balancedSample on an empty input")
    val minc = rows.map(_.getLong(1)).min
    val local = df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), cntsDf.schema)
      .withColumnRenamed(stratumCol, "__graft_balanced_stratum")
    // Null-safe join (<=>): groupBy above puts NULL strata in their own
    // group, and the probe must find that group — a plain equi-join drops
    // every NULL-stratum row (null never equals null), silently excluding
    // them from the balanced output.
    df.join(broadcast(local),
        df(stratumCol) <=> local("__graft_balanced_stratum"))
      .filter(bucketOf(col(keyCol), seed).cast(dec) * col(cntCol).cast(dec) <
        lit(minc).cast(dec) * lit(M).cast(dec))
      .drop(cntCol, "__graft_balanced_stratum")
  }

  /** Deterministic TEMPERATURE-mixed downsample at α = 1/2 — the
    * square-root sampling rule of the multilingual-LM literature
    * (exponentiated stratum smoothing, p_i ∝ n_i^α: mBERT's exponent-
    * smoothed sampling, mT5 §3.3, XLM-R §3 — public papers all): big
    * strata are down-weighted and small ones up-weighted SOFTLY, the
    * interpolation between keep-all (α = 1) and [[balancedSample]]'s
    * full equalize (α = 0). Per-stratum keep-rate r_i = √(n_min/n_i):
    * sampled composition ∝ n_i·r_i = √(n_min·n_i) ∝ n_i^(1/2) — the
    * α = 1/2 mixture exactly.
    *
    * α = 1/2 is the shipped point because it is the one temperature
    * with an EXACT integer keep rule (the discipline every operator in
    * this file owes its oracle): keep iff bucket² · n_i < n_min · 2^64
    * — squaring both sides of bucket/2^32 < √(n_min/n_i) clears the
    * square root, so the decision is pure integer arithmetic (decimal
    * on the Spark side, HUGEINT in the oracle), never a float pow. A
    * general-α variant would put n_i^(α−1) through floating pow on
    * both engines and hash-diverge on the first libm difference.
    * Same cost shape as [[balancedSample]]: one k-row counting agg
    * re-shipped as a broadcast join, then a narrow per-row filter.
    */
  def sqrtTemperatureSample(df: DataFrame, stratumCol: String, keyCol: String,
                            seed: Long = 0L): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(20, 0)
    val cntCol = "__graft_temp_cnt"
    require(!df.columns.contains(cntCol),
      s"sqrtTemperatureSample: input already has a '$cntCol' column")
    val cntsDf = df.groupBy(stratumCol).agg(count(lit(1)).as(cntCol))
    val rows = cntsDf.collect()
    require(rows.nonEmpty, "sqrtTemperatureSample on an empty input")
    val cnts = rows.map(_.getLong(1))
    val minc = cnts.min
    // The exact-integer claim has a ceiling: bucket² < 2^64 ≈ 1.845e19,
    // so bucket²·n_i is computed in DecimalType precision 38 and
    // overflows to NULL (silently dropping the row under Spark's
    // precision-loss semantics, while the oracle's 128-bit HUGEINT
    // keeps it) once a stratum exceeds ~5.4e18 rows. No corpus is
    // within 10^5× of that, but the rule's exactness is the contract —
    // fail loudly at the bound instead of diverging silently past it.
    require(cnts.max <= 5400000000000000000L,
      "sqrtTemperatureSample: a stratum exceeds 5.4e18 rows — bucket^2 * " +
        "n_i would overflow decimal(38) and silently drop rows; shard the " +
        "stratum or lower the per-stratum cardinality first")
    val local = df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), cntsDf.schema)
      .withColumnRenamed(stratumCol, "__graft_temp_stratum")
    val b = bucketOf(col(keyCol), seed).cast(dec)
    // null-safe join for NULL strata — same contract as balancedSample
    df.join(broadcast(local),
        df(stratumCol) <=> local("__graft_temp_stratum"))
      .filter(b * b * col(cntCol).cast(dec) <
        lit(minc).cast(dec) * lit(M).cast(dec) * lit(M).cast(dec))
      .drop(cntCol, "__graft_temp_stratum")
  }

  /** 1-based global rank of every row under `ord`, as column `posCol`
    * (long) — WITHOUT the `row_number() over (ORDER BY ...)` trap, whose
    * empty partitionBy funnels the entire table through ONE window task
    * (the single-reducer cliff at scale).
    *
    * Two-phase rank instead: (1) a range-partitioned total sort — every
    * partition sorts in parallel and partition i precedes partition i+1
    * globally; (2) `zipWithIndex`, which runs one lightweight
    * per-partition COUNT job over the sorted output, broadcasts the
    * cumulative offsets, and adds `offset + local index` in a narrow map.
    * The count pass re-reads the sort's reduce side but reuses its
    * shuffle files (map stage runs once). No task ever sees more than its
    * own range slice, so the operator holds at any input size.
    *
    * Determinism contract: callers must pass a total order (include a
    * unique tie-break key in `ord`), else ranks within ties are
    * partition-placement dependent.
    */
  def withGlobalRank(df: DataFrame, posCol: String, ord: Column*): DataFrame = {
    require(!df.columns.contains(posCol),
      s"withGlobalRank: input already has a '$posCol' column — a duplicate " +
        "field name surfaces later as AMBIGUOUS_REFERENCE far from the cause")
    val sorted = df.orderBy(ord: _*)
    val out = sorted.schema.add(posCol, LongType, nullable = false)
    val ranked = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    sorted.sparkSession.createDataFrame(ranked, out)
  }

  /** Deterministic epoch shuffle: a reproducible permutation of the rows,
    * keyed by (key, epoch). One global sort — exactly the shuffle a
    * training job pays to randomize example order, but replayable (a
    * preempted epoch resumes with the identical order) and
    * oracle-verifiable. Ties are impossible for distinct keys because
    * x → (x·a mod 2^32) is injective on [0, 2^32) (a is odd).
    */
  def epochShuffle(df: DataFrame, keyCol: String, epoch: Int): DataFrame =
    df.orderBy(bucketOf(col(keyCol), epoch.toLong), col(keyCol))

  /** Deterministic TOKEN-BUDGET mixture — the "N billion tokens of web,
    * M of code" recipe real pretraining mixes are specified in: each
    * stratum keeps the hash-ordered prefix of its documents whose
    * cumulative token count stays within that stratum's budget. Rows
    * mix, budgets are TOKENS — the unit the training run actually
    * consumes — which is why neither [[balancedSample]] (equalizes row
    * counts) nor [[sqrtTemperatureSample]] (smooths row rates) can
    * express it: a domain of long documents exhausts a token budget in
    * far fewer rows.
    *
    * `budgets` is a k-row (stratum, budget) frame — k = #domains, the
    * same bounded-small-side shape as the samplers' count frames —
    * joined null-safe (a NULL stratum can carry a budget) and broadcast.
    * Strata absent from `budgets` are dropped: an unlisted domain has
    * budget zero, exactly how a mix spec reads. The keep rule is EXACT
    * integer arithmetic end to end: tokens sum as longs along the
    * keyed-hash order ([[bucketOf]] ascending, key tie-break — an
    * unbiased prefix, since the hash order is exchangeable with respect
    * to content), and a row survives iff its inclusive running sum is ≤
    * the budget. No floats anywhere, so an external oracle replays the
    * boundary bit-identically.
    *
    * Cost shape: one broadcast join + ONE shuffle on the stratum column;
    * the running sum is a per-stratum window, so each stratum sorts in
    * one task (the [[samplePerKey]] bound — fine at k domains × docs
    * that fit a task). The 100 TB path for a SINGLE giant stratum is a
    * two-phase threshold search instead: range-partition the stratum by
    * bucket, take per-range token subtotals (one small agg), pick the
    * cutoff range by prefix-summing k subtotals driver-side, and window
    * only inside the boundary range — same exact rule, no single-task
    * sort. This entry point ships the window form because the budget
    * contract, not the sort, is the operator.
    */
  def tokenBudgetSample(df: DataFrame, stratumCol: String, keyCol: String,
                        tokenCol: String, budgets: DataFrame,
                        budgetCol: String = "budget",
                        seed: Long = 0L): DataFrame = {
    require(budgets.columns.contains(stratumCol) &&
      budgets.columns.contains(budgetCol),
      s"tokenBudgetSample: budgets frame must carry ($stratumCol, $budgetCol)")
    val bStr = "__graft_budget_stratum"
    val bVal = "__graft_budget_value"
    val cum = "__graft_budget_cum"
    Seq(bStr, bVal, cum).foreach(c => require(!df.columns.contains(c),
      s"tokenBudgetSample: input already has a '$c' column"))
    // Materialize the k-row budget spec and re-ship it as a broadcast
    // LocalRelation (the balancedSample pattern): bounded driver state
    // (k = #domains), the budget subtree is never re-evaluated, and a
    // caller deriving budgets FROM df itself (the "half of each
    // stratum's tokens" shape) cannot trip self-join ambiguity.
    val bSel = budgets.select(col(stratumCol).as(bStr),
      col(budgetCol).cast("long").as(bVal))
    val specRows = bSel.collect()
    // a duplicated stratum row would match every doc of that stratum
    // once PER SPEC ROW — doubled output rows and a double-counted
    // running sum, silently. A mix spec is a function stratum → budget;
    // enforce it loudly (the splitLabel fractions-sum discipline).
    val dupes = specRows.groupBy(_.get(0)).collect { case (k, rs) if rs.length > 1 => k }
    require(dupes.isEmpty,
      s"tokenBudgetSample: budgets frame lists strata ${dupes.mkString(", ")} " +
        "more than once — a budget spec must carry one row per stratum")
    val b = df.sparkSession.createDataFrame(
      java.util.Arrays.asList(specRows: _*), bSel.schema)
    val w = Window.partitionBy(stratumCol)
      .orderBy(bucketOf(col(keyCol), seed), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.join(broadcast(b), df(stratumCol) <=> b(bStr))
      .withColumn(cum, sum(col(tokenCol).cast("long")).over(w))
      .filter(col(cum) <= col(bVal))
      .drop(bStr, bVal, cum)
  }

  /** LEAKAGE-SAFE train/valid/test split: assign every near-duplicate
    * CLUSTER — not every document — to one side. A doc-keyed
    * [[splitLabel]] puts ~f_train·f_test of near-dup PAIRS across the
    * train/test boundary, and a model that memorized the train copy is
    * then scored on its test twin — the eval-contamination failure
    * document-level dedup papers warn about. Splitting on the cluster
    * canonical id closes it by construction: both endpoints of every
    * dup edge share a canonical, hence a label.
    *
    * `pairs` is any near-dup edge set ((aCol, bCol) over `idCol`
    * values — MinHash, SimHash, embedding pairs alike);
    * [[Components.connectedComponents]] closes it transitively (A~B~C
    * land together even when A~C misses the threshold — hash-to-min,
    * O(log n) rounds over the DUP GRAPH only, a set tiny next to the
    * corpus). Docs outside the graph are their own cluster. Output =
    * the input plus `cluster` (long canonical id) and `split` (label).
    *
    * Cost shape at 100 TB: components iterate over pair-graph-sized
    * frames; the corpus pays ONE left join against the component map
    * (dup-graph-sized — AQE broadcasts it in the common sparse-dup
    * case) plus [[splitLabel]]'s narrow per-row arithmetic. Split
    * ratios hold approximately at cluster granularity — exact ratios
    * at doc granularity are impossible once docs must move in groups.
    */
  def clusterSafeSplit(df: DataFrame, idCol: String, pairs: DataFrame,
                       aCol: String, bCol: String,
                       fractions: Seq[(String, Double)],
                       seed: Long = 0L): DataFrame = {
    Seq("cluster", "split").foreach(c => require(!df.columns.contains(c),
      s"clusterSafeSplit: input already has a '$c' column"))
    val comp = Components.connectedComponents(pairs, aCol, bCol)
      .select(col("id").as("__graft_css_id"), col("comp").as("__graft_css_comp"))
    df.join(comp, df(idCol) === comp("__graft_css_id"), "left")
      .withColumn("cluster",
        coalesce(col("__graft_css_comp"), col(idCol).cast("long")))
      .withColumn("split", splitLabel(col("cluster"), fractions, seed))
      .drop("__graft_css_id", "__graft_css_comp")
  }

  /** Per-stratum QUANTILE gate — adaptive-threshold curation: keep the
    * top `keepNum/keepDen` fraction of each stratum under `ord` (pass
    * score-descending plus a unique tie-break key). The per-language
    * quality-classifier cut of corpus curation: an absolute threshold
    * over-prunes whichever language the scorer is miscalibrated on,
    * while a per-stratum fraction adapts to each stratum's own score
    * distribution. Complements [[samplePerKey]] (fixed k per group) and
    * `q_domain_cap`'s top-k: the kept COUNT here scales with the
    * stratum, keeping floor(cnt·num/den) rows.
    *
    * The keep rule is exact integer cross-multiplication — row survives
    * iff rank·keepDen ≤ count·keepNum — never a float fraction, so the
    * boundary row is the same on every engine. One shuffle on the
    * stratum column; rank and count ride the same window partition
    * (single sort, no second pass). Same per-stratum single-task sort
    * bound (and the same two-phase escape) as [[tokenBudgetSample]].
    */
  def stratumQuantileGate(df: DataFrame, stratumCol: String,
                          keepNum: Int, keepDen: Int,
                          ord: Column*): DataFrame = {
    require(keepDen > 0 && keepNum > 0 && keepNum <= keepDen,
      s"stratumQuantileGate: keep fraction $keepNum/$keepDen must be in (0, 1]")
    require(ord.nonEmpty, "stratumQuantileGate: pass an ordering " +
      "(score desc + a unique tie-break key)")
    val rn = "__graft_sqg_rn"
    val cnt = "__graft_sqg_cnt"
    Seq(rn, cnt).foreach(c => require(!df.columns.contains(c),
      s"stratumQuantileGate: input already has a '$c' column"))
    val w = Window.partitionBy(stratumCol)
    df.withColumn(rn, row_number().over(w.orderBy(ord: _*)))
      .withColumn(cnt, count(lit(1)).over(w))
      .filter(col(rn).cast("long") * keepDen <= col(cnt) * keepNum)
      .drop(rn, cnt)
  }
}
