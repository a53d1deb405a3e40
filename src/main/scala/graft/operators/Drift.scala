package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Corpus DRIFT monitoring: compare the token distributions of two
  * corpus snapshots (last crawl vs this crawl, last epoch's mix vs
  * today's) and surface the terms whose probability moved most — the
  * population-stability check a production training-data pipeline runs
  * before a new snapshot is allowed into the mix (PSI — population
  * stability index — is the standard industry form; Kullback–Leibler
  * 1951 is the underlying quantity).
  *
  * Determinism design (what makes this oracle-checkable where a naive
  * KL sum is not): with Laplace-smoothed probabilities
  * p(t) = (c_a(t)+1)/(n_a+V) and q(t) = (c_b(t)+1)/(n_b+V) over the
  * JOINT vocabulary V, every term's |p−q| shares ONE common denominator
  * (n_a+V)·(n_b+V) — so ranking by |p−q| is ranking by the EXACT
  * integer |(c_a+1)·(n_b+V) − (c_b+1)·(n_a+V)|. The drift ORDER (which
  * terms moved most, the monitor's actionable output) is therefore pure
  * integer arithmetic that no engine pair can disagree on; the per-term
  * PSI contribution (p−q)·ln(p/q) rides along as an IEEE double with a
  * fixed operation order, rounded to 6 (the corpus-wide float rule).
  *
  * Scale shape: two explode → partial+final hash aggregations (term
  * counts per snapshot), one full-outer shuffle join on term (absent =
  * count 0 — the smoothing exists exactly so those terms still carry
  * mass), corpus scalars as a 1-row broadcast, then narrow per-row
  * arithmetic. Nothing is driver-proportional; the monitor's output is
  * bounded by the caller's top-k.
  *
  * Integer-exactness bound: the cross-product terms are computed in
  * DecimalType(38,0); they stay exact while (c+1)·(n+V) < 10^38 — a
  * snapshot pair would need ~10^19 tokens apiece to approach it, and
  * the same exact-rule discipline as [[Sampling.sqrtTemperatureSample]]
  * applies (fail loudly rather than drift silently — here the decimal
  * simply cannot overflow first, since c ≤ n and V ≤ n bound each
  * factor by 2n and 10^19 tokens of one snapshot overflow nothing).
  *
  * Reference scope: not in the reference repo; public-technique
  * addition (PSI monitoring, Laplace smoothing — textbook methods).
  */
object Drift {

  /** Per-term token counts of one snapshot: (term, c). */
  private def termCounts(df: DataFrame, textCol: String): DataFrame =
    Layout.fanOutSmall(df)
      .select(explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c"))

  /** Per-term drift between snapshots `a` and `b`:
    * (term, c_a, c_b, drift, psi6) — `drift` the exact integer
    * |(c_a+1)·(n_b+V) − (c_b+1)·(n_a+V)| (the |p−q| numerator over the
    * shared denominator; DecimalType(38,0)), `psi6` the term's PSI
    * contribution (p−q)·ln(p/q) rounded to 6. Callers rank by
    * (drift desc, term) and keep their top-k; Σ psi6 over ALL rows is
    * the corpus PSI.
    */
  def termDrift(a: DataFrame, b: DataFrame, textCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val ca = termCounts(a, textCol).withColumnRenamed("c", "c_a")
    val cb = termCounts(b, textCol).withColumnRenamed("c", "c_b")
    val joined = ca.join(cb, Seq("term"), "full_outer")
      .select(col("term"),
        coalesce(col("c_a"), lit(0L)).as("c_a"),
        coalesce(col("c_b"), lit(0L)).as("c_b"))
    // corpus scalars — one row, broadcast: snapshot token totals and the
    // joint vocabulary size. Derived from the per-side aggregates and a
    // vocab-sized union-distinct, NOT from `joined`: a second reference
    // to `joined` would re-execute the full-outer shuffle join for one
    // scalar row (Spark shares no subtrees across references). The
    // per-side tokenize+count aggregations still evaluate once per
    // reference (here and in the join) — a caller monitoring truly
    // large snapshot pairs persists ca/cb around the call; on a
    // monitor's once-per-snapshot cadence that re-pay is the audit
    // cost, and the join itself now runs exactly once.
    val g = ca.agg(sum("c_a").as("n_a"))
      .crossJoin(cb.agg(sum("c_b").as("n_b")))
      .crossJoin(ca.select("term").unionAll(cb.select("term")).distinct()
        .agg(count(lit(1)).as("v")))
    val da = (col("n_a") + col("v")).cast(dec) // shared denominator of p
    val db = (col("n_b") + col("v")).cast(dec)
    val xa = (col("c_a") + lit(1L)).cast(dec)  // smoothed numerators
    val xb = (col("c_b") + lit(1L)).cast(dec)
    val p = (col("c_a") + lit(1L)).cast("double") /
      (col("n_a") + col("v")).cast("double")
    val q = (col("c_b") + lit(1L)).cast("double") /
      (col("n_b") + col("v")).cast("double")
    joined.crossJoin(broadcast(g))
      .select(col("term"), col("c_a"), col("c_b"),
        abs(xa * db - xb * da).as("drift"),
        round((p - q) * log(p / q), 6).as("psi6"))
  }

  /** EMBEDDING drift between two snapshot corpora — the dense-side
    * counterpart of [[termDrift]]: per-dimension mean shift of the
    * embedding distribution (encoder regressions, corpus-composition
    * shifts, and upstream preprocessing changes all show up as the
    * mean vector moving; production vector stores run exactly this
    * check before deciding a reindex epoch).
    *
    * Determinism: a double mean is a shuffle-order-dependent sum, so
    * each component is QUANTIZED first — round(x, 6) cast to
    * DECIMAL(18,6) — and summed in decimal (exact addition, any order;
    * the q_entropy discipline). The only doubles are the two final
    * divisions and their difference, in fixed order, rounded to 6. The
    * decimal→double casts are exact while a snapshot's per-dimension
    * sum stays under 2^53/10^6 ≈ 9e9 — i.e. ~10^10 unit-scale vectors
    * per snapshot — and the sums themselves are emitted, so a consumer
    * can audit the bound.
    *
    * The emitted sums are ×10^6 BIGINT micro-units, not wide decimals:
    * the internal DECIMAL(28,6) accumulators have scale exactly 6, so
    * the ×10^6 shift is the unscaled value — an exact integer under the
    * same 2^53/10^6 bound that already guards the mean. A >18-precision
    * decimal in a FINAL projection maps to arrow decimal128, whose
    * cross-engine canonicalization has burned two rounds (q_corpus_drift
    * r14, this row r15); BIGINT is representation-unambiguous on every
    * engine. The corpus-wide rule is pinned by QueryCorpusSpec.
    *
    * Scale shape: one posexplode per snapshot (n·dim narrow rows) into
    * a partial+final hash aggregation on the dimension key (dim rows
    * out), one tiny join. Output: (dim, n_a, n_b, sum_a_u6, sum_b_u6,
    * shift6) — dim is 1-based, matching SQL array subscripts.
    */
  def embedDrift(a: DataFrame, b: DataFrame, vecCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(18, 6)
    val out = org.apache.spark.sql.types.DecimalType(28, 6)
    def agg(df: DataFrame, n: String, sm: String) = df
      .select(posexplode(col(vecCol)).as(Seq("p", "x")))
      .select((col("p") + 1).cast("long").as("dim"),
        round(col("x").cast("double"), 6).cast(dec).as("x"))
      .groupBy("dim")
      .agg(count(lit(1)).as(n), sum("x").cast(out).as(sm))
    // FULL outer on dim: a dimension present in only one snapshot (an
    // encoder width change — exactly the regression class this monitor
    // exists for) must surface as a row with the other side's count 0
    // and shift6 NULL (no mean to difference), never silently vanish
    // through an inner join.
    agg(a, "n_a", "sum_a").join(agg(b, "n_b", "sum_b"), Seq("dim"), "full_outer")
      .select(col("dim"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        coalesce(col("sum_a"), lit(0).cast(out)).as("sum_a"),
        coalesce(col("sum_b"), lit(0).cast(out)).as("sum_b"))
      .select(col("dim"), col("n_a"), col("n_b"),
        (col("sum_a") * lit(1000000L)).cast("long").as("sum_a_u6"),
        (col("sum_b") * lit(1000000L)).cast("long").as("sum_b_u6"),
        when(col("n_a") > 0 && col("n_b") > 0,
          round(col("sum_a").cast("double") / col("n_a") -
            col("sum_b").cast("double") / col("n_b"), 6)).as("shift6"))
  }
}
