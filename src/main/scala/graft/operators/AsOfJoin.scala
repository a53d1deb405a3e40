package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, the most recent right
  * row with `right.ts <= left.ts` in the same key group — the standard
  * time-series enrichment operator (trades←quotes, events←snapshots).
  *
  * Spark has no native as-of join; the scalable formulation is NOT a theta
  * join (`l.ts >= r.ts` explodes to O(|L|·|R|) per key before picking the
  * max) but union + ordered window:
  *
  *   1. tag right rows 0 and left rows 1, union them (narrow),
  *   2. one hash shuffle on the key, sort within partition by
  *      (ts, side, seq),
  *   3. `last(<right value>, ignoreNulls) over rowsBetween(-inf, 0)`
  *      carries the latest right payload forward onto each left row.
  *
  * Cost: ONE shuffle + sort of |L|+|R| rows — same class as a regular
  * sort-merge join, no pair explosion, no per-key driver state. Window
  * state is one value per column (constant), so a 100 TB left side
  * streams through.
  *
  * Ties: right rows sort before left rows at equal ts (side 0 < 1), so a
  * right row AT the left timestamp matches (inclusive, like DuckDB's
  * `ASOF JOIN ... ON l.ts >= r.ts`); among right rows with identical
  * (key, ts) the one with the greatest `seqCol` wins — callers wanting
  * different tie-breaks pre-aggregate the right side.
  *
  * Reference scope: not in the reference repo (swguo/NCHU.BigData has no
  * joins at all — SURVEY §2A); north-star custom-operator addition.
  */
object AsOfJoin {

  /** @param left      probe side; all its columns are preserved
    * @param right     build side: (keyCol, tsCol, seqCol, valueCols*)
    * @param keyCol    equi-join key present on both sides
    * @param tsCol     event-time column present on both sides
    * @param seqCol    right-side unique column breaking equal-ts ties
    * @param valueCols right-side payload columns carried onto left rows
    *                  (emitted as `asof_<name>`, null when no right row
    *                  precedes the left row)
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
           seqCol: String, valueCols: Seq[String]): DataFrame =
    impl(left, right, keyCol, tsCol, seqCol, valueCols, forward = false)

  /** Forward (look-ahead) as-of: each left row gets the EARLIEST right
    * row at-or-after its timestamp — the label-attachment direction
    * ("next conversion after this impression"). Same union + one-shuffle
    * + ordered-window plan as [[asOf]], mirrored: left rows sort BEFORE
    * right rows at equal ts (inclusive match), `first(_, ignoreNulls)`
    * over `[currentRow, +inf)` carries the nearest following payload
    * back; among right rows with identical (key, ts) the SMALLEST
    * `seqCol` wins (the mirror of backward's greatest-wins).
    */
  def asOfForward(left: DataFrame, right: DataFrame, keyCol: String,
                  tsCol: String, seqCol: String,
                  valueCols: Seq[String]): DataFrame =
    impl(left, right, keyCol, tsCol, seqCol, valueCols, forward = true)

  private def impl(left: DataFrame, right: DataFrame, keyCol: String,
                   tsCol: String, seqCol: String, valueCols: Seq[String],
                   forward: Boolean): DataFrame = {
    import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
    // fail fast on collision with the operator's scratch columns rather
    // than silently overwriting (and then emitting) caller data — the
    // same contract as Sampling.samplePerKey / balancedSample / Skew
    for (c <- Seq("_side", "_seq", "_p", "_pc"); (df, side) <- Seq(
        (left, "left"), (right, "right")))
      require(!df.columns.contains(c),
        s"asOf: $side input already has a '$c' column " +
          "(reserved for the operator's scratch state) — rename it")
    // the payload struct leads with a '_m' marker field; a value column
    // of that name would duplicate the field and make getField("_m")
    // resolve ambiguously instead of failing fast
    require(!valueCols.contains("_m"),
      "asOf: a value column named '_m' collides with the payload " +
        "struct's match-marker field — rename it")
    val leftCols = left.columns.toSeq
    // The payload travels as ONE struct per right row (non-null on every
    // right row via the `_m` marker, null on left rows). `last(_, ignore
    // Nulls)` over the struct therefore picks the single most recent RIGHT
    // ROW, and all asof_* fields — including genuinely-NULL payload values
    // — come from that row. Carrying each value column independently would
    // skip a null payload and resurrect an older non-null one, diverging
    // from true as-of semantics on data with null payloads.
    val payloadType = StructType(StructField("_m", IntegerType) +:
      valueCols.map(c => StructField(c, right.schema(c).dataType)))
    // side ordering encodes tie inclusivity: backward puts right(0)
    // before left(1) at equal ts; forward mirrors it
    val (lSide, rSide) = if (forward) (0, 1) else (1, 0)
    val l = left
      .withColumn("_side", lit(lSide))
      .withColumn("_seq", lit(if (forward) Long.MinValue else Long.MaxValue))
      .select(Seq(col(keyCol), col(tsCol), col("_side"), col("_seq")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol).map(col) :+
        lit(null).cast(payloadType).as("_p"): _*)
    val r = right
      .withColumn("_side", lit(rSide))
      .withColumn("_seq", col(seqCol).cast("long"))
      .select(Seq(col(keyCol), col(tsCol), col("_side"), col("_seq")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(lit(1).as("_m") +: valueCols.map(c => col(c).as(c)): _*).as("_p"): _*)
    // BOTH directions run a RUNNING frame (unboundedPreceding →
    // currentRow, O(rows) per key group): forward is the exact mirror —
    // all three sort keys reversed, so "first right row at-or-after in
    // ascending order" ≡ "last right row at-or-before in descending
    // order", with the same tie rules (right before left at equal ts;
    // smallest seq wins = last in seq-descending order). The literal
    // `first() over (currentRow, unboundedFollowing)` spelling hits
    // Spark's UnboundedFollowing frame, which RECOMPUTES the aggregate
    // per row — O(rows²) in a key group, hours on one hot key at scale.
    val wBase =
      if (forward)
        Window.partitionBy(keyCol)
          .orderBy(col(tsCol).desc, col("_side").desc, col("_seq").desc)
      else
        Window.partitionBy(keyCol)
          .orderBy(col(tsCol), col("_side"), col("_seq"))
    val carried = r.unionByName(l).withColumn("_pc",
      last(col("_p"), ignoreNulls = true).over(
        wBase.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    carried.filter(col("_side") === lSide)
      .select(leftCols.map(col) ++
        valueCols.map(c => col("_pc").getField(c).as(s"asof_$c")): _*)
  }
}
