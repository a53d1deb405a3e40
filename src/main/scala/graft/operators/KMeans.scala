package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** K-means suite with the reference's semantics, re-expressed Spark-first.
  *
  * Reference: swguo/NCHU.BigData `hadoop_tutorial/src/Kmeans.java` (variant
  * 1, squared-Euclidean over |.|, cols 3..26) and
  * `hadoop_tutorial/Kmeans/kmeans.java` (variant 2, normalized metric over
  * all cols). Both re-read the centers file in every map task's setup()
  * and round-trip centroids through HDFS per iteration
  * (src/Kmeans.java:39-46,259-277); here centroid state is a driver-local
  * k×dim array embedded as literals into the assignment expression, so one
  * iteration = one narrow map (no shuffle) + one partial-aggregated
  * groupBy of k×dim state — the shape that scales to 100 TB inputs.
  *
  * Assignment is in-plan and codegen'd, no UDF: the reference-quirk
  * metrics as pure Catalyst expressions (zip_with/aggregate/array_min/
  * array_position), EuclideanSq through the native NearestCells
  * expression (same argmin, primitive loops, codegen cached across
  * iterations).
  */
object KMeans {

  /** Distance metrics of the two reference variants. */
  sealed trait Metric {
    /** Column expression for the distance between a vector column and a
      * constant center.
      */
    def dist(vec: Column, center: Seq[Double]): Column
    /** Driver-side twin of [[dist]] for centroid-delta computation. */
    def distLocal(p: Array[Double], q: Array[Double]): Double
  }

  /** True squared Euclidean — the general-purpose metric for signed data
    * (embeddings). The reference's SqEuclidean applies |.| first, which
    * coincides with this on non-negative data (PM2.5) but not in general.
    */
  case object EuclideanSq extends Metric {
    def dist(vec: Column, center: Seq[Double]): Column =
      aggregate(
        zip_with(vec, typedLit(center), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x)
    def distLocal(p: Array[Double], q: Array[Double]): Double =
      p.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum
  }

  /** Variant 1 (src/Kmeans.java:62-70): sum((|p|-|q|)^2). */
  case object SqEuclidean extends Metric {
    def dist(vec: Column, center: Seq[Double]): Column =
      aggregate(
        zip_with(vec, typedLit(center), (x, y) => pow(abs(x) - abs(y), 2)),
        lit(0.0), (acc, x) => acc + x)
    def distLocal(p: Array[Double], q: Array[Double]): Double =
      p.zip(q).map { case (a, b) => math.pow(math.abs(a) - math.abs(b), 2) }.sum
  }

  /** Variant 2 (Kmeans/kmeans.java:59-65): sum(((|p|-|q|)/(|p|+|q|))^2).
    *
    * zeroSafe=false reproduces the reference exactly: 0/0 -> NaN poisons the
    * whole row-to-center distance and `NaN < min` never updates the argmin
    * (SURVEY.md §2A hazards). zeroSafe=true (default) defines 0/0 == 0.
    */
  final case class Normalized(zeroSafe: Boolean = true) extends Metric {
    def dist(vec: Column, center: Seq[Double]): Column = {
      val terms = zip_with(vec, typedLit(center), (x, y) => {
        val num = abs(x) - abs(y)
        val den = abs(x) + abs(y)
        if (zeroSafe) when(den === 0.0, lit(0.0)).otherwise(pow(num / den, 2))
        else pow(num / den, 2)
      })
      aggregate(terms, lit(0.0), (acc, x) => acc + x)
    }
    def distLocal(p: Array[Double], q: Array[Double]): Double =
      p.zip(q).map { case (a, b) =>
        val den = math.abs(a) + math.abs(b)
        if (den == 0.0) { if (zeroSafe) 0.0 else Double.NaN }
        else math.pow((math.abs(a) - math.abs(b)) / den, 2)
      }.sum
  }

  /** 1-based cluster id of the nearest center; ties break to the lowest
    * index (array_position returns the first match). With the non-zeroSafe
    * normalized metric, NaN distances lose to any finite distance
    * (array_min treats NaN as greater than all numbers), matching the
    * reference's `NaN < min == false` skip.
    *
    * EuclideanSq takes the native [[graft.functions.NearestCells]] fast
    * path: bit-identical distances (left-to-right squared-diff sum),
    * identical first-index tie rule, but primitive loops instead of
    * per-element interpreted HOF evaluation — and since the centers
    * live in a kernel REFERENCE object rather than as plan literals,
    * the generated code is identical across Lloyd iterations, so
    * codegen compiles once per training run instead of once per
    * iteration. (The kernel enforces exact dims, which every caller's
    * fixed-dim corpus satisfies; the reference-quirk metrics keep the
    * expression form — their golden semantics include NaN behavior the
    * kernel has no business reimplementing.)
    */
  def assignExpr(vec: Column, centers: Seq[Seq[Double]], metric: Metric): Column =
    metric match {
      case EuclideanSq =>
        val k = graft.functions.NearestCells.kernel(centers.map(_.toArray).toArray)
        (graft.functions.NearestCells.cell(vec, k) + lit(1)).cast("int")
      case _ =>
        val dists = array(centers.map(c => metric.dist(vec, c)): _*)
        array_position(dists, array_min(dists)).cast("int")
    }

  /** Adds a 1-based `cluster` column. Narrow map — centers ship as literals
    * in the plan (the Spark analogue of the reference's per-task centers
    * file read at src/Kmeans.java:39-46, minus the per-task I/O).
    */
  def assign(df: DataFrame, vecCol: String, centers: Array[Array[Double]],
             metric: Metric): DataFrame =
    df.withColumn("cluster", assignExpr(col(vecCol), centers.map(_.toSeq).toSeq, metric))

  /** Per-cluster mean vectors, computed as `dim` per-column avgs in one
    * hash aggregate (partial map-side combine; constant state per group —
    * replaces the reference reducer's whole-group ArrayList buffering at
    * src/Kmeans.java:90-97). Returns centers keyed by cluster id.
    */
  def meanVectors(assigned: DataFrame, vecCol: String, dim: Int): Map[Int, Array[Double]] = {
    val aggs = (1 to dim).map(i => avg(element_at(col(vecCol), i)).as(s"m$i"))
    assigned.groupBy(col("cluster")).agg(aggs.head, aggs.tail: _*)
      .collect()
      .map(r => r.getInt(0) -> (1 to dim).map(i => r.getDouble(i)).toArray)
      .toMap
  }

  /** Result of [[lloyd]]: final centers plus iteration count. */
  final case class Fit(centers: Array[Array[Double]], iterations: Int, converged: Boolean)

  /** Driver-side Lloyd iteration (the reference's while loop at
    * src/Kmeans.java:170-183 / kmeans.java:135-153 without the HDFS
    * centroid round-trip).
    *
    * @param stopOnZeroDelta variant-2 stop rule (kmeans.java:221-224):
    *   stop when the total old-vs-new center distance is exactly 0.
    *   Variant 1 disables it (convergence short-circuit commented out at
    *   src/Kmeans.java:254-257) and always runs maxIter rounds.
    * Empty clusters keep their previous center (the reference would
    *   silently drop them — a k-shrinking quirk not worth preserving).
    */
  def lloyd(df: DataFrame, vecCol: String, init: Array[Array[Double]],
            metric: Metric, maxIter: Int, stopOnZeroDelta: Boolean = false): Fit = {
    val dim = init.head.length
    // Every iteration re-scans the training set; without a persist that is
    // maxIter× the source scan AND re-evaluation of whatever vector-prep
    // expressions the caller stacked under `df` (Spark's MLlib caches its
    // training set for the same reason). Skip for a single pass (cache
    // written, never read back) AND for inputs the CALLER already
    // persisted: persist() on a cached df is a no-op, but the paired
    // unpersist() would evict the caller's cache as a side effect.
    val cache = maxIter > 1 &&
      df.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    val data = if (cache)
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else df
    try {
      var centers = init.map(_.clone())
      var iter = 0
      var converged = false
      while (iter < maxIter && !converged) {
        val byId = meanVectors(assign(data, vecCol, centers, metric), vecCol, dim)
        val next = centers.zipWithIndex.map { case (old, i) => byId.getOrElse(i + 1, old) }
        iter += 1
        if (stopOnZeroDelta) {
          val delta = centers.zip(next).map { case (a, b) => metric.distLocal(a, b) }.sum
          converged = delta == 0.0
        }
        centers = next
      }
      Fit(centers, iter, converged)
    } finally if (cache) data.unpersist(blocking = false)
  }

  /** Within-cluster sum of squared (metric) distances — the quantity that
    * is non-increasing across Lloyd iterations for SqEuclidean.
    */
  def wcss(df: DataFrame, vecCol: String, centers: Array[Array[Double]],
           metric: Metric): Double = {
    val dists = array(centers.map(c => metric.dist(col(vecCol), c.toSeq)).toIndexedSeq: _*)
    assign(df, vecCol, centers, metric)
      .select(element_at(dists, col("cluster")).as("d"))
      // sum over zero rows is SQL null; an empty input's WCSS is 0.0,
      // not an opaque NullPointerException from getDouble
      .agg(coalesce(sum(col("d")), lit(0.0))).head().getDouble(0)
  }

  /** Representative-row pick (reference reducer, src/Kmeans.java:114-130).
    *
    * Correct semantics: the row nearest its cluster's center
    * (`min_by`-style window; ties break on the row's order key).
    *
    * bugCompat=true reproduces the reference's broken scan: `minDistance`
    * is never updated (src/Kmeans.java:125-127), so `index_min` ends at the
    * LAST row the reducer iterates. Hadoop's within-key value order for the
    * historical golden run is not derivable from the repo (the shipped
    * artifacts show it was neither file order nor its reverse), so
    * bugCompat picks the last row by `orderCol` — the bug's semantics under
    * a defined order.
    */
  def repRows(assigned: DataFrame, vecCol: String, orderCol: String,
              centers: Array[Array[Double]], metric: Metric,
              bugCompat: Boolean = false): DataFrame = {
    val dists = array(centers.map(c => metric.dist(col(vecCol), c.toSeq)).toIndexedSeq: _*)
    val ord =
      if (bugCompat) Seq(col(orderCol).desc)
      else Seq(element_at(dists, col("cluster")).asc, col(orderCol).asc)
    val w = Window.partitionBy(col("cluster")).orderBy(ord: _*)
    assigned.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }
}
