package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over an undirected edge list — the operator that
  * turns near-duplicate PAIRS (MinHash / SimHash / Jaccard / embedding
  * cosine) into dedup CLUSTERS: transitive closure groups every document
  * with every document it is (directly or indirectly) a near-dup of, and
  * the component's min id is the canonical survivor. Without this step a
  * pairwise dedup keeps one doc per PAIR, not one per cluster — A~B and
  * B~C would keep both A and C even though they are transitively dups.
  *
  * Algorithm: hash-to-min label propagation (Rastogi et al., ICDE 2013):
  * every vertex starts labeled with itself; each round every vertex
  * lowers its label to the min of its own and its neighbors' labels.
  * Monotone and exact — the fixpoint labels every vertex with its
  * component's min id — and it converges in O(component diameter)
  * rounds. Near-dup graphs are clique-ish (diameter ≲ 3), so 3-5 rounds
  * are typical; `maxIter` only bounds adversarial topologies (a path
  * graph needs diameter rounds — for those, the alternating
  * large-star/small-star of Kiveris et al., SoCC 2014, is the published
  * O(log n)-round fallback).
  *
  * Scale shape: each round is ONE shuffle-join (symmetric edges ⋈ labels
  * on the neighbor id) + ONE hash-agg (min per vertex) — both keyed by
  * vertex id, so a round costs the same as any keyed aggregation and
  * AQE's skew handling applies to high-degree vertices. Each round's
  * labels are eagerly `localCheckpoint`ed: that both caches them for the
  * next round AND truncates the logical lineage, which otherwise doubles
  * per round (the label set is referenced twice each iteration). The
  * convergence check rides the round's own materialization — no extra
  * pass. Driver state is two scalars (round counter, changed-count),
  * never vertex data.
  */
object Components {

  /** (id, comp) for every vertex that appears in `edges`; `comp` is the
    * min vertex id of the vertex's connected component. Vertices not in
    * any edge (singleton docs) are absent — callers wanting them add
    * `comp = id` rows for the complement.
    */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 50): DataFrame = {
    val a = col(aCol).cast("long")
    val b = col(bCol).cast("long")
    val sym = edges.select(a.as("src"), b.as("dst"))
      .union(edges.select(b.as("src"), a.as("dst")))
    val symC = sym.persist(StorageLevel.MEMORY_AND_DISK)
    var labels = symC.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("comp"))
    var iter = 0
    var changed = 1L
    var prevCkpt: DataFrame = null
    while (iter < maxIter && changed > 0) {
      val nbrMin = symC.join(labels, symC("dst") === labels("id"))
        .groupBy("src").agg(min("comp").as("nmin"))
      // localCheckpoint (eager), NOT persist: each round's plan references
      // the previous round's TWICE (join + select), so without truncating
      // the logical lineage the plan TREE doubles per round — 2^rounds
      // nodes by round 15 blew the driver heap in testing (the same
      // plan-explosion failure mode as an nlist-way expression tree).
      val next = labels.join(nbrMin, labels("id") === nbrMin("src"), "left")
        .select(labels("id").as("id"),
          least(labels("comp"), coalesce(col("nmin"), labels("comp"))).as("comp"),
          (col("nmin") < labels("comp")).as("_chg"))
        .localCheckpoint() // eager: round-i blocks exist once this returns
      // Drop the PREVIOUS round's checkpoint blocks now that its successor
      // is materialized — without this every round's (id, comp) set stays
      // cached until session end (rounds × |V| rows per invocation, and a
      // bench run invokes this twice). The final round's blocks are the
      // returned labels, so they alone survive; a localCheckpointed RDD
      // cannot be recomputed after unpersist, which is why only rounds
      // with a live successor are ever dropped.
      if (prevCkpt ne null) prevCkpt.unpersist(blocking = false)
      prevCkpt = next
      changed = next.filter(col("_chg")).count()
      labels = next.select("id", "comp")
      iter += 1
    }
    symC.unpersist(blocking = false)
    // Unconverged labels are WRONG labels (vertices > maxIter hops from
    // their component min still carry an intermediate id) — fail loudly
    // rather than return a silently incorrect clustering. Converged exits
    // never pay extra rounds, so the default maxIter is generous.
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds " +
          s"($changed labels still changing); component diameter exceeds " +
          "maxIter — raise it, or use large-star/small-star for " +
          "path-like topologies")
    labels
  }
}
