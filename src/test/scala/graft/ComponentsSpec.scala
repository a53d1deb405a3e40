package graft

import graft.operators.Components
import org.apache.spark.sql.functions._

/** Connected components: exactness vs a local union-find on a
  * deterministic pseudo-random graph, plus shape cases (clique-ish
  * near-dup clusters, worst-case path diameter, two separate
  * components).
  */
class ComponentsSpec extends SparkSpec {

  private def comps(edges: Seq[(Long, Long)], maxIter: Int = 20): Map[Long, Long] = {
    import spark.implicits._
    Components.connectedComponents(edges.toDF("a", "b"), "a", "b", maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("two components resolve to their min ids") {
    val got = comps(Seq((3L, 2L), (2L, 1L), (10L, 11L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("path graph (worst-case diameter) converges") {
    // 0-1-2-...-15: diameter 15, needs that many propagation rounds
    val edges = (0L until 15L).map(i => (i, i + 1))
    val got = comps(edges)
    assert(got === (0L to 15L).map(_ -> 0L).toMap)
  }

  test("matches a local union-find on a pseudo-random graph") {
    // deterministic LCG edge set over 60 vertices (sparse → several
    // non-trivial components)
    var x = 12345L
    def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; (x >>> 33) % 60 }
    val edges = Seq.fill(40)((next(), next())).filter { case (a, b) => a != b }
    // local union-find ground truth
    val parent = collection.mutable.Map((0L until 60L).map(i => i -> i): _*)
    def find(v: Long): Long = if (parent(v) == v) v else { val r = find(parent(v)); parent(v) = r; r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val want = verts.map(v => v -> find(v)).toMap
    assert(comps(edges) === want)
  }

  test("singleton-free output: only vertices present in edges appear") {
    val got = comps(Seq((5L, 7L)))
    assert(got.keySet === Set(5L, 7L))
  }

  // ---- star-contraction variant ----

  private def starComps(edges: Seq[(Long, Long)], maxIter: Int = 50): Map[Long, Long] = {
    import spark.implicits._
    Components.connectedComponentsStar(edges.toDF("a", "b"), "a", "b", maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("star contraction matches hash-to-min on shape cases") {
    val cases = Seq(
      Seq((3L, 2L), (2L, 1L), (10L, 11L)),
      Seq((5L, 7L)),
      Seq((1L, 2L), (2L, 3L), (3L, 1L), (7L, 8L)), // triangle + pair
      Seq((4L, 4L), (4L, 9L)),                     // self-loop ignored
      // self-loop-ONLY vertex: the contraction's u != v filter drops the
      // edge, but the vertex must still be labeled (comp = itself) —
      // hash-to-min labels it, and a dedup pipeline swapping variants
      // must not silently lose its survivor row
      Seq((5L, 5L)),
      Seq((5L, 5L), (1L, 2L))
    )
    cases.foreach { es => assert(starComps(es) === comps(es), s"edges=$es") }
  }

  test("star contraction matches a local union-find on a pseudo-random graph") {
    var x = 99L
    def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; (x >>> 33) % 80 }
    val edges = Seq.fill(55)((next(), next())).filter { case (a, b) => a != b }
    val parent = collection.mutable.Map((0L until 80L).map(i => i -> i): _*)
    def find(v: Long): Long = if (parent(v) == v) v else { val r = find(parent(v)); parent(v) = r; r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    assert(starComps(edges) === verts.map(v => v -> find(v)).toMap)
  }

  test("both algorithms match union-find on a 2000-vertex mixed-shape graph") {
    // larger deterministic graph mixing sparse random edges (many small
    // components), one long chain (diameter stress), and one star hub
    var x = 2024L
    def next(m: Long): Long = {
      x = x * 6364136223846793005L + 1442695040888963407L; (x >>> 33) % m
    }
    val random = Seq.fill(900)((next(2000), next(2000)))
    val chain = (1500L until 1560L).map(i => (i, i + 1))
    val hub = (1L until 40L).map(i => (1700L, 1700L + i))
    val edges = (random ++ chain ++ hub).filter { case (a, b) => a != b }
    val parent = collection.mutable.Map.empty[Long, Long].withDefault(identity)
    def find(v: Long): Long = if (parent(v) == v) v else { val r = find(parent(v)); parent(v) = r; r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val want = verts.map(v => v -> find(v)).toMap
    assert(comps(edges, maxIter = 80) === want)
    assert(starComps(edges) === want)
  }

  test("incremental fold == rebuild over the union graph (merges, new vertices, no-ops)") {
    import spark.implicits._
    // old graph: three components {1,2,3}, {10,11}, {20,21,22} plus a
    // chain component {30,31}
    val oldEdges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L),
      (21L, 22L), (30L, 31L))
    val prev = Components.connectedComponents(oldEdges.toDF("a", "b"), "a", "b")
    // batch: a CHAIN of merges across three old components (the merge
    // must propagate through the contracted graph, not just one hop),
    // one brand-new two-vertex component, one edge INSIDE an old
    // component (no-op), and a new vertex attaching to an old component
    val batch = Seq((3L, 10L), (11L, 20L), (100L, 101L), (21L, 22L),
      (31L, 200L))
    val got = Components.incrementalComponents(prev, batch.toDF("a", "b"),
        "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = comps(oldEdges ++ batch)
    assert(got === want)
    // idempotence: folding the same batch into the result changes nothing
    val again = Components.incrementalComponents(
        Components.incrementalComponents(prev, batch.toDF("a", "b"), "a", "b"),
        batch.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === want)
    // empty batch: labels pass through untouched
    val same = Components.incrementalComponents(prev,
        Seq.empty[(Long, Long)].toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(same === comps(oldEdges))
  }

  test("deletion: splits, min-removal, pass-through, singletons, reinsert round-trip") {
    import spark.implicits._
    // {1,2,3} via bridge 2 (deleting 2 SPLITS it); {10,11,12} with the
    // component MIN 10 deletable (the survivors must re-min); {20,21}
    // untouched (must pass through verbatim); {30,31} fully erasable
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L),
      (20L, 21L), (30L, 31L))
    val prev = Components.connectedComponents(edges.toDF("a", "b"), "a", "b")
    def del(ids: Seq[Long]): Map[Long, Long] =
      Components.deleteFromComponents(prev, edges.toDF("a", "b"), "a", "b",
          ids.toDF("id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // bridge delete splits {1,2,3} into singletons {1} and {3}; min
    // delete re-mins {10,11,12} to {11,12}@11; {30,31} vanishes
    // entirely; {20,21} is untouched
    assert(del(Seq(2L, 10L, 30L, 31L)) ===
      Map(1L -> 1L, 3L -> 3L, 11L -> 11L, 12L -> 11L, 20L -> 20L, 21L -> 20L))
    // disjoint-id delete is a no-op (999 touches nothing)
    assert(del(Seq(999L)) === comps(edges))
    // empty delete is a no-op
    assert(del(Seq.empty) === comps(edges))
    // delete-then-REINSERT round-trips through the upsert twin: erasing
    // the bridge and re-adding its edges via incrementalComponents
    // restores the original labeling exactly
    val afterDel = Components.deleteFromComponents(prev,
      edges.toDF("a", "b"), "a", "b", Seq(2L).toDF("id"))
    val restored = Components.incrementalComponents(afterDel,
        Seq((1L, 2L), (2L, 3L)).toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(restored === comps(edges))
  }

  test("star contraction needs far fewer rounds than hash-to-min on a path") {
    // 0-1-2-...-40: diameter 40. hash-to-min propagates the min one hop
    // per round (O(diameter)); star contraction halves component height
    // per alternation (O(log n)) — the property that makes it the robust
    // choice for chain-shaped near-dup graphs (template spam).
    import spark.implicits._
    val edges = (0L until 40L).map(i => (i, i + 1)).toDF("a", "b")
    val (hLabels, hRounds) = Components.hashToMinWithRounds(edges, "a", "b", 60)
    val (sLabels, sRounds) = Components.starWithRounds(edges, "a", "b", 60)
    val want = (0L to 40L).map(_ -> 0L).toMap
    assert(hLabels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap === want)
    assert(sLabels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap === want)
    assert(sRounds <= 12, s"star took $sRounds rounds")
    assert(sRounds < hRounds, s"star=$sRounds hash-to-min=$hRounds")
  }
}
