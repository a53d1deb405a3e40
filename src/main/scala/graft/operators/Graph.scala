package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed graph analytics over a document link graph.
  *
  * A training-data pipeline at crawl scale is also a graph pipeline:
  * PageRank-family centrality over the host/page link graph is a
  * standard quality-weighting signal for crawled corpora (Page et al.
  * 1999, "The PageRank Citation Ranking"; Common Crawl publishes
  * harmonic-centrality host rankings for exactly this use), triangle
  * statistics measure local clustering (Watts–Strogatz), and BFS
  * reachability bounds crawl frontier depth. The reference repo's own
  * surface (`/root/reference/hadoop_tutorial/src/Kmeans.java:163-179`)
  * is an iterative driver loop over a bulk-synchronous job — the same
  * execution shape PageRank and BFS take here, re-expressed as
  * DataFrame self-joins per superstep instead of MR rounds.
  *
  * The edge set is derived deterministically from `documents` keys
  * (each doc "links to" 1–3 pseudo-random others via fixed multiplier
  * arithmetic mod |V|) because the synthetic corpus carries no real
  * hyperlinks; the derivation is identical SQL in the DuckDB oracle.
  * Out-degree is bounded by 3, so the graph stays sparse at every
  * scale — the operators below never materialize anything denser than
  * O(|E|) rows.
  *
  * Scale notes (the part that matters at 100 TB):
  *  - Every superstep shuffles by vertex id only — contributions are
  *    map-side pre-aggregated by the hash-partial of the groupBy; no
  *    driver-held collections besides the |V| scalar and the final
  *    bounded top-k.
  *  - PageRank arithmetic is integer-scaled (rank × 10^12 as BIGINT,
  *    floor division per edge) so sums are exact and shuffle order
  *    cannot move a bit — the same order-independence discipline the
  *    DECIMAL money aggregates use. A float PageRank would diverge
  *    between engines in the last ulp after 5 iterations.
  *  - Triangle counting uses the degree-ordered (compact-forward)
  *    orientation [Latapy 2008, "Main-memory triangle computations for
  *    very large (sparse (power-law)) graphs"]: each undirected edge
  *    is directed from its lower-(degree, id) endpoint, so a vertex
  *    generates wedges only among its HIGHER-ordered neighbors —
  *    per-vertex work is O(min(deg)²) not O(max(deg)²), which is the
  *    difference between feasible and not on power-law crawl graphs.
  */
object Graph {

  /** Integer rank scale: rank 1.0 ≡ 10^12. 15*SCALE and 85*total-rank
    * both stay far inside Long range for any |V| this engine meets in
    * one partition-able graph (overflow at |V| ≈ 10^5 teradocs).
    */
  val Scale: Long = 1000000000000L

  /** Directed link edges (src, dst): doc u → (131u + 17j) mod n for
    * j ∈ {1 .. 1 + (u mod 3)}, self-loops removed, deduplicated. The
    * per-key out-degree (1–3) is what makes the graph irregular —
    * with a constant j range every vertex has in-degree exactly 3
    * (u → 131u + 17j is a bijection mod n) and PageRank degenerates
    * to the uniform vector, which would let a wrong implementation
    * pass. `n` is passed in (one driver-held scalar, counted once by
    * the caller).
    */
  def linkEdges(docs: DataFrame, n: Long): DataFrame = {
    // every Graph entry point funnels through here before any `/ n` or
    // `% n`: an empty corpus must die with the contract message, not a
    // bare ArithmeticException (or an ANSI-dependent null modulo)
    require(n > 0, s"graph over an empty corpus: vertex count n = $n")
    docs.select(col("doc_id").cast("long").as("src"))
      .select(col("src"),
        explode(array(lit(1L), lit(2L), lit(3L))).as("j"))
      .filter(col("j") <= lit(1L) + col("src") % 3L)
      .select(col("src"),
        ((col("src") * 131L + col("j") * 17L) % n).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  /** Undirected edge list with u < v, deduplicated. */
  def undirected(edges: DataFrame): DataFrame =
    edges.select(
      least(col("src"), col("dst")).as("u"),
      greatest(col("src"), col("dst")).as("v"))
      .distinct()

  /** Integer-scaled PageRank, fixed iteration count, damping 85/100.
    *
    * Per superstep: contribution of u to each out-neighbor is
    * floor(rank_u / outdeg_u); new rank is
    * floor(15·SCALE / (100n)) + floor(85·Σcontrib / 100).
    * All BIGINT, so the result is bit-identical regardless of
    * partitioning, shuffle order, or engine. Vertices with no
    * in-links keep the teleport term via the left join on the full
    * vertex set. Returns (doc_id, rank) for ALL vertices.
    */
  /** Full rank vector as a lazy DataFrame (doc_id, rank) — the form
    * downstream operators compose with (e.g. centrality-weighted
    * sampling). The adjacency subplan recurs once per iteration inside
    * ONE plan; Spark's ReuseExchange collapses the identical shuffle,
    * so no explicit persist (and therefore no cache lifetime to manage
    * on a DataFrame we hand to the caller).
    *
    * `iterations` cost model: each extra iteration adds exactly two
    * keyed shuffles to the one lazy plan (contributions grouped by
    * dst, then the left join back onto the vertex set) and nothing
    * driver-side — the default 5 is tuned to the test fixtures'
    * convergence, and turning it up for a larger graph scales the
    * plan linearly with no new scan of `docs`.
    */
  def pageRankScores(docs: DataFrame, n: Long,
                     iterations: Int = 5): DataFrame = {
    val vertices = docs.select(col("doc_id").cast("long").as("id"))
    val edges = linkEdges(docs, n)
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val adj = edges.join(outdeg, "src")
    val teleport = lit(15L * Scale / (100L * n))
    var ranks = vertices.select(col("id"), lit(Scale / n).as("rank"))
    for (_ <- 1 to iterations) {
      val contrib = adj
        .join(ranks, adj("src") === ranks("id"))
        .select(col("dst"), expr("rank div outdeg").as("c"))
        .groupBy("dst").agg(sum("c").as("c"))
      ranks = vertices
        .join(contrib, vertices("id") === contrib("dst"), "left")
        .select(col("id"),
          (teleport + expr("85 * coalesce(c, 0L) div 100")).as("rank"))
    }
    ranks.select(col("id").as("doc_id"), col("rank"))
  }

  def pageRank(docs: DataFrame, n: Long, iterations: Int = 5): DataFrame = {
    // The deliverable is the bounded top-20 (TakeOrderedAndProject —
    // never a global sort of |V| rows). Collecting 20 rows to the
    // driver is the same justified-bounded pattern as k-means
    // centroids.
    val top = pageRankScores(docs, n, iterations)
      .orderBy(col("rank").desc, col("doc_id")).limit(20)
      .collect()
    val spark = docs.sparkSession
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("rank",
        org.apache.spark.sql.types.LongType, nullable = false)))
    spark.createDataFrame(java.util.Arrays.asList(top: _*), schema)
      .orderBy(col("rank").desc, col("doc_id"))
  }

  /** Global triangle census of the undirected link graph: one row of
    * (n_nodes, n_edges, n_wedges, n_triangles). Wedge count is the
    * exact Σ C(deg,2); triangles via degree-ordered wedge closure.
    */
  def triangleStats(docs: DataFrame, n: Long): DataFrame = {
    val und = undirected(linkEdges(docs, n))
    val deg = und.select(col("u").as("node"))
      .unionAll(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // orient every edge from its lower (deg, id) endpoint
    val e = und
      .join(deg.withColumnRenamed("node", "u").withColumnRenamed("deg", "du"), "u")
      .join(deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dv"), "v")
    val oriented = e.select(
      when(col("du") < col("dv") ||
           (col("du") === col("dv") && col("u") < col("v")),
        struct(col("u").as("src"), col("v").as("dst"), col("dv").as("ddst")))
        .otherwise(
          struct(col("v").as("src"), col("u").as("dst"), col("du").as("ddst")))
        .as("o"))
      .select(col("o.src"), col("o.dst"), col("o.ddst"))
    // wedges among higher-ordered neighbors of a common src, then close
    val o1 = oriented.select(col("src"), col("dst").as("b"), col("ddst").as("db"))
    val o2 = oriented.select(col("src"), col("dst").as("c"), col("ddst").as("dc"))
    val wedgePairs = o1.join(o2, "src")
      .filter(col("db") < col("dc") ||
        (col("db") === col("dc") && col("b") < col("c")))
    val closed = wedgePairs.join(
      oriented.select(col("src").as("b"), col("dst").as("c")),
      Seq("b", "c"))
    // `div`, not `/`: Spark `/` on BIGINT is DOUBLE division, which
    // loses exactness once the wedge sum passes 2^53.
    val nodes = deg.agg(
      count(lit(1)).as("n_nodes"),
      expr("sum(deg * (deg - 1)) div 2").as("n_wedges"))
    val edgesN = und.agg(count(lit(1)).as("n_edges"))
    val triN = closed.agg(count(lit(1)).as("n_triangles"))
    nodes.crossJoin(edgesN).crossJoin(triN)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"))
  }

  /** HITS hubs-and-authorities (Kleinberg 1999), integer-exact.
    *
    * Same superstep shape as [[pageRank]] — the score exchange is a
    * join on the edge key — but mutually recursive: authority mass
    * flows along in-links from hub scores, hub mass along out-links
    * from authority scores. Normalization is L1 (divide by the global
    * sum) rather than the textbook L2 — a square root has no exact
    * integer form; L1 is an equally valid scaling choice (any norm
    * only fixes the scale factor) and keeps every value a BIGINT so
    * the result is shuffle-order independent. The global sum is a
    * 1-row aggregate broadcast back over the scores (scalar subquery
    * in the oracle) — never a driver round-trip.
    *
    * Fixed-point layout: scores carry factor 10^12; the normalize
    * step computes (x · 10^6) div (Σx div 10^6), keeping every
    * intermediate under 2^63 for graphs up to ~10^6 vertices at
    * in/out-degree ≤ 3 (beyond that, swap to the documented double
    * path — exactness is a test-oracle property, not a production
    * requirement).
    *
    * `iterations` cost model: one HITS iteration = two supersteps
    * (authority then hub), each a keyed shuffle plus an L1 normalize
    * that materializes the score vector once (persist) and pulls ONE
    * Long to the driver — so wall cost is linear in `iterations` with
    * 2 shuffles + 2 bounded scalar jobs each. The default 2 is tuned
    * to the test fixtures' convergence; a larger graph wanting more
    * iterations pays exactly that linear increment, nothing
    * superlinear.
    */
  def hits(docs: DataFrame, n: Long, iterations: Int = 2): DataFrame = {
    val vertices = docs.select(col("doc_id").cast("long").as("id"))
    val edges = linkEdges(docs, n).persist()
    val cached = scala.collection.mutable.ArrayBuffer[DataFrame](edges)
    // L1 normalize with the global sum pulled to the driver as ONE Long
    // (the k-means ΔWCSS pattern — a bounded scalar, never data). An
    // in-plan broadcast(agg) here would nest a broadcast subquery per
    // normalize, and each broadcast re-executes its whole upstream
    // lineage — with 4 normalizes that compounds to ~2^4 recomputes of
    // the edge-join chain (measured 9.6 s at sf0.1; this form is ~5×
    // cheaper). Persisting the raw scores first means the aggregation
    // and the division read one materialization.
    def l1normalize(scores: DataFrame, c: String): DataFrame = {
      val p = scores.persist()
      cached += p
      // sum over ZERO rows is SQL null — coalesce so a caller passing a
      // stale n with an empty docs side gets the empty result the rest
      // of the suite returns, not a bare NullPointerException
      val tot = p.agg(coalesce(sum(col(c)), lit(0L))).collect()(0).getLong(0)
      // Scala's / on Long IS floor-toward-zero integer division over
      // positives — identical to the previous in-plan `_tot div 1000000L`.
      // max(1L, ·) guards the tiny-graph case where the global sum is
      // under 10^6 and the scaled divisor would be 0 (the oracle
      // mirrors the same greatest(1, ·) guard).
      p.select(col("id"),
        expr(s"($c * 1000000L) div ${math.max(1L, tot / 1000000L)}L").as(c))
    }
    var hub = vertices.select(col("id"), lit(Scale).as("hub"))
    var auth = vertices.select(col("id"), lit(0L).as("auth"))
    for (_ <- 1 to iterations) {
      val a = edges.join(hub, edges("src") === hub("id"))
        .groupBy(col("dst").as("aid")).agg(sum("hub").as("auth"))
      auth = l1normalize(
        vertices.join(a, vertices("id") === col("aid"), "left")
          .select(col("id"), coalesce(col("auth"), lit(0L)).as("auth")),
        "auth")
      val h = edges.join(auth, edges("dst") === auth("id"))
        .groupBy(col("src").as("hid")).agg(sum("auth").as("hub"))
      hub = l1normalize(
        vertices.join(h, vertices("id") === col("hid"), "left")
          .select(col("id"), coalesce(col("hub"), lit(0L)).as("hub")),
        "hub")
    }
    val joined = auth.join(hub, "id")
      .select(col("id").as("doc_id"), col("auth"), col("hub"))
      .orderBy(col("auth").desc, col("doc_id")).limit(20)
      .collect()
    cached.foreach(_.unpersist(blocking = false))
    val spark = docs.sparkSession
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("auth",
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField("hub",
        org.apache.spark.sql.types.LongType, nullable = true)))
    spark.createDataFrame(java.util.Arrays.asList(joined: _*), schema)
      .orderBy(col("auth").desc, col("doc_id"))
  }

  /** Shortest hop distance from `source` over directed link edges,
    * bounded at `maxDepth` supersteps. Frontier-expansion BFS: each
    * round joins the previous frontier against the adjacency list and
    * folds new vertices in with a min-distance groupBy — the Pregel
    * shape, one vertex-id shuffle per round. Returns (doc_id, dist)
    * for every reached vertex.
    */
  def bfsDepths(docs: DataFrame, n: Long, source: Long = 0L,
                maxDepth: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val edges = linkEdges(docs, n)
    var reached: DataFrame = Seq((source, 0)).toDF("id", "dist")
    var prevCkpt: DataFrame = null
    for (depth <- 1 to maxDepth) {
      val frontier = reached.filter(col("dist") === depth - 1)
      val next = frontier
        .join(edges, frontier("id") === edges("src"))
        .select(col("dst").as("id"), lit(depth).as("dist"))
      reached = reached.unionAll(next)
        .groupBy("id").agg(min("dist").as("dist"))
      // `reached` is referenced TWICE per round (filter + unionAll), so
      // the lazy plan doubles per superstep — 2^depth lineage copies is
      // the plan-explosion failure mode Components.scala checkpoints
      // against. Truncate every 5 rounds via IterCkpt (localCheckpoint,
      // or reliable checkpoint when graft.iter.checkpointDir is set):
      // the shallow default stays ONE lazy job (no materialization,
      // unchanged plan), a deep walk's plan is bounded at 2^5 copies
      // between truncations. A superseded truncation's blocks are
      // dropped only once a successor exists (truncated state cannot be
      // recomputed after the drop).
      if (depth % 5 == 0 && depth < maxDepth) {
        val ck = IterCkpt.truncate(reached)
        if (prevCkpt ne null) IterCkpt.drop(prevCkpt)
        prevCkpt = ck
        reached = ck
      }
    }
    reached.select(col("id").as("doc_id"), col("dist").cast("long").as("dist"))
  }
}
