package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (ArrayType(FloatType)).
  *
  * Brute-force cosine top-k is the exact baseline: norms are precomputed
  * per row (narrow), then a join + dot-product + per-query top-k window.
  * The scale path is random-hyperplane LSH: each vector gets a small bucket
  * signature per hash table (narrow, codegen'd), candidates come from an
  * equi-join on (table, bucket) — the same join-on-band architecture as
  * [[Dedup]] — and only candidates pay the exact dot product. At 100 TB the
  * brute-force O(n²) join is impossible; the LSH path shuffles by bucket
  * key only and its cost tracks the candidate count.
  *
  * Reference scope: not in the reference repo; north-star LLM-pipeline
  * addition (BASELINE.json), from public LSH literature (Charikar 2002).
  */
object Similarity {

  /** All arithmetic in double: cast up front so Spark and any external
    * oracle evaluate the identical IEEE op sequence (left-to-right sum).
    */
  private def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Codegen'd dot product for the O(pairs) join hot path: the native
    * [[graft.functions.DotProduct]] expression (same left-to-right IEEE
    * fold as [[dot]] — bit-identical results). The built-in HOF composition
    * is interpreted per element (~5× slower over a 4M-pair join) and a
    * Scala UDF pays per-call array conversion; the native expression
    * indexes both unsafe arrays inline in the generated stage.
    */
  private def dotFast(a: Column, b: Column): Column =
    graft.functions.DotProduct(a, b)

  def l2Norm(v: Column): Column =
    sqrt(aggregate(transform(v, x => x * x), lit(0.0), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column = {
    val (ad, bd) = (asDouble(a), asDouble(b))
    dot(ad, bd) / (l2Norm(ad) * l2Norm(bd))
  }

  /** Exact cosine top-k neighbors for every vector (excluding the identity
    * pair), deterministic tie-break on neighbor id.
    *
    * Broadcast + mapPartitions, NOT a self-join: the candidate matrix
    * (id, vec, norm) is broadcast once per executor and each query row
    * keeps a k-bounded insertion list while streaming the candidates.
    * The join formulation materializes n² rows each carrying BOTH 64-dim
    * vectors through the exchange (~4 GB at 2000 vectors) plus an n²-row
    * window sort; this path materializes only n·k result rows and sorts
    * nothing. Exact KNN inherently requires the candidate side to fit in
    * executor memory — [[lshTopK]] is the path past that (the broadcast
    * ceiling, ~millions of vectors, is a physical limit of exact KNN, not
    * of this operator).
    *
    * IEEE-order note: the dot fold is the same left-to-right loop as
    * [[dot]]/dotFast, so results are bit-identical to the join formulation
    * (and to the DuckDB oracle's list_reduce fold).
    */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
                     k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val v = df.select(col(idCol).as("id").cast("long"), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", l2Norm(col("v")))
      .as[(Long, Array[Double], Double)]
    val bc = spark.sparkContext.broadcast(v.collect())
    v.mapPartitions { it =>
      val cands = bc.value
      it.flatMap { case (qid, qv, qn) =>
        // k-bounded insertion list ordered by (sim desc, nid asc) — exact
        // double comparisons, so identical to a full sort's ranking.
        val topSim = new Array[Double](k)
        val topNid = new Array[Long](k)
        var filled = 0
        var c = 0
        while (c < cands.length) {
          val (nid, cv, cn) = cands(c)
          if (nid != qid) {
            var acc = 0.0
            var i = 0
            val n = math.min(qv.length, cv.length)
            while (i < n) { acc += qv(i) * cv(i); i += 1 }
            val sim = acc / (qn * cn)
            val beatsLast = filled < k || sim > topSim(filled - 1) ||
              (sim == topSim(filled - 1) && nid < topNid(filled - 1))
            if (beatsLast) {
              var pos = if (filled < k) filled else k - 1
              while (pos > 0 && (sim > topSim(pos - 1) ||
                  (sim == topSim(pos - 1) && nid < topNid(pos - 1)))) {
                topSim(pos) = topSim(pos - 1); topNid(pos) = topNid(pos - 1)
                pos -= 1
              }
              topSim(pos) = sim; topNid(pos) = nid
              if (filled < k) filled += 1
            }
          }
          c += 1
        }
        (0 until filled).map(r => (qid, r + 1, topNid(r), topSim(r)))
      }
    }.toDF("qid", "rank", "nid", "sim")
  }

  /** Random-hyperplane sign signature: one bit per hyperplane, packed into
    * a long per hash table. Hyperplane components are deterministic from a
    * fixed LCG (uniform in [-1,1) — sign-LSH needs only symmetry, not
    * gaussianity).
    *
    * Implemented as ONE Scala UDF doing a tables×bits hyperplane
    * matrix-multiply per row (narrow, no shuffle). An expression-tree
    * version (tables×bits separate `aggregate(zip_with(_, lit(plane), _))`
    * subtrees) was measured to freeze the driver for minutes: the 64-way
    * tree gets duplicated across both sides of the candidate self-join and
    * Catalyst/codegen churns on a >10 MiB plan. One opaque vectorized
    * closure is the faster plan here.
    */
  def hyperplaneBuckets(vecCol: Column, dim: Int, tables: Int, bitsPerTable: Int,
                        seed: Long = 42L): Column = {
    var x = seed
    def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x }
    def comp(): Double = (next() >>> 11) * (2.0 / (1L << 53)) - 1.0
    // planes(t*bitsPerTable + b) — generation order matches the previous
    // expression-based version, so bucket assignments are unchanged.
    val planes: Array[Array[Double]] =
      Array.fill(tables * bitsPerTable)(Array.fill(dim)(comp()))
    val bucketize = udf { (arr: Array[Double]) =>
      Array.tabulate(tables) { t =>
        var packed = 0L
        var b = 0
        while (b < bitsPerTable) {
          val plane = planes(t * bitsPerTable + b)
          var proj = 0.0
          var i = 0
          val n = math.min(arr.length, plane.length)
          while (i < n) { proj += arr(i) * plane(i); i += 1 }
          if (proj >= 0) packed |= (1L << b)
          b += 1
        }
        packed
      }
    }
    bucketize(vecCol)
  }

  /** Approximate top-k: candidates share an LSH bucket in ≥1 table, then
    * exact cosine + per-query top-k over candidates only. Recall tuning:
    * more tables ↑recall ↑cost; more bits ↓bucket size ↓recall.
    */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String, k: Int,
              dim: Int, tables: Int = 8, bitsPerTable: Int = 8,
              seed: Long = 42L): DataFrame = {
    val v = df.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", l2Norm(col("v")))
      .withColumn("bks", hyperplaneBuckets(col("v"), dim, tables, bitsPerTable, seed))
    val banded = v.select(col("id"),
      posexplode(col("bks")).as(Seq("tbl", "bk")))
    val cands = banded.as("l").join(banded.as("r"),
        col("l.tbl") === col("r.tbl") && col("l.bk") === col("r.bk") &&
          col("l.id") =!= col("r.id"))
      .select(col("l.id").as("qid"), col("r.id").as("nid"))
      .distinct()
    val slim = v.select(col("id"), col("v"), col("nrm"))
    val scored = cands
      .join(slim.as("q"), col("qid") === col("q.id")).drop("id")
      .join(slim.as("c"), col("nid") === col("c.id")).drop("id")
      .select(col("qid"), col("nid"),
        (dotFast(col("q.v"), col("c.v")) / (col("q.nrm") * col("c.nrm"))).as("sim"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("sim"))
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold, exact brute-force
    * over the (a<b) half-matrix. Same broadcast + mapPartitions shape as
    * [[bruteForceTopK]] (and the same IEEE fold order): each row scans only
    * candidates with larger id and emits surviving pairs — no n²-row join
    * materialization, output is just the matching pairs. The LSH variant
    * above is the path past the exact-KNN broadcast ceiling.
    */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                         threshold: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val v = df.select(col(idCol).as("id").cast("long"), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", l2Norm(col("v")))
      .as[(Long, Array[Double], Double)]
    val bc = spark.sparkContext.broadcast(v.collect())
    v.mapPartitions { it =>
      val cands = bc.value
      it.flatMap { case (aid, av, an) =>
        cands.iterator.filter(_._1 > aid).flatMap { case (bid, bv, bn) =>
          var acc = 0.0
          var i = 0
          val n = math.min(av.length, bv.length)
          while (i < n) { acc += av(i) * bv(i); i += 1 }
          val sim = acc / (an * bn)
          if (sim >= threshold) Some((aid, bid, sim)) else None
        }
      }
    }.toDF("a_id", "b_id", "sim")
  }
}
