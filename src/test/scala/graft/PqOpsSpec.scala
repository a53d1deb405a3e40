package graft

import graft.functions.{NearestCells, PqOps}
import org.apache.spark.sql.functions._

/** Parity + contract tests for the native PQ expression family
  * (UnitVector, PqCode, AdcTable, fused IvfPqEncode/IvfPqProbe):
  * bit-identical to the reference Scala scans they replaced.
  */
class PqOpsSpec extends SparkSpec {

  private val rng = new scala.util.Random(7)
  private val m = 4
  private val subDim = 4
  private val dim = m * subDim
  private val nCodes = 8
  private val codebooks: Array[Array[Array[Double]]] =
    Array.fill(m, nCodes)(Array.fill(subDim)(rng.nextDouble()))
  private val centroids: Array[Array[Double]] =
    Array.fill(6)(Array.fill(dim)(rng.nextDouble()))

  /** Reference semantics: the exact loops of the replaced UDFs. */
  private def refUnit(a: Array[Double]): Array[Double] = {
    val nrm = math.sqrt(a.map(x => x * x).sum)
    if (nrm == 0) a else a.map(_ / nrm)
  }
  private def refCode(u: Array[Double]): Seq[Int] =
    (0 until m).map { mi =>
      (0 until nCodes).minBy { c =>
        (0 until subDim).map(j =>
          (u(mi * subDim + j) - codebooks(mi)(c)(j)) match { case d => d * d })
          .sum
      }
    }
  private def refTable(u: Array[Double]): Seq[Double] =
    for (mi <- 0 until m; c <- 0 until nCodes) yield
      (0 until subDim).map { j =>
        val d = u(mi * subDim + j) - codebooks(mi)(c)(j); d * d
      }.sum
  private def refCell(u: Array[Double]): Int =
    centroids.indices.minBy { c =>
      (0 until dim).map { j => val d = u(j) - centroids(c)(j); d * d }.sum
    }

  private def df(vs: Seq[(Long, Array[Double])]) = {
    import spark.implicits._
    vs.map { case (id, v) => (id, v.toSeq) }.toDF("id", "v")
  }

  private val vecs: Seq[(Long, Array[Double])] =
    (0L until 100L).map(i => i -> Array.fill(dim)(rng.nextDouble() * 4 - 2)) :+
      (100L -> Array.fill(dim)(0.0)) // zero-norm row passes through unscaled

  test("UnitVector matches reference normalization incl. zero-norm rows") {
    val got = df(vecs).select(col("id"), PqOps.unitVec(col("v")).as("u"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    for ((id, v) <- vecs)
      assert(got(id) === refUnit(v).toSeq, s"unit mismatch id=$id")
  }

  test("PqCode / AdcTable over unit vectors match the reference scans") {
    val k = PqOps.kernel(codebooks)
    val rows = df(vecs).select(col("id"),
        PqOps.code(PqOps.unitVec(col("v")), k).as("code"),
        PqOps.table(PqOps.unitVec(col("v")), k).as("tab"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1), r.getSeq[Double](2)))
    for ((id, code, tab) <- rows) {
      val u = refUnit(vecs.find(_._1 == id).get._2)
      assert(code === refCode(u), s"code mismatch id=$id")
      assert(tab === refTable(u), s"table mismatch id=$id")
    }
  }

  test("fused IvfPqEncode == separate cell + code; IvfPqProbe == table + probes") {
    val fused = new graft.functions.IvfPqKernel(
      NearestCells.kernel(centroids), PqOps.kernel(codebooks))
    val enc = df(vecs).select(col("id"),
        PqOps.ivfEncode(col("v"), fused).as("cc"),
        PqOps.ivfProbe(col("v"), fused, 3).as("tp"))
      .select(col("id"), col("cc.cell"), col("cc.code"),
        col("tp.tab"), col("tp.probes"))
      .collect()
    for (r <- enc) {
      val u = refUnit(vecs.find(_._1 == r.getLong(0)).get._2)
      assert(r.getInt(1) === refCell(u))
      assert(r.getSeq[Int](2) === refCode(u))
      assert(r.getSeq[Double](3) === refTable(u))
      val byDist = centroids.indices.map { c =>
        ((0 until dim).map { j => val d = u(j) - centroids(c)(j); d * d }.sum, c)
      }.sortBy(identity).take(3).map(_._2)
      assert(r.getSeq[Int](4) === byDist)
    }
  }

  test("ragged inputs fail loudly through the fused kernel") {
    val fused = new graft.functions.IvfPqKernel(
      NearestCells.kernel(centroids), PqOps.kernel(codebooks))
    val e = intercept[Exception] {
      df(Seq(1L -> Array.fill(dim + 1)(0.3)))
        .select(PqOps.ivfEncode(col("v"), fused)).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(m => Option(m.getMessage).getOrElse("")).mkString("; ")
    assert(msgs.contains("dims"))
  }

  test("ragged vectors fail loudly in the LSH signature kernel") {
    // The replaced UDF's min-length clamp silently projected a
    // truncated vector into a REAL bucket (plausible candidates from
    // corrupt input); the kernel now rejects it like the rest of the
    // family.
    import spark.implicits._
    val hk = new graft.functions.HyperplaneKernel(
      Array.fill(2 * 2 * dim)(0.1), dim, 2, 2)
    val e = intercept[Exception] {
      Seq(Seq.fill(dim - 1)(0.5)).toDF("v")
        .select(PqOps.hyperplaneBuckets(col("v"), hk)).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("; ")
    assert(msgs.contains("LSH planes expect"), msgs)
  }

  test("AdcScore rejects a table sized for a different model") {
    // codes encoded with one PQModel scored against another model's
    // table: without the slot-count check, unchecked UnsafeArrayData
    // reads would return plausible garbage rankings instead of failing
    import graft.functions.AdcScore
    import spark.implicits._
    val rows = Seq((Seq(0, 1, 2, 3), Seq.fill(m * (nCodes / 2))(0.5)))
      .toDF("code", "tab")
    val e = intercept[Exception] {
      rows.select(AdcScore(col("code"), col("tab"), nCodes)).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("; ")
    assert(msgs.contains("encoded data and search model disagree"))
  }

  test("ivfTopK accepts nprobe = 1 (single-probe search, not cell mode)") {
    import spark.implicits._
    val emb = (0L until 60L)
      .map(i => (i, Seq.fill(8)(rng.nextDouble().toFloat)))
      .toDF("vec_id", "embedding")
    val out = graft.operators.Similarity.ivfTopK(
      emb, "vec_id", "embedding", k = 3, nlist = 4, nprobe = 1)
    assert(out.count() > 0)
  }

  test("ivfIndex + ivfProbe composition is row-identical to ivfTopK") {
    // the train/probe split exists so calibration sweeps nprobe without
    // re-paying Lloyd; the composed path must stay THE ivfTopK — same
    // rows, same sims, with and without a query-side predicate
    import spark.implicits._
    val S = graft.operators.Similarity
    val emb = (0L until 60L)
      .map(i => (i, Seq.fill(8)(rng.nextDouble().toFloat)))
      .toDF("vec_id", "embedding")
    val idx = S.ivfIndex(emb, "vec_id", "embedding", nlist = 4)
    for (pred <- Seq(None, Some(graft.operators.Sampling.samplePred(0.5)))) {
      val mono = S.ivfTopK(emb, "vec_id", "embedding", k = 3,
        nlist = 4, nprobe = 2, queryPred = pred)
        .orderBy("qid", "rank").collect().toSeq
      val split = S.ivfProbe(idx, k = 3, nprobe = 2, queryPred = pred)
        .orderBy("qid", "rank").collect().toSeq
      assert(mono.nonEmpty && mono == split,
        s"split path diverged from ivfTopK (pred=${pred.isDefined})")
    }
  }

  test("ivfProbeFor at full probe is row-identical to the exact brute force") {
    // the external-queries serving path: probing every cell scans every
    // candidate, so the ONLY differences from bruteForceTopKFor could be
    // normalization, scoring, self-exclusion, or tie-breaks — all four
    // are contracted identical, so the rows must match bit-for-bit
    import spark.implicits._
    val S = graft.operators.Similarity
    val emb = (0L until 60L)
      .map(i => (i, Seq.fill(8)(rng.nextDouble().toFloat)))
      .toDF("vec_id", "embedding")
    val ext = (100L until 110L)
      .map(i => (i, Seq.fill(8)(rng.nextDouble().toFloat)))
      .toDF("vec_id", "embedding")
    val idx = S.ivfIndex(emb, "vec_id", "embedding", nlist = 4)
    val ivf = S.ivfProbeFor(idx, ext, "vec_id", "embedding", k = 3, nprobe = 4)
      .orderBy("qid", "rank").collect().toSeq
    val bf = S.bruteForceTopKFor(ext, emb, "vec_id", "embedding", k = 3)
      .orderBy("qid", "rank").collect().toSeq
    assert(ivf.nonEmpty && ivf == bf)
  }

  test("ivfUpsert == frozen-quantizer rebuild; re-ingest replaces stale rows") {
    import spark.implicits._
    val S = graft.operators.Similarity
    def vecs(ids: Range) = ids
      .map(i => (i.toLong, Seq.fill(8)(rng.nextDouble().toFloat)))
      .toDF("vec_id", "embedding")
    val old = vecs(0 until 50).cache()
    val batch = vecs(50 until 60).cache()
    val idx = S.ivfIndex(old, "vec_id", "embedding", nlist = 4)
    val up = S.ivfUpsert(idx, batch, "vec_id", "embedding")
    // maintenance == rebuild at the FIXED quantizer: upserting the batch
    // lands on exactly the rows frozen-quantizer assignment of the whole
    // merged corpus produces (same kernel, same cells, same doubles)
    val rebuilt = S.ivfAssign(idx.kernel, old.unionAll(batch),
      "vec_id", "embedding")
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getSeq[Double](1), r.getDouble(2), r.getInt(3))
    assert(up.assigned.select("nid", "nv", "nnrm", "cell").collect().map(key).toSet ===
      rebuilt.select("nid", "nv", "nnrm", "cell").collect().map(key).toSet)
    // full-width probe over the merged index == exact brute force over
    // the merged corpus (the q_ann_incr claim, pinned here in-miniature)
    val ext = vecs(100 until 105)
    val got = S.ivfProbeFor(up, ext, "vec_id", "embedding", k = 3, nprobe = 4)
      .orderBy("qid", "rank").collect().toSeq
    val bf = S.bruteForceTopKFor(ext, old.unionAll(batch), "vec_id",
        "embedding", k = 3)
      .orderBy("qid", "rank").collect().toSeq
    assert(got.nonEmpty && got == bf)
    // a RE-CRAWLED id (same id, new vector) replaces its stale row
    val recrawl = Seq((7L, Seq.fill(8)(rng.nextDouble().toFloat)))
      .toDF("vec_id", "embedding")
    val up2 = S.ivfUpsert(up, recrawl, "vec_id", "embedding")
    val row7 = up2.assigned.filter(col("nid") === 7L).collect()
    val want = S.ivfAssign(idx.kernel, recrawl, "vec_id", "embedding").collect()
    assert(row7.length === 1 && key(row7(0)) === key(want(0)))
    assert(up2.assigned.count() === 60)
  }

  test("ivfPq/pq/lsh upserts are bit-identical to frozen-quantizer rebuilds") {
    import spark.implicits._
    val S = graft.operators.Similarity
    def vecs(ids: Range) = ids
      .map(i => (i.toLong, Seq.fill(16)(rng.nextDouble().toFloat)))
      .toDF("vec_id", "embedding")
    val old = vecs(0 until 200).cache()
    val batch = vecs(200 until 240).cache()
    val full = old.unionAll(batch)
    // IVF-PQ: upsert == fused-kernel re-encode of the merged corpus
    val ipq = S.ivfPqIndex(old, "vec_id", "embedding", nlist = 4, m = 4,
      codes = 8)
    val upPq = S.ivfPqUpsert(ipq, batch, "vec_id", "embedding")
    val rebuilt = S.ivfPqUpsert(
      ipq.copy(encoded = ipq.encoded.limit(0)), full, "vec_id", "embedding")
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSet
    assert(rowsOf(upPq.encoded) === rowsOf(rebuilt.encoded))
    assert(upPq.encoded.count() === 240)
    // flat PQ: same claim through pqUpsert/pqEncode
    val model = S.pqTrain(old, "vec_id", "embedding", m = 4, codes = 8,
      sampleMod = 1)
    val enc = S.pqEncode(old, "vec_id", "embedding", model)
    val upFlat = S.pqUpsert(enc, model, batch, "vec_id", "embedding")
    def flatRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toSet
    assert(flatRows(upFlat) ===
      flatRows(S.pqEncode(full, "vec_id", "embedding", model)))
    // LSH: data-oblivious — upserted banded/slim tables equal a rebuild
    val lsh = S.lshIndex(old, "vec_id", "embedding", dim = 16, tables = 4,
      bitsPerTable = 4)
    val upLsh = S.lshUpsert(lsh, batch, "vec_id", "embedding")
    val reLsh = S.lshIndex(full, "vec_id", "embedding", dim = 16, tables = 4,
      bitsPerTable = 4)
    def banded(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(banded(upLsh.banded) === banded(reLsh.banded))
    assert(upLsh.slim.count() === 240)
    // re-crawl replacement: a changed vector's row is replaced, not doubled
    val recrawl = Seq((3L, Seq.fill(16)(rng.nextDouble().toFloat)))
      .toDF("vec_id", "embedding")
    val upPq2 = S.ivfPqUpsert(upPq, recrawl, "vec_id", "embedding")
    assert(upPq2.encoded.count() === 240 &&
      upPq2.encoded.filter(col("id") === 3L).count() === 1)
  }

  test("lshIndex + lshProbeFor with the corpus as queries equals lshTopK") {
    // LSH is data-oblivious: the index is just the banded corpus, so an
    // external probe that buckets its queries through the same seeded
    // kernel must reproduce the self-kNN path exactly when handed the
    // corpus itself
    import spark.implicits._
    val S = graft.operators.Similarity
    val emb = (0L until 60L)
      .map(i => (i, Seq.fill(8)(rng.nextDouble().toFloat)))
      .toDF("vec_id", "embedding")
    val idx = S.lshIndex(emb, "vec_id", "embedding", dim = 8)
    val ext = S.lshProbeFor(idx, emb, "vec_id", "embedding", k = 3)
      .orderBy("qid", "rank").collect().toSeq
    val self = S.lshTopK(emb, "vec_id", "embedding", k = 3, dim = 8)
      .orderBy("qid", "rank").collect().toSeq
    assert(self.nonEmpty && ext == self)
  }

  test("null vector elements fail loudly in every native kernel entry") {
    // ArrayData.toDoubleArray on UnsafeArrayData ignores the null
    // bitmap — without the Vec.dense guard a null element silently
    // reads as 0.0 and produces a plausible-but-wrong cell/code/bucket
    // (the replaced Scala UDFs NPE'd on boxing instead).
    import spark.implicits._
    val dirty = Seq(Seq.tabulate(dim)(i =>
      if (i == 3) null else java.lang.Double.valueOf(0.5))).toDF("v")
    val hk = new graft.functions.HyperplaneKernel(
      Array.fill(2 * 2 * dim)(0.1), dim, 2, 2)
    val paths = Seq[org.apache.spark.sql.Column](
      PqOps.unitVec(col("v")),
      PqOps.code(col("v"), PqOps.kernel(codebooks)),
      PqOps.table(col("v"), PqOps.kernel(codebooks)),
      NearestCells.cell(col("v"), NearestCells.kernel(centroids)),
      PqOps.hyperplaneBuckets(col("v"), hk),
      PqOps.ivfEncode(col("v"), new graft.functions.IvfPqKernel(
        NearestCells.kernel(centroids), PqOps.kernel(codebooks))),
      // same contract for the inline-loop quantizer (no Vec.dense copy —
      // the check rides its max pass); its HOF twin would NULL-poison
      graft.functions.Int8Checksum(col("v")))
    for (c <- paths) {
      val e = intercept[Exception] { dirty.select(c).collect() }
      val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString("; ")
      assert(msgs.contains("null element"), s"$c -> $msgs")
    }
  }

  test("mismatched coarse/codebook dims are rejected at kernel build") {
    val e = intercept[IllegalArgumentException] {
      new graft.functions.IvfPqKernel(
        NearestCells.kernel(Array.fill(4)(Array.fill(dim + subDim)(0.1))),
        PqOps.kernel(codebooks))
    }
    assert(e.getMessage.contains("dim"))
  }

  test("pqTrain assigns through the native kernel bit-identically to the replaced UDF loop") {
    // Round 13 replaced pqTrain's per-iteration boxed closure-UDF argmin
    // (the last interpreted per-row loop in the ANN family) with the
    // encode path's native PqCode kernel. Training is deterministic, so
    // the contract is BIT-identical codebooks — asserted here against an
    // in-test replica of the exact replaced formulation (exploded
    // (id, mi, sv) long form + broadcast closure UDF + groupBy mean).
    import org.apache.spark.sql.expressions.Window
    val iters = 3
    val data = df(vecs)
    val trained = graft.operators.Similarity.pqTrain(data, "id", "v",
      m = m, codes = nCodes, sampleMod = 2, trainIters = iters)
    val v = data.select(col("id").cast("long").as("id"),
      PqOps.unitVec(transform(col("v"), x => x.cast("double"))).as("v"))
    val longForm = v
      .filter(pmod(xxhash64(col("id")), lit(2)) === 0)
      .select(col("id"), explode(array((0 until m).map(mi =>
        struct(lit(mi).as("mi"),
          slice(col("v"), mi * subDim + 1, subDim).as("sv"))): _*)).as("e"))
      .select(col("id"), col("e.mi").as("mi"), col("e.sv").as("sv"))
      .persist()
    try {
      val wSeed = Window.partitionBy("mi").orderBy("id")
      val books: Array[Array[Array[Double]]] = Array.fill(m, nCodes)(null)
      longForm.withColumn("rn", row_number().over(wSeed))
        .filter(col("rn") <= nCodes)
        .select("mi", "rn", "sv").collect()
        .foreach(r => books(r.getInt(0))(r.getInt(1) - 1) =
          r.getSeq[Double](2).toArray)
      assert(books.forall(_.forall(_ != null)), "replica seeds undersized")
      val sc = spark.sparkContext
      for (_ <- 0 until iters) {
        val bc = sc.broadcast(books)
        val assign = udf { (mi: Int, sv: Seq[Double]) =>
          val book = bc.value(mi)
          val a = sv.toArray
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < book.length) {
            var acc = 0.0; var i = 0
            while (i < book(c).length) {
              val dd = a(i) - book(c)(i); acc += dd * dd; i += 1
            }
            if (acc < bestD) { bestD = acc; best = c }
            c += 1
          }
          best
        }
        val means = longForm
          .withColumn("code", assign(col("mi"), col("sv")))
          .select(col("mi"), col("code"),
            posexplode(col("sv")).as(Seq("pos", "x")))
          .groupBy("mi", "code", "pos").agg(avg("x").as("mx"))
          .collect()
        val next = books.map(_.map(_.clone()))
        means.groupBy(r => (r.getInt(0), r.getInt(1))).foreach {
          case ((mi, code), rows) =>
            rows.foreach(r => next(mi)(code)(r.getInt(2)) = r.getDouble(3))
        }
        books.indices.foreach(mi => books(mi) = next(mi))
        bc.destroy()
      }
      assert(trained.m === m && trained.subDim === subDim)
      assert(trained.codebooks.flatten.flatten.toSeq ===
        books.flatten.flatten.toSeq,
        "kernel-assigned training diverged from the replaced UDF loop")
    } finally longForm.unpersist(blocking = false)
  }
}
