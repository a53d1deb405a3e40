package graft

import graft.functions.{Udx, VectorFunctions}
import org.apache.spark.sql.functions._

/** SQL-registered UDx surface (SURVEY §2B UDx row): each registration must
  * be callable from spark.sql and agree with its Column-API hot path.
  */
class UdxSpec extends SparkSpec {

  test("registered functions agree with the Column API") {
    Udx.registerAll(spark)
    Tables.embeddings(spark, sf).select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .limit(50).createOrReplaceTempView("emb_v")

    val viaSql = spark.sql(
      """SELECT a.vec_id AS qa, b.vec_id AS qb,
                vec_dot(a.v, b.v) AS d, vec_cosine(a.v, b.v) AS c,
                vec_sqdist(a.v, b.v) AS s
         FROM emb_v a JOIN emb_v b ON a.vec_id < b.vec_id""")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap

    val viaCol = spark.table("emb_v").as("a")
      .join(spark.table("emb_v").as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id"),
        VectorFunctions.dot(col("a.v"), col("b.v")).as("d"),
        VectorFunctions.cosine(col("a.v"), col("b.v")).as("c"),
        VectorFunctions.sqDist(col("a.v"), col("b.v")).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap

    assert(viaSql.nonEmpty && viaSql.keySet === viaCol.keySet)
    viaSql.foreach { case (k, (d, c, s)) =>
      val (d2, c2, s2) = viaCol(k)
      assert(math.abs(d - d2) < 1e-9 && math.abs(c - c2) < 1e-9 &&
        math.abs(s - s2) < 1e-9, s"$k")
    }
  }

  test("vec_* SQL UDFs are null-in-null-out like their Column siblings") {
    import spark.implicits._
    graft.functions.Udx.registerAll(spark)
    Seq((Seq(1.0, 2.0), Option.empty[Seq[Double]])).toDF("a", "b")
      .createOrReplaceTempView("nullvec")
    val r = spark.sql(
      "SELECT vec_dot(a, b), vec_cosine(b, a), vec_sqdist(a, b) FROM nullvec")
      .head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
    // null ELEMENTS get the family's pointed message, not the encoder's
    // opaque NOT_NULL_ASSERT_VIOLATION
    for (f <- Seq("vec_dot", "vec_cosine", "vec_sqdist")) {
      val e = intercept[Exception] {
        spark.sql(s"SELECT $f(array(1.0, CAST(NULL AS DOUBLE)), array(1.0, 1.0))")
          .collect()
      }
      val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString("; ")
      assert(msgs.contains("null element"), s"$f -> $msgs")
    }
  }

  test("mean_vector fails loudly on ragged vectors (order-independent)") {
    // unguarded, whichever vector a partition reduced first fixed the
    // dimension: longer tails silently dropped OR a bare index error,
    // depending on row order
    import spark.implicits._
    val df = Seq((1, Seq(1.0)), (1, Seq(1.0, 2.0))).toDF("g", "v")
    val e = intercept[Exception] {
      df.groupBy("g")
        .agg(org.apache.spark.sql.functions.udaf(graft.functions.MeanVector)
          .apply(col("v"))).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("; ")
    assert(msgs.contains("ragged vector"), msgs)
  }

  test("mean_vector UDAF callable from SQL") {
    Udx.registerAll(spark)
    Tables.embeddings(spark, sf)
      .select((col("vec_id") % 2).as("g"),
        col("embedding").cast("array<double>").as("v"))
      .createOrReplaceTempView("emb_g")
    val m = spark.sql("SELECT g, mean_vector(v) AS m FROM emb_g GROUP BY g")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val avg0 = spark.sql(
      "SELECT g, avg(v[0]) FROM emb_g GROUP BY g")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m.keySet === Set(0L, 1L))
    m.foreach { case (g, vec) =>
      assert(vec.size === 64)
      assert(math.abs(vec.head - avg0(g)) < 1e-9)
    }
  }

  test("simhash64 callable from SQL, equals the operator value") {
    Udx.registerAll(spark)
    val viaSql = spark.sql(
      "SELECT simhash64(split('a b c', ' ')) AS fp").head.getLong(0)
    assert(viaSql === graft.operators.Dedup.simhash64Value(Seq("a", "b", "c")))
  }

  test("Int8Checksum native expression equals the interpreted HOF composition") {
    // same arithmetic, two execution paths: the generated loop must be
    // bit-identical to transform/array_max/aggregate over every real
    // embedding (incl. negative components) and the zero vector
    val v = transform(col("embedding"), x => x.cast("double"))
    val mx = array_max(transform(v, x => abs(x)))
    val codes = transform(v,
      x => floor(x * lit(127.0) / mx + lit(0.5)).cast("long"))
    val cs = graft.functions.Int8Checksum(col("embedding"))
    val zero = Tables.embeddings(spark, sf).limit(1)
      .select(lit(0L).as("vec_id"),
        expr("transform(embedding, x -> CAST(0.0 AS FLOAT))").as("embedding"))
    val rows = Tables.embeddings(spark, sf)
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
      .unionByName(zero)
      .select(col("vec_id"),
        cs.getItem(0).as("n_sum"), cs.getItem(1).as("n_max"),
        when(mx === 0d, lit(0L))
          .otherwise(aggregate(codes, lit(0L), (a, b) => a + b)).as("h_sum"),
        when(mx === 0d, lit(0L))
          .otherwise(array_max(transform(codes, c => abs(c)))).as("h_max"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) === r.getLong(3), s"sum mismatch vec ${r.getLong(0)}")
      assert(r.getLong(2) === r.getLong(4), s"absmax mismatch vec ${r.getLong(0)}")
    }
    // non-zero vectors must pin the top code at exactly 127
    assert(rows.filter(_.getLong(0) > 0).forall(_.getLong(2) == 127L))
  }

  test("AdcScore native expression equals the boxed reference computation") {
    // the PQ hot path: Σ tab[mi*nCodes + code[mi]], generated loop vs a
    // driver-side fold over the same rows — must be bit-identical
    // (same left-to-right double accumulation)
    import spark.implicits._
    val nCodes = 4
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(50) { i =>
      (i.toLong,
        Seq.fill(8)(rnd.nextInt(nCodes)),
        Seq.fill(8 * nCodes)(rnd.nextDouble() * 2 - 1))
    }
    val got = rows.toDF("id", "code", "tab")
      .select(col("id"),
        graft.functions.AdcScore(col("code"), col("tab"), nCodes).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { case (id, code, tab) =>
      var d = 0.0
      var mi = 0
      while (mi < code.length) { d += tab(mi * nCodes + code(mi)); mi += 1 }
      assert(got(id) === d, s"ADC mismatch id $id")
    }
  }
}
