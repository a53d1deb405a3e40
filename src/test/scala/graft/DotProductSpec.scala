package graft

import graft.functions.{DotProduct, VectorFunctions}
import org.apache.spark.sql.functions._

/** The native codegen expression must agree bit-for-bit with the HOF
  * composition, survive whole-stage codegen, and keep null semantics.
  */
class DotProductSpec extends SparkSpec {

  test("DotProduct == HOF dot, bit-identical, on real embeddings") {
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val pairs = e.as("a").join(e.as("b"),
        col("a.vec_id") % 17 === col("b.vec_id") % 17 &&
          col("a.vec_id") < col("b.vec_id"))
      .select(
        DotProduct(col("a.v"), col("b.v")).as("native"),
        VectorFunctions.dot(col("a.v"), col("b.v")).as("hof"))
    assert(pairs.count() > 0)
    assert(pairs.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("DotProduct stays inside whole-stage codegen") {
    val e = Tables.embeddings(spark, sf)
      .select(col("embedding").cast("array<double>").as("v"))
      .select(DotProduct(col("v"), col("v")).as("d"))
    e.collect()
    val plan = e.queryExecution.executedPlan.toString
    assert(plan.contains("*("), plan.take(500))
  }

  test("null semantics: null if either side is null") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))),
      (None, Some(Seq(3.0, 4.0))),
      (Some(Seq(1.0, 2.0)), None)).toDF("a", "b")
      .select(DotProduct(col("a"), col("b")).as("d"))
    val got = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq === Seq(Some(11.0), None, None))
  }

  test("null ELEMENTS fail loudly (the kernel family's contract)") {
    // getDouble on UnsafeArrayData ignores the null bitmap: unguarded,
    // a null element scores as 0.0 — a plausible-but-wrong similarity
    // on the exact-cosine paths (HofDotProduct NULL-poisons instead,
    // matching the HOF it replaces; this is the hand-placed fast path).
    import spark.implicits._
    val dirty = Seq((Seq[java.lang.Double](1.0, null, 3.0), Seq[java.lang.Double](1.0, 1.0, 1.0)))
      .toDF("a", "b")
    val e = intercept[Exception] {
      dirty.select(DotProduct(col("a"), col("b"))).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("; ")
    assert(msgs.contains("null element"), msgs)
  }

  test("interpreted eval path agrees with codegen (mismatched lengths = common prefix)") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0, 5.0), Seq(3.0, 4.0))).toDF("a", "b")
    val viaExpr = df.select(DotProduct(col("a"), col("b"))).head.getDouble(0)
    assert(viaExpr === 11.0)
  }

  test("Similarity.l2Norm rewrites to the native dot expression") {
    // l2Norm is spelled sqrt(dot(v, v)) precisely so the rule catches it
    // — the transform-based AST it replaced evaded the matcher and ran
    // interpreted on every normed corpus scan
    val e = Tables.embeddings(spark, sf)
      .select(col("embedding").cast("array<double>").as("v"))
      .select(graft.operators.Similarity.l2Norm(col("v")).as("nrm"))
    assert(e.queryExecution.optimizedPlan.toString.contains("hofdotproduct"),
      e.queryExecution.optimizedPlan.toString.take(600))
  }

  test("optimizer rule rewrites the HOF dot idiom to the native expression") {
    // both the Column-API spelling and raw SQL must land on HofDotProduct
    val e = Tables.embeddings(spark, sf)
      .select(col("embedding").cast("array<double>").as("v"))
      .select(VectorFunctions.dot(col("v"), col("v")).as("d"))
    assert(e.queryExecution.optimizedPlan.toString.contains("hofdotproduct"),
      e.queryExecution.optimizedPlan.toString.take(600))
    // SQL spelling over non-foldable input (a real scan: literal arrays
    // are constant-folded and VALUES relations are locally evaluated
    // before user rules run)
    Tables.embeddings(spark, sf).createOrReplaceTempView("emb_rule_test")
    val sqlDf = spark.sql(
      """SELECT aggregate(zip_with(CAST(embedding AS ARRAY<DOUBLE>),
        |                          CAST(embedding AS ARRAY<DOUBLE>),
        |                          (x, y) -> x * y), 0.0D,
        |       (acc, v) -> acc + v) AS d
        |FROM emb_rule_test""".stripMargin)
    assert(sqlDf.queryExecution.optimizedPlan.toString.contains("hofdotproduct"),
      sqlDf.queryExecution.optimizedPlan.toString.take(600))
    assert(sqlDf.count() > 0)
  }

  test("rewrite is observationally identical to the HOF: nulls and length mismatch") {
    // zip_with pads the shorter array with nulls, so the HOF yields NULL
    // on length mismatch and on null elements — the rewrite target must
    // reproduce exactly that (it is NOT DotProduct's common-prefix rule)
    val rows = spark.sql(
      """SELECT aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D,
        |       (acc, v) -> acc + v) AS d
        |FROM VALUES
        |  (array(1.0D, 2.0D), array(3.0D, 4.0D)),
        |  (array(1.0D, 2.0D), array(3.0D, 4.0D, 5.0D)),
        |  (array(1.0D, CAST(NULL AS DOUBLE)), array(3.0D, 4.0D)),
        |  (CAST(NULL AS ARRAY<DOUBLE>), array(3.0D, 4.0D))
        |  AS t(a, b)""".stripMargin)
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(rows.toSeq === Seq(Some(11.0), None, None, None))
  }

  test("rewritten codegen path keeps HOF null-on-length-mismatch semantics") {
    // slice() forces a genuine runtime length mismatch through the scan →
    // zip_with pads with null → the rewritten HofDotProduct must yield
    // NULL on every row, exactly like the interpreted HOF
    val e = Tables.embeddings(spark, sf)
      .select(col("embedding").cast("array<double>").as("v"))
      .select(VectorFunctions.dot(col("v"), expr("slice(v, 1, 63)")).as("d"))
    assert(e.queryExecution.optimizedPlan.toString.contains("hofdotproduct"))
    assert(e.count() > 0)
    assert(e.filter(col("d").isNotNull).count() === 0)
  }

  test("non-dot HOF folds are left alone") {
    // a sum-of-squares aggregate over transform() must NOT be rewritten
    val sq = spark.sql(
      """SELECT aggregate(transform(array(1.0D, 2.0D), x -> x * x), 0.0D,
        |  (acc, v) -> acc + v) AS s""".stripMargin)
    assert(!sq.queryExecution.optimizedPlan.toString.contains("hofdotproduct"))
    assert(sq.head.getDouble(0) === 5.0)
  }
}
