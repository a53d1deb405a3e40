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

  test("interpreted eval path agrees with codegen (mismatched lengths = common prefix)") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0, 5.0), Seq(3.0, 4.0))).toDF("a", "b")
    val viaExpr = df.select(DotProduct(col("a"), col("b"))).head.getDouble(0)
    assert(viaExpr === 11.0)
  }
}
