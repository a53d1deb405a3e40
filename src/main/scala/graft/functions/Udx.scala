package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.udaf

/** SQL-callable registrations (SURVEY §2B UDx row: `spark.udf.register`).
  *
  * The Column-API variants in [[VectorFunctions]]/[[TextFunctions]] are the
  * hot paths (codegen'd expressions, no serialization boundary); these
  * registrations expose the same semantics to `spark.sql(...)` users. The
  * UDF wrappers pay one primitive-array conversion per call — fine for
  * interactive SQL, and the Column API remains the 100 TB path.
  */
object Udx {

  /** Idempotent: registrations overwrite by name. */
  def registerAll(spark: SparkSession): Unit = {
    spark.udf.register("mean_vector", udaf(MeanVector))

    // BOXED element type + explicit null checks: the Column-API
    // siblings (DotProduct & co.) are null-in-null-out for null
    // arguments and fail with the family's pointed message on null
    // ELEMENTS — an Array[Double]-typed UDF instead died in the
    // encoder with Spark's opaque NOT_NULL_ASSERT_VIOLATION, and an
    // unguarded null argument NPE'd. "Same semantics to spark.sql
    // users" includes the dirty rows.
    def checked(v: java.lang.Double, i: Int, who: String): Double = {
      if (v == null) throw new IllegalArgumentException(
        s"$who: null element at index $i of an input vector — " +
          "filter or impute dirty vectors upstream of the scorer")
      v.doubleValue()
    }

    spark.udf.register("vec_dot",
      (a: Seq[java.lang.Double], b: Seq[java.lang.Double]) => {
        if (a == null || b == null) null
        else {
          var acc = 0.0
          val n = math.min(a.length, b.length)
          var i = 0
          while (i < n) {
            acc += checked(a(i), i, "vec_dot") * checked(b(i), i, "vec_dot")
            i += 1
          }
          Double.box(acc)
        }
      }: java.lang.Double)

    spark.udf.register("vec_cosine",
      (a: Seq[java.lang.Double], b: Seq[java.lang.Double]) => {
        if (a == null || b == null) null
        else {
          var dot = 0.0
          var na = 0.0
          var nb = 0.0
          val n = math.min(a.length, b.length)
          var i = 0
          while (i < n) {
            val x = checked(a(i), i, "vec_cosine")
            val y = checked(b(i), i, "vec_cosine")
            dot += x * y; na += x * x; nb += y * y; i += 1
          }
          val denom = math.sqrt(na) * math.sqrt(nb)
          Double.box(if (denom == 0.0) 0.0 else dot / denom)
        }
      }: java.lang.Double)

    spark.udf.register("vec_sqdist",
      (a: Seq[java.lang.Double], b: Seq[java.lang.Double]) => {
        if (a == null || b == null) null
        else {
          var acc = 0.0
          val n = math.min(a.length, b.length)
          var i = 0
          while (i < n) {
            val d = checked(a(i), i, "vec_sqdist") - checked(b(i), i, "vec_sqdist")
            acc += d * d; i += 1
          }
          Double.box(acc)
        }
      }: java.lang.Double)

    spark.udf.register("simhash64",
      (tokens: Seq[String]) => graft.operators.Dedup.simhash64Value(tokens))
  }
}
