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

    // boxed return + explicit null checks: the Column-API siblings
    // (DotProduct & co.) are null-in-null-out, and an unguarded
    // reference-typed UDF arg arrives as null and NPEs the query —
    // "same semantics to spark.sql users" includes the null rows
    spark.udf.register("vec_dot", (a: Array[Double], b: Array[Double]) => {
      if (a == null || b == null) null
      else {
        var acc = 0.0
        val n = math.min(a.length, b.length)
        var i = 0
        while (i < n) { acc += a(i) * b(i); i += 1 }
        Double.box(acc)
      }
    }: java.lang.Double)

    spark.udf.register("vec_cosine", (a: Array[Double], b: Array[Double]) => {
      if (a == null || b == null) null
      else {
        var dot = 0.0
        var na = 0.0
        var nb = 0.0
        val n = math.min(a.length, b.length)
        var i = 0
        while (i < n) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
        val denom = math.sqrt(na) * math.sqrt(nb)
        Double.box(if (denom == 0.0) 0.0 else dot / denom)
      }
    }: java.lang.Double)

    spark.udf.register("vec_sqdist", (a: Array[Double], b: Array[Double]) => {
      if (a == null || b == null) null
      else {
        var acc = 0.0
        val n = math.min(a.length, b.length)
        var i = 0
        while (i < n) { val d = a(i) - b(i); acc += d * d; i += 1 }
        Double.box(acc)
      }
    }: java.lang.Double)

    spark.udf.register("simhash64",
      (tokens: Seq[String]) => graft.operators.Dedup.simhash64Value(tokens))
  }
}
