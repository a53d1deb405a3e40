package graft

import graft.sources.{Pm25, Pm25V2}
import org.apache.spark.sql.functions._

/** DataSource V2 pm25 connector: value parity with the schema'd CSV
  * reader on the reference fixture, and reader-level column pruning.
  */
class Pm25V2Spec extends SparkSpec {

  private val fixture = "/root/reference/hadoop_tutorial/Kmeans/pm25.txt"

  private def v2 = spark.read.format(classOf[Pm25V2].getName).load(fixture)

  test("v2 source matches the v1 CSV reader value for value") {
    val cols = Pm25.schema.fieldNames.map(col).toSeq
    val want = Pm25.read(spark, fixture).select(cols: _*)
      .collect().map(_.toString).sorted
    val got = v2.select(cols: _*).collect().map(_.toString).sorted
    assert(got.length === 365 && got.toSeq === want.toSeq)
  }

  test("column pruning reaches the reader: scan reports only requested cols") {
    val df = v2.select(col("date"), col("h3"))
    val p = df.queryExecution.executedPlan.toString
    // Pm25Scan.description() prints the PRUNED field list
    assert(p.contains("cols=[date,h3]"), p.take(800))
    val rows = df.collect()
    assert(rows.length === 365 && rows.head.length === 2)
  }

  test("aggregation over the v2 source agrees with the v1 path") {
    val want = Pm25.read(spark, fixture).agg(sum("h0"), max("h23")).head
    val got = v2.agg(sum("h0"), max("h23")).head
    assert(got === want)
  }
}
