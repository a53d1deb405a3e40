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

  test("dirty cells parse as null (CSV-reader parity) and hidden files are skipped") {
    // Both readers present the same declared layout, so they must agree
    // on the same bytes: a non-numeric hour cell yields null (permissive
    // CSV semantics), never a task-killing NumberFormatException — and
    // _SUCCESS / .tmp metadata files are data to neither.
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("pm25v2-dirty")
    Files.writeString(dir.resolve("data.txt"),
      "2015/01/01,X,PM2.5," + ("NA" +: Seq.fill(23)("7")).mkString(",") + "\n" +
      "2015/01/02,X,PM2.5," + Seq.fill(24)("5").mkString(",") + "\n")
    Files.writeString(dir.resolve("_SUCCESS"), "")
    Files.writeString(dir.resolve(".part-00000.tmp"), "garbage\tline\n")
    val cols = Pm25.schema.fieldNames.map(col).toSeq
    val viaCsv = Pm25.read(spark, dir.toString).select(cols: _*)
      .collect().map(_.toString).sorted
    val viaV2 = spark.read.format(classOf[Pm25V2].getName).load(dir.toString)
      .select(cols: _*).collect().map(_.toString).sorted
    assert(viaV2.length === 2, viaV2.mkString("; "))
    assert(viaV2.toSeq === viaCsv.toSeq)
    assert(viaV2.exists(_.contains("null")))
  }
}
