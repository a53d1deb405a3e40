package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Dataset

/** Byte-exact renderers for the reference's TextOutputFormat artifacts.
  *
  * Quirks reproduced (SURVEY.md §1, writer at src/Kmeans.java:131):
  * leading TAB (empty Text key + `key\tvalue` separator), station 大里,
  * metric renamed PM2.5 -> PM25, and means rendered like Java's
  * `Arrays.toString` with ", " separators (Double.toString — identical on
  * this JVM).
  */
object GoldenFormat {

  /** One line of the new-centers file (pm25.cluster.center.conf.txt.hdfs). */
  def centerLine(repDate: String, means: Array[Double]): String =
    "\t" + repDate + ",大里,PM25," + means.map(_.toString).mkString(", ")

  /** One line of a labeling-pass part file (`clusterId\toriginalRow`). */
  def assignmentLine(cluster: Int, raw: String): String =
    s"$cluster\t$raw"

  /** Single-file text sink reproducing the MR TextOutputFormat layout:
    * `<dir>/part-00000` + an empty `<dir>/_SUCCESS`. `coalesce(1)` (NOT
    * repartition — a shuffle would break row order) keeps the upstream
    * partition order, matching the reference's single-split map output.
    * Golden-replay only: a 100 TB result never goes through one partition,
    * the general path is the plain partitioned `df.write.csv/text`.
    */
  def writeSingleFile(lines: Dataset[String], dir: String): Unit = {
    lines.coalesce(1).write.mode("overwrite").text(dir)
    // Spark names the file part-00000-<uuid>.txt; golden layout wants a
    // stable name (the driver of the reference read part files by prefix).
    val d = Paths.get(dir)
    // Files.list holds an open directory handle — close it (try/finally)
    // or every golden write leaks one fd until GC
    val listing = Files.list(d)
    try {
      listing.iterator().asScala
        .filter(_.getFileName.toString.startsWith("part-"))
        .foreach { p =>
          Files.move(p, d.resolve("part-00000"),
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
    } finally listing.close()
  }

  /** Read a written part file back as UTF-8 lines (test helper). */
  def readLines(dir: String): Seq[String] =
    Files.readAllLines(Paths.get(dir, "part-00000"), StandardCharsets.UTF_8)
      .asScala.toSeq
}
