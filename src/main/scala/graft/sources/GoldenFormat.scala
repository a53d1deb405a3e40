package graft.sources

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
}
