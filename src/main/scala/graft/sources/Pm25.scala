package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Readers for the reference's delimited-text fixtures (FIXTURES.md).
  *
  * The reference's data model is "CSV line as untyped row"
  * (src/Kmeans.java:226-236). Here each file gets an explicit schema and a
  * derived `vec: array<double>` column; the original line is preserved in
  * `raw` for byte-exact golden replay.
  */
object Pm25 {

  /** pm25.txt schema: date,station,metric + 24 hourly readings. */
  val schema: StructType = StructType(
    StructField("date", StringType) ::
    StructField("station", StringType) ::
    StructField("metric", StringType) ::
    (0 until 24).map(h => StructField(s"h$h", IntegerType)).toList)

  /** Read a pm25-schema CSV; `vec` = hours as array<double> (math skips the
    * 3 metadata cols, like the reference's j>=3 loops), `raw` = the
    * original line.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val hours = (0 until 24).map(h => col(s"h$h").cast(DoubleType))
    // each cell coalesced to "" BEFORE concat_ws: concat_ws skips null
    // arguments TOGETHER WITH their separators, so a line with an empty
    // cell would re-render one column short — silently shifting every
    // later hour left and breaking the byte-exact golden-replay
    // contract `raw` exists for (an empty CSV cell parses as null and
    // renders back as the empty string, byte-faithful for this
    // quote-free fixture class)
    spark.read.schema(schema).csv(path)
      .withColumn("vec", array(hours: _*))
      .withColumn("raw", concat_ws(",",
        (Seq(col("date"), col("station"), col("metric")) ++
          (0 until 24).map(h => col(s"h$h").cast(StringType)))
          .map(c => coalesce(c, lit(""))): _*))
  }

  /** Headerless all-numeric rows (variant 2's model, kmeans.java:193-203):
    * every comma token is a double; all columns participate in distance.
    */
  def readNumeric(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.text(path)
      .select(col("value").as("raw"))
      .filter(length(trim(col("raw"))) > 0)
      .withColumn("vec", transform(split(col("raw"), ","), t => t.cast(DoubleType)))
  }

  /** Centers file -> driver array (k = line count, src/Kmeans.java:45).
    * `recursiveFileLookup` mirrors the reference's recursive directory
    * walk (src/Kmeans.java:196-202: a directory's entries are re-read
    * with the same routine, descending into subdirectories), so a
    * centers "path" may be a file, a flat directory, or a nested tree
    * — e.g. an MR job's output dir containing per-reducer part files.
    *
    * Order is PINNED to (file path ascending, line order within file):
    * center index i becomes cluster id i+1 everywhere downstream, and a
    * bare collect() would return Spark's file-PACKING order (largest
    * first), permuting cluster ids across runs/layouts. The reference
    * itself walks `File.listFiles` order, which Java leaves
    * platform-unspecified — so a defined order is pinned here rather
    * than an undefined one replicated. `wholetext` makes the in-file
    * order SPLIT-PROOF: each file arrives as one row (never divided
    * across FilePartitions), so line order is the file's own byte
    * order by construction — the previous monotonically_increasing_id
    * spelling silently depended on split-packing order for a file
    * larger than maxPartitionBytes. Bounded driver state: k center
    * lines, never data.
    */
  def centersFrom(spark: SparkSession, path: String, skipCols: Int): Array[Array[Double]] =
    spark.read
      .option("recursiveFileLookup", "true")
      .option("wholetext", "true").text(path)
      .select(org.apache.spark.sql.functions.input_file_name().as("f"),
        col("value"))
      .collect()
      .sortBy(_.getString(0))
      // CRLF | CR | LF: Hadoop's line reader (and Spark's non-wholetext
      // text source) treats a lone \r as a terminator too — "\r?\n"
      // alone would glue CR-only-terminated lines into one.
      .flatMap(_.getString(1).split("\r\n|\r|\n"))
      .filter(_.trim.nonEmpty)
      .map(_.split(",").drop(skipCols).map(_.trim.toDouble))
}
