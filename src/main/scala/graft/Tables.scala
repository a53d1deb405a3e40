package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the TPC-H-ish testdata tables (see TESTDATA.md).
  *
  * Parquet scans: Catalyst pushes filters and prunes columns at the
  * source, so callers should NOT pre-select here — declare the full
  * plan and let the optimizer reduce the scan.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** events.parquet stores ts as TIMESTAMP(NANOS), read as raw nanos via
    * `spark.sql.legacy.parquet.nanosAsLong` (declared in
    * [[GraftSession.builder]], not mutated here); `ts` is exposed as a
    * proper µs TimestampType column (integer `div` — a double division
    * would lose precision on 2^60-scale nanos).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    apply(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
