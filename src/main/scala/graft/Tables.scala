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
  /** events.parquet has stored `ts` two ways across testdata generations:
    * TIMESTAMP(NANOS) (read as raw nanos via
    * `spark.sql.legacy.parquet.nanosAsLong`, declared in
    * [[GraftSession.builder]]) and plain µs timestamp (surfaced as
    * TIMESTAMP_NTZ by Spark's NTZ inference). Both are normalized to one
    * engine-facing type — session-TZ TimestampType — so every consumer
    * (windows, watermarks, as-of joins) sees a single `ts` contract.
    * The nanos path uses integer `div` (double division would lose
    * precision on 2^60-scale nanos); the NTZ path is a wall-clock-
    * preserving cast (session TZ is pinned UTC).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw  // already TimestampType
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
