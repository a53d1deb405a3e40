package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the TPC-H-ish testdata tables (see TESTDATA.md).
  *
  * Parquet scans: Catalyst pushes filters and prunes columns at the
  * source, so callers should NOT pre-select here — declare the full
  * plan and let the optimizer reduce the scan.
  */
object Tables {
  /** Inferred schema per table path, memoized for the JVM's lifetime.
    *
    * `spark.read.parquet(path)` with no explicit schema runs a footer-
    * read JOB at every call — ~40-90 ms of driver/scheduler wall per
    * table reference, paid by every query build (measured: a visible
    * "parquet at Tables.scala" stage in every StageProbe profile). The
    * testdata tables are immutable for a JVM's lifetime, so the schema
    * is a pure function of the path — memoizing it and passing it
    * explicitly removes that job while changing nothing about the scan
    * (the cached StructType IS the inferred one, same values, same
    * nullability). This is also the 100 TB-correct shape: schema
    * inference over a large table reads MANY footers (a driver-side
    * stall, guide §6/§7.3); production readers pin schemas explicitly.
    * Results are NOT cached — every query still scans parquet.
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val sch = schemaCache.computeIfAbsent(path,
      p => spark.read.parquet(p).schema)
    spark.read.schema(sch).parquet(path)
  }

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
