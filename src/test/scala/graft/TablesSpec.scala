package graft

import org.apache.spark.sql.types._

/** Schema contract for the testdata loaders.
  *
  * The driver regenerates `/root/testdata` between rounds and has
  * already changed column storage once (events.ts: TIMESTAMP(NANOS) →
  * plain µs TIMESTAMP_NTZ), which surfaced as ~20 unrelated spec
  * failures before the loader was fixed. This suite is the single loud
  * gate: it pins the ENGINE-FACING schema of every `Tables` loader —
  * exact column names/order, and a type CLASS per column that is
  * deliberately tolerant of benign storage flips (any integral width
  * for keys, NTZ or session-TZ for date-ish columns) while failing
  * fast on breaking ones (strings-for-dates, renames, drops).
  *
  * If this suite fails after a testdata regeneration, fix the
  * normalization in [[Tables]] first; everything downstream assumes
  * these contracts.
  */
class TablesSpec extends SparkSpec {

  /** Type classes a contract column may satisfy. */
  private val integral: DataType => Boolean = {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType => true
    case _ => false
  }
  private val fractional: DataType => Boolean = {
    case _: DoubleType | _: FloatType | _: DecimalType => true
    case _ => false
  }
  private val timeish: DataType => Boolean = {
    case _: TimestampType | _: TimestampNTZType | _: DateType => true
    case _ => false
  }
  private val str: DataType => Boolean = _.isInstanceOf[StringType]
  private val floatArray: DataType => Boolean = {
    case ArrayType(et, _) => et.isInstanceOf[FloatType] || et.isInstanceOf[DoubleType]
    case _ => false
  }
  /** Exactly session-TZ TimestampType — the post-normalization promise
    * of Tables.events, stronger than `timeish`.
    */
  private val sessionTs: DataType => Boolean = _.isInstanceOf[TimestampType]

  private def check(name: String,
                    df: org.apache.spark.sql.DataFrame,
                    contract: Seq[(String, DataType => Boolean, String)]): Unit = {
    val fields = df.schema.fields
    assert(fields.map(_.name).toSeq === contract.map(_._1),
      s"$name: column names/order drifted — testdata regenerated? " +
        s"got ${fields.map(_.name).mkString(",")}")
    for ((f, (col, ok, cls)) <- fields.zip(contract))
      assert(ok(f.dataType),
        s"$name.$col: stored as ${f.dataType.simpleString}, contract wants $cls — " +
          "normalize in Tables before touching downstream code")
  }

  test("region/nation: key + name columns") {
    check("region", Tables.region(spark, sf), Seq(
      ("r_regionkey", integral, "integral"), ("r_name", str, "string")))
    check("nation", Tables.nation(spark, sf), Seq(
      ("n_nationkey", integral, "integral"), ("n_name", str, "string"),
      ("n_regionkey", integral, "integral")))
  }

  test("customer/supplier/part: dimension contracts") {
    check("customer", Tables.customer(spark, sf), Seq(
      ("c_custkey", integral, "integral"), ("c_name", str, "string"),
      ("c_nationkey", integral, "integral"), ("c_acctbal", fractional, "fractional"),
      ("c_mktsegment", str, "string")))
    check("supplier", Tables.supplier(spark, sf), Seq(
      ("s_suppkey", integral, "integral"), ("s_name", str, "string"),
      ("s_nationkey", integral, "integral"), ("s_acctbal", fractional, "fractional")))
    check("part", Tables.part(spark, sf), Seq(
      ("p_partkey", integral, "integral"), ("p_name", str, "string"),
      ("p_brand", str, "string"), ("p_type", str, "string"),
      ("p_size", integral, "integral"), ("p_retailprice", fractional, "fractional")))
  }

  test("orders/lineitem: fact contracts") {
    check("orders", Tables.orders(spark, sf), Seq(
      ("o_orderkey", integral, "integral"), ("o_custkey", integral, "integral"),
      ("o_orderstatus", str, "string"), ("o_totalprice", fractional, "fractional"),
      ("o_orderdate", timeish, "date/timestamp"), ("o_orderpriority", str, "string")))
    check("lineitem", Tables.lineitem(spark, sf), Seq(
      ("l_orderkey", integral, "integral"), ("l_partkey", integral, "integral"),
      ("l_suppkey", integral, "integral"), ("l_linenumber", integral, "integral"),
      ("l_quantity", fractional, "fractional"),
      ("l_extendedprice", fractional, "fractional"),
      ("l_discount", fractional, "fractional"), ("l_tax", fractional, "fractional"),
      ("l_returnflag", str, "string"), ("l_linestatus", str, "string"),
      ("l_shipdate", timeish, "date/timestamp")))
  }

  test("events: ts normalized to session-TZ TimestampType regardless of storage") {
    check("events", Tables.events(spark, sf), Seq(
      ("event_id", integral, "integral"),
      ("ts", sessionTs, "TimestampType (Tables.events normalization promise)"),
      ("user_id", integral, "integral"), ("event_type", str, "string"),
      ("value", fractional, "fractional"), ("props", str, "string")))
  }

  test("documents/embeddings: LLM-pipeline contracts") {
    check("documents", Tables.documents(spark, sf), Seq(
      ("doc_id", integral, "integral"), ("text", str, "string"),
      ("lang", str, "string"), ("source", str, "string"),
      ("n_chars", integral, "integral")))
    check("embeddings", Tables.embeddings(spark, sf), Seq(
      ("vec_id", integral, "integral"),
      ("embedding", floatArray, "array<float|double>"),
      ("label", integral, "integral")))
  }

  test("events normalization: both storage generations yield identical rows") {
    // The nanos-long branch of Tables.events no longer fires on current
    // testdata (µs NTZ since the round-7 regeneration) — keep it honest
    // by synthesizing BOTH generations of the same logical events and
    // asserting the normalized outputs are row-identical. The long
    // column stands in for TIMESTAMP(NANOS) read under nanosAsLong
    // (which surfaces exactly as int64 nanos).
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = Seq(
      (1L, 1704067200123456L, 10L, "view", 1.0, "{}"),   // 2024-01-01 00:00:00.123456
      (2L, 1704070800000001L, 11L, "click", 2.0, "{}"),
      (3L, 1706741832194062L, 12L, "purchase", 3.0, "{}"))
    val dirNanos = java.nio.file.Files.createTempDirectory("gen-nanos").toString
    val dirNtz = java.nio.file.Files.createTempDirectory("gen-ntz").toString
    base.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), (col("us") * 1000L).as("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$dirNanos/events.parquet")
    base.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(col("event_id"),
        to_timestamp_ntz(timestamp_micros(col("us"))).as("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$dirNtz/events.parquet")
    val a = Tables.events(spark, dirNanos)
    val b = Tables.events(spark, dirNtz)
    assert(a.schema === b.schema, "generations must normalize to one schema")
    assert(a.schema("ts").dataType === TimestampType)
    val ra = a.orderBy("event_id").collect().map(_.toString).toSeq
    val rb = b.orderBy("event_id").collect().map(_.toString).toSeq
    assert(ra === rb && ra.size === 3)
    // µs precision survives both paths (nanos div is truncating, not lossy at µs)
    assert(ra.head.contains("2024-01-01 00:00:00.123456"))
  }

  test("events ts values survive normalization (no wall-clock shift)") {
    // The NTZ→LTZ cast must be wall-clock-preserving: session TZ is
    // pinned UTC in GraftSession, so the rendered instant equals the
    // stored naive value. A TZ misconfiguration would shift every
    // window/funnel boundary silently — assert one known bound instead.
    import org.apache.spark.sql.functions._
    val mm = Tables.events(spark, sf)
      .agg(date_format(min("ts"), "yyyy-MM").as("lo"),
           date_format(max("ts"), "yyyy-MM").as("hi")).head()
    assert(mm.getString(0) === "2024-01" && mm.getString(1) === "2024-01",
      "events.ts outside the generator's 2024-01 window — TZ shift in normalization?")
  }
}
