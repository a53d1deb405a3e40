package graft.queries

import graft.Tables
import graft.streaming.Streams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch projections of the streaming transforms (SURVEY §2B streaming
  * row). The SAME functions run under readStream in StreamingSpec (parity
  * oracle); here they run on the batch events table so the windowing
  * semantics are ALSO hash-checked against DuckDB (`time_bucket`).
  */
object StreamQueries {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_tumbling" -> ((s, d) =>
      Streams.tumblingAgg(Tables.events(s, d), "1 hour")
        .orderBy("w_start", "event_type")),

    "q_stream_sliding" -> ((s, d) =>
      Streams.slidingAgg(Tables.events(s, d), "1 hour", "30 minutes")
        .orderBy("w_start", "event_type")),
  )

  val oracles: Map[String, String] = Map(
    "q_stream_tumbling" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS w_start, event_type,
                count(*) AS n, round(sum(value), 6) AS total
         FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""",
    // each event lands in exactly width/slide = 2 sliding windows:
    // starts time_bucket(30m, ts) and time_bucket(30m, ts) - 30m
    "q_stream_sliding" ->
      """SELECT time_bucket(INTERVAL '30 minutes', ts)
                  - k.k * INTERVAL '30 minutes' AS w_start, event_type,
                count(*) AS n, round(sum(value), 6) AS total
         FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) k
         GROUP BY 1, 2 ORDER BY w_start, event_type""",
  )
}
