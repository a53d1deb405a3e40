package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.Row

/** Unit semantics of the as-of join that the events-table oracle query
  * cannot reach: null right-side payloads (the testdata has none). The
  * whole payload of the single most recent right row must be carried —
  * including its genuine nulls — never a column-wise mix of rows.
  */
class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  test("null payload on the latest right row is propagated, not skipped") {
    val left = Seq((1L, 30L, "L1"), (1L, 5L, "L0"), (2L, 10L, "L2"))
      .toDF("k", "ts", "tag")
    val right = Seq(
      (1L, 10L, 1L, Option("a"), Option(100)),
      (1L, 20L, 2L, Option.empty[String], Option(200)))
      .toDF("k", "ts", "seq", "v1", "v2")
    val out = AsOfJoin.asOf(left, right, "k", "ts", "seq", Seq("v1", "v2"))
      .orderBy("tag")
      .collect()
    // L0 (ts=5): no right row at or before → all-null payload
    assert(out(0) === Row(1L, 5L, "L0", null, null))
    // L1 (ts=30): latest right row is ts=20 whose v1 IS null — the old
    // per-column carry resurrected "a" from ts=10 here
    assert(out(1) === Row(1L, 30L, "L1", null, 200))
    // L2: key 2 has no right rows at all
    assert(out(2) === Row(2L, 10L, "L2", null, null))
  }

  test("all asof_* fields come from the same right row (no column mixing)") {
    val left = Seq((1L, 100L)).toDF("k", "ts")
    val right = Seq(
      (1L, 1L, 1L, Option("a"), Option.empty[Int]),
      (1L, 2L, 2L, Option.empty[String], Option(2)))
      .toDF("k", "ts", "seq", "v1", "v2")
    val out = AsOfJoin.asOf(left, right, "k", "ts", "seq", Seq("v1", "v2"))
      .collect()
    // most recent right row is ts=2: (v1=null, v2=2) — NOT (a, 2)
    assert(out(0) === Row(1L, 100L, null, 2))
  }

  test("right row AT the left timestamp matches; equal-ts ties go to max seq") {
    val left = Seq((1L, 10L)).toDF("k", "ts")
    val right = Seq(
      (1L, 10L, 1L, Option("first")),
      (1L, 10L, 2L, Option("second")))
      .toDF("k", "ts", "seq", "v")
    val out = AsOfJoin.asOf(left, right, "k", "ts", "seq", Seq("v")).collect()
    assert(out(0) === Row(1L, 10L, "second"))
  }

  test("forward as-of: earliest right row at-or-after; equal-ts ties go to min seq") {
    val left = Seq((1L, 10L, "L1"), (1L, 31L, "L2"), (2L, 5L, "L3"))
      .toDF("k", "ts", "tag")
    val right = Seq(
      (1L, 10L, 2L, Option("at-b")),   // AT L1's ts — inclusive match
      (1L, 10L, 1L, Option("at-a")),   // same ts, smaller seq → wins
      (1L, 30L, 3L, Option("mid")),
      (2L, 1L, 4L, Option("before")))  // strictly before L3 → no match
      .toDF("k", "ts", "seq", "v")
    val out = AsOfJoin.asOfForward(left, right, "k", "ts", "seq", Seq("v"))
      .orderBy("tag").collect()
    assert(out(0) === Row(1L, 10L, "L1", "at-a"))
    // L2 (ts=31): no right row at or after → null
    assert(out(1) === Row(1L, 31L, "L2", null))
    assert(out(2) === Row(2L, 5L, "L3", null))
  }

  test("forward as-of carries whole payload rows, like backward") {
    val left = Seq((1L, 0L)).toDF("k", "ts")
    val right = Seq(
      (1L, 1L, 1L, Option.empty[String], Option(1)),
      (1L, 2L, 2L, Option("b"), Option(2)))
      .toDF("k", "ts", "seq", "v1", "v2")
    val out = AsOfJoin.asOfForward(left, right, "k", "ts", "seq", Seq("v1", "v2"))
      .collect()
    // nearest following right row is ts=1: (null, 1) — never (b, 1)
    assert(out(0) === Row(1L, 0L, null, 1))
  }

  test("forward as-of runs a RUNNING window frame, never unbounded-following") {
    // Spark's UnboundedFollowing frame recomputes the aggregate per row
    // — O(rows²) per key group; the forward direction must use the
    // descending-sort mirror of backward's running frame instead
    val left = Seq((1L, 0L)).toDF("k", "ts")
    val right = Seq((1L, 1L, 1L, "a")).toDF("k", "ts", "seq", "v")
    val plan = AsOfJoin.asOfForward(left, right, "k", "ts", "seq", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("unboundedfollowing")
      && !plan.contains("UNBOUNDED FOLLOWING"), plan.take(800))
  }

  test("scratch-column collisions fail fast instead of corrupting output") {
    val left = Seq((1L, 0L, 9L)).toDF("k", "ts", "_seq")
    val right = Seq((1L, 1L, 1L, "a")).toDF("k", "ts", "seq", "v")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(left, right, "k", "ts", "seq", Seq("v"))
    }
    assert(e.getMessage.contains("_seq"), e.getMessage)
  }

  test("a value column named _m is rejected (payload marker collision)") {
    // unguarded, a '_m' value column duplicated the payload struct's
    // match-marker field and getField("_m") resolved ambiguously
    val left = Seq((1L, 0L)).toDF("k", "ts")
    val right = Seq((1L, 1L, 1L, "a")).toDF("k", "ts", "seq", "_m")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(left, right, "k", "ts", "seq", Seq("_m"))
    }
    assert(e.getMessage.contains("_m"), e.getMessage)
  }
}
