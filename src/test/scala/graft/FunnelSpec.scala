package graft

import graft.queries.FunnelQueries
import org.apache.spark.sql.functions._

/** Invariants of the ordered-sequence event analytics. */
class FunnelSpec extends SparkSpec {

  test("funnel stages are monotone non-increasing") {
    val r = FunnelQueries.defs("q_funnel")(spark, sf).collect().head
    val (v, c, p) = (r.getAs[Long]("n_view"), r.getAs[Long]("n_click"),
      r.getAs[Long]("n_purchase"))
    assert(v >= c && c >= p, s"funnel not monotone: $v >= $c >= $p")
    assert(v > 0L)
  }

  test("cohort: every cohorted user is active at offset 0, totals agree") {
    val m = FunnelQueries.defs("q_cohort_retention")(spark, sf).collect()
    // a user's first high-value purchase week is itself a purchase week,
    // so summing the offset-0 column recovers the full cohorted population
    val offset0 = m.filter(_.getAs[Long]("week_offset") == 0L)
      .map(_.getAs[Long]("n_users")).sum
    val cohorted = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase" && col("value") > 90)
      .select("user_id").distinct().count()
    assert(offset0 === cohorted)
    // no retention count can exceed its cohort's entry count
    val entry = m.filter(_.getAs[Long]("week_offset") == 0L)
      .map(r => r.getAs[java.sql.Date]("cohort_week") ->
        r.getAs[Long]("n_users")).toMap
    m.foreach { r =>
      assert(r.getAs[Long]("n_users") <=
        entry(r.getAs[java.sql.Date]("cohort_week")))
    }
  }
}
