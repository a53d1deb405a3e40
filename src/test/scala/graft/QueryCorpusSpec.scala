package graft

import org.apache.spark.sql.functions._

/** Smoke + invariants for the t2 query corpus at sf0.001.
  * (Value-level parity vs DuckDB is the driver's gate; tools/compare.py
  * replays it locally at sf0.01.)
  */
class QueryCorpusSpec extends SparkSpec {

  test("every query runs at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, s"$name failed")
    }
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q1_agg group counts sum to table size") {
    val df = SparkEntry.queries("q1_agg")(spark, sf)
    val total = df.agg(sum("n")).head.getLong(0)
    assert(total === Tables.lineitem(spark, sf).count())
  }

  test("approx_count_distinct within 10% of exact") {
    val approx = SparkEntry.queries("q_approx_distinct")(spark, sf)
      .select("l_returnflag", "approx_ord").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag").agg(countDistinct("l_orderkey").as("x"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      val ap = approx(k)
      assert(math.abs(ap - ex).toDouble / ex < 0.10, s"flag=$k approx=$ap exact=$ex")
    }
  }

  test("topk per group returns at most k rows per key") {
    val df = SparkEntry.queries("q_topk_group")(spark, sf)
    val maxPerKey = df.groupBy("o_custkey").count().agg(max("count")).head.getLong(0)
    assert(maxPerKey <= 3)
  }
}
